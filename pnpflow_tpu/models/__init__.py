from pnpflow_tpu.models.unet import VelocityUNet, make_velocity_unet
