from pnpflow_tpu.metrics.image_quality import psnr, ssim
