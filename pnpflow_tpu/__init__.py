"""pnpflow_tpu — a TPU-native (JAX/XLA/Pallas/pjit) plug-and-play flow-matching
image-restoration framework.

Re-designed from scratch for TPU hardware with the same capabilities as the
PnP-Flow reference (ICLR 2025, arXiv 2410.02423):

  * OT / independent-coupling flow-matching training of a velocity U-Net
    (data-parallel over a `jax.sharding.Mesh`).
  * Six inverse-problem solvers (pnp_flow, ot_ode, d_flow, flow_priors,
    pnp_gs, pnp_diff) compiled as single jitted `lax.scan` programs.
  * Six degradation operators (denoising, box/random/paintbrush inpainting,
    Gaussian FFT deblurring, super-resolution) as pure XLA function pairs.
  * On-device PSNR/SSIM/LPIPS + FID/Vendi/Sliced-Wasserstein metrics.

Layout:
  ops/       pure XLA/Pallas compute: degradations, ODE solvers, resampling
             kernels, OT couplings, linear algebra
  models/    Flax modules: velocity U-Net, NCSN++, InceptionV3 (FID), LPIPS
  solvers/   the six restoration methods
  training/  flow-matching + gradient-step-denoiser trainers, EMA, checkpoints
  metrics/   restoration + generative metrics
  parallel/  mesh / sharding helpers
  data/      dataset pipelines (celeba, celebahq, afhq_cat, mnist, synthetic)
  utils/     config system, result reporting, torch-checkpoint converters
"""

__version__ = "0.1.0"
