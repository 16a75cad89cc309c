#!/usr/bin/env bash
# Tuned test-split runs: 6 methods x problems, 25 batches x batch size 4
# (protocol of reference scripts/script_test.sh — same CLI surface, tuned
# per-method hyperparameters from the paper appendix).
set -e

dataset=${dataset:-celeba}      # celeba | celebahq | afhq_cat
model=${model:-ot}              # rectified for celebahq; gradient_step for
                                # pnp_gs; diffusion for pnp_diff; ot otherwise
split=${eval_split:-test}
mb=${max_batch:-25}
bs=${batch_size_ip:-4}

common="dataset ${dataset} eval_split ${split} max_batch ${mb} batch_size_ip ${bs}"

run() { python main.py --opts ${common} "$@"; }

# --- pnp_flow: per-problem alpha
declare -A PF_ALPHA=(
  [denoising]=0.8 [gaussian_deblurring_FFT]=0.01 [superresolution]=0.3
  [inpainting]=0.5 [paintbrush_inpainting]=0.5 [random_inpainting]=0.01
)
for p in "${!PF_ALPHA[@]}"; do
  run model ${model} method pnp_flow problem ${p} \
      lr_pnp 1.0 alpha "${PF_ALPHA[$p]}" num_samples 5 steps_pnp 100
done

# --- ot_ode: per-problem start_time, gamma_t
declare -A OO_START=(
  [denoising]=0.3 [gaussian_deblurring_FFT]=0.4 [superresolution]=0.2
  [inpainting]=0.2 [random_inpainting]=0.1
)
for p in "${!OO_START[@]}"; do
  run model ${model} method ot_ode problem ${p} \
      start_time "${OO_START[$p]}" gamma gamma_t steps_ode 100
done

# --- d_flow
for p in denoising gaussian_deblurring_FFT superresolution inpainting random_inpainting; do
  run model ${model} method d_flow problem ${p} \
      steps_euler 6 lmbda 0.01 alpha 0.1 max_iter 20 LBFGS_iter 20
done

# --- flow_priors
for p in denoising gaussian_deblurring_FFT superresolution inpainting random_inpainting; do
  run model ${model} method flow_priors problem ${p} \
      N 100 K 1 lmbda 1000 eta 0.01
done

# --- pnp_gs (gradient-step denoiser model)
run model gradient_step method pnp_gs problem gaussian_deblurring_FFT \
    algo hqs alpha 0.5 max_iter 30
run model gradient_step method pnp_gs problem random_inpainting \
    algo hqs alpha 0.5 max_iter 30
run model gradient_step method pnp_gs problem superresolution_bicubic \
    algo hqs alpha 0.5 max_iter 30
run model gradient_step method pnp_gs problem denoising \
    algo pgd alpha 0.5 max_iter 30 sigma_factor 1.0

# --- pnp_diff (DiffPIR with diffusion prior)
for p in denoising gaussian_deblurring_FFT superresolution inpainting random_inpainting; do
  run model diffusion method pnp_diff problem ${p} \
      lmbda 7.0 zeta 0.3 max_iter 100
done
