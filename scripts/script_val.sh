#!/usr/bin/env bash
# Hyperparameter grid sweeps on the validation split (reference
# scripts/script_val.sh): 8 batches x bs 4; final_*.txt accumulates one row
# per configuration for sweep comparison.
set -e

dataset=${dataset:-celeba}
model=${model:-ot}
common="dataset ${dataset} eval_split val max_batch 8 batch_size_ip 4"

run() { python main.py --opts ${common} "$@"; }

problems="denoising gaussian_deblurring_FFT superresolution inpainting random_inpainting"

# pnp_flow: alpha sweep
for alpha in 0.01 0.1 0.3 0.5 0.8 1.0; do
  for p in ${problems}; do
    run model ${model} method pnp_flow problem ${p} \
        lr_pnp 1.0 alpha ${alpha} num_samples 5 steps_pnp 100
  done
done

# ot_ode: start_time sweep
for st in 0.1 0.2 0.3 0.4; do
  for p in ${problems}; do
    run model ${model} method ot_ode problem ${p} \
        start_time ${st} gamma gamma_t steps_ode 100
  done
done

# d_flow: lmbda sweep
for lm in 0.001 0.01 0.1 1.0; do
  for p in ${problems}; do
    run model ${model} method d_flow problem ${p} \
        steps_euler 6 lmbda ${lm} alpha 0.1 max_iter 20 LBFGS_iter 20
  done
done

# flow_priors: lmbda/eta sweep
for lm in 100 1000 10000; do
  for eta in 0.001 0.01 0.1; do
    for p in ${problems}; do
      run model ${model} method flow_priors problem ${p} \
          N 100 K 1 lmbda ${lm} eta ${eta}
    done
  done
done

# pnp_diff: zeta/lmbda sweep
for zeta in 0.1 0.3 0.5; do
  for lm in 3.0 7.0 12.0; do
    for p in ${problems}; do
      run model diffusion method pnp_diff problem ${p} \
          lmbda ${lm} zeta ${zeta} max_iter 100
    done
  done
done
