#!/usr/bin/env bash
# Timing/memory protocol: CelebA 128 deblurring, 25 batches x bs 4, per
# method (reference scripts/script_compute_time.sh).  Writes time_stats.txt
# / memory_stats.txt + averages.
set -e

dataset=${dataset:-celeba}
problem=gaussian_deblurring_FFT
common="dataset ${dataset} eval_split test problem ${problem} max_batch 25 \
batch_size_ip 4 compute_memory True compute_time True save_results False"

python main.py --opts ${common} model ot method pnp_flow \
    lr_pnp 1.0 alpha 0.01 num_samples 5 steps_pnp 100
python main.py --opts ${common} model ot method ot_ode \
    start_time 0.4 gamma gamma_t steps_ode 100
python main.py --opts ${common} model ot method d_flow \
    steps_euler 6 lmbda 0.01 alpha 0.1 max_iter 20 LBFGS_iter 20
python main.py --opts ${common} model ot method flow_priors \
    N 100 K 1 lmbda 1000 eta 0.01
python main.py --opts ${common} model gradient_step method pnp_gs \
    algo hqs alpha 0.5 max_iter 30
python main.py --opts ${common} model diffusion method pnp_diff \
    lmbda 7.0 zeta 0.3 max_iter 100
