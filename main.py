"""CLI driver — same public contract as the reference ``main.py``.

``python main.py --opts key value ...`` dispatches training, metric
evaluation and inverse-problem runs exactly like the reference
(main.py:29-216): 3-tier YAML config with --opts overrides, per-problem noise
defaults, results[/_laplace]/{dataset}/{model}/{problem}/{method}/{split}
result layout, so the reference's ``scripts/*.sh`` run unchanged.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

import pnpflow_tpu.utils.jax_setup  # noqa: F401  (persistent compile cache)
from pnpflow_tpu.utils.config import load_full_config
from pnpflow_tpu.ops.degradations import make_degradation
from pnpflow_tpu.data import DataLoaders


def parse_args():
    parser = argparse.ArgumentParser(description="Main")
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    cli = parser.parse_args()
    return load_full_config(cli.opts)


def build_method(args, bundle):
    from pnpflow_tpu.solvers.factory import build_solver

    return build_solver(bundle, args)


def main():
    args = parse_args()

    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)

    from pnpflow_tpu.models.registry import build_model_bundle

    data_root = os.path.join(args.root, "data")

    if args.train:
        args.batch_size = args.batch_size_train
        print("Training...")
        data_loaders = DataLoaders(
            args.dataset, args.batch_size_train, args.batch_size_train,
            root=data_root, dim_image=args.dim_image,
            num_channels=args.num_channels,
            backend=getattr(args, "data_backend", "thread"),
        ).load_data()
        if args.model in ("ot", "indep"):
            from pnpflow_tpu.training.flow_matching import FlowMatchingTrainer

            trainer = FlowMatchingTrainer(args)
        elif args.model == "gradient_step":
            from pnpflow_tpu.training.denoiser import GradientStepTrainer

            trainer = GradientStepTrainer(args)
        else:
            raise ValueError(
                "Model not implemented yet: choose 'ot' or 'gradient_step'"
            )
        trainer.train(data_loaders)
        print("Training done!")

    if args.eval:
        # --opts bf16 True: run solver inference in bfloat16 (params stay
        # fp32 on disk; compute + norms ride bf16 — the bench.py headline
        # configuration, ~1.7x the fp32 throughput at 64². Default fp32
        # preserves the reference-parity numerics.)
        import jax.numpy as jnp

        dtype = (
            jnp.bfloat16 if bool(getattr(args, "bf16", False))
            else jnp.float32
        )
        bundle = build_model_bundle(args, dtype=dtype)

        if args.compute_metrics:
            print("Computing metrics...")
            from pnpflow_tpu.metrics.generative import ComputeMetric

            # n=5000 is the reference protocol (compute_metric.py:30);
            # metric_n / metric_steps are test/sweep knobs
            n_metric = int(getattr(args, "metric_n", 5000) or 5000)
            metric_steps = int(getattr(args, "metric_steps", 100) or 100)
            data_loaders = DataLoaders(
                args.dataset, min(n_metric, 500), min(n_metric, 500),
                root=data_root, dim_image=args.dim_image,
                num_channels=args.num_channels,
                test_n=n_metric,  # synthetic: n real images for FID stats
            ).load_data()
            ComputeMetric(data_loaders, bundle, args).compute_metrics(
                n_metric, steps=metric_steps
            )
            print("Computing metrics done!")

        degradation, sigma_noise = make_degradation(args)

        print(
            "Solving the {} inverse problem with the method {}...".format(
                args.problem, args.method
            )
        )
        print("sigma_noise", sigma_noise)
        data_loaders = DataLoaders(
            args.dataset, args.batch_size_ip, args.batch_size_ip,
            root=data_root, dim_image=args.dim_image,
            num_channels=args.num_channels,
        ).load_data()

        results_dir = (
            "results_laplace" if args.noise_type == "laplace" else "results"
        )
        args.save_path = os.path.join(
            args.output_root, results_dir, args.dataset, args.model,
            args.problem, args.method, args.eval_split,
        )
        os.makedirs(args.save_path, exist_ok=True)

        method = build_method(args, bundle)
        method.run_method(data_loaders, degradation, sigma_noise)


if __name__ == "__main__":
    main()
