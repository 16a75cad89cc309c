"""Serving / library API: configure once, restore many batches.

The CLI (main.py) mirrors the reference's batch-evaluation protocol; this
module is the production-facing surface a deployment actually wants — a
``Restorer`` you build once (model weights loaded, degradation + solver
compiled programs cached) and call repeatedly on incoming measurement
batches, with no result-dir side effects:

    from pnpflow_tpu.serve import Restorer

    r = Restorer(method="pnp_flow", problem="gaussian_deblurring_FFT",
                 dim_image=64, overrides={"steps_pnp": 50})
    restored = r.restore(noisy_batch)           # NHWC numpy/jax, [-1, 1]

The first call per batch shape compiles (once — the solver's jitted scan
is cached across calls); ``warmup(batch_size)`` triggers that ahead of
traffic.  Per-call measurement RNG is keyed by the ``seed`` argument, so
identical inputs + seed reproduce bit-identical outputs.

All six methods and all six problems are valid; config resolution reuses
the shipped three-tier YAML surface so per-method hyperparameter defaults
match the CLI exactly, with ``overrides`` taking the place of ``--opts``.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

import pnpflow_tpu


def _config_root():
    # the shipped config/ tree lives at the repository root, one level
    # above the package
    return os.path.dirname(os.path.dirname(os.path.abspath(
        pnpflow_tpu.__file__
    )))


class Restorer:
    """One configured (model, degradation, solver) pipeline.

    Parameters mirror the CLI keys: ``method`` (pnp_flow/ot_ode/d_flow/
    flow_priors/pnp_gs/pnp_diff), ``problem`` (denoising/inpainting/
    random_inpainting/paintbrush_inpainting/superresolution/
    gaussian_deblurring_FFT), ``model`` family, image geometry, noise
    model.  ``params`` injects weights directly; otherwise the standard
    checkpoint resolution runs (msgpack > torch .pt > random init with a
    warning).  ``overrides`` is a dict of config keys applied like
    ``--opts``.
    """

    def __init__(self, method: str = "pnp_flow",
                 problem: str = "gaussian_deblurring_FFT",
                 model: str = "ot", dim_image: int = 64,
                 num_channels: int = 3, noise_type: str = "gaussian",
                 sigma_noise: float | None = None, batch_size: int = 4,
                 params=None, overrides: dict | None = None,
                 require_ckpt: bool = False, dtype=jnp.float32,
                 shard: bool = False, n_devices: int | None = None,
                 output_root: str | None = None):
        from pnpflow_tpu.models.registry import build_model_bundle
        from pnpflow_tpu.ops.degradations import make_degradation
        from pnpflow_tpu.solvers.factory import build_solver
        from pnpflow_tpu.utils.config import load_full_config

        opts = ["dataset", "synthetic", "model", model, "method", method,
                "problem", problem, "noise_type", noise_type,
                "batch_size_ip", str(batch_size), "save_results", "False",
                "compute_time", "False", "compute_memory", "False"]
        for k, v in (overrides or {}).items():
            opts += [str(k), str(v)]
        args = load_full_config(opts, root=_config_root())
        args.dim_image = dim_image
        args.num_channels = num_channels
        if output_root is not None:
            # hermetic checkpoint resolution: weights come from (and only
            # from) this root instead of whatever ./model/ the process
            # happens to be running next to
            args.output_root = str(output_root)
            if not args.output_root.endswith(os.sep):
                args.output_root += os.sep

        self.args = args
        self.bundle = build_model_bundle(
            args, dtype=dtype, params=params, require_ckpt=require_ckpt
        )
        self.degradation, default_sigma = make_degradation(
            args, batch_size=batch_size
        )
        self.sigma_noise = (
            float(sigma_noise) if sigma_noise is not None
            else float(default_sigma)
        )
        self.solver = build_solver(self.bundle, args)

        # multi-chip serving: shard incoming batches over the mesh 'data'
        # axis and replicate params — jit partitions the solver's scan
        # accordingly (batch must divide the device count)
        self.mesh = None
        if shard:
            from pnpflow_tpu.parallel.mesh import (
                make_mesh,
                replicate,
                shard_batch,
            )

            self.mesh = make_mesh(n_devices)
            self._shard_batch = shard_batch
            self.bundle.params = replicate(self.bundle.params, self.mesh)

    # -- forward model -----------------------------------------------------
    def degrade(self, clean, seed: int = 0):
        """Apply the forward operator + per-seed measurement noise — the
        protocol's y = H(x) + sigma*eps (reference pnp_flow.py:77-87)."""
        import jax

        clean = jnp.asarray(clean)
        key = jax.random.PRNGKey(seed)
        if self.args.noise_type == "laplace":
            u = jax.random.uniform(
                jax.random.fold_in(key, 1), clean.shape, clean.dtype,
                1e-6, 1.0 - 1e-6,
            ) - 0.5
            noise = -jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))
        else:
            noise = jax.random.normal(key, clean.shape, clean.dtype)
        return self.degradation.H(clean) + self.sigma_noise * noise

    # -- restoration -------------------------------------------------------
    def restore(self, noisy, seed: int = 0):
        """Restore one NHWC measurement batch -> numpy array.

        ``seed`` keys the solver's internal Monte-Carlo randomness (same
        role as the per-batch index in the CLI protocol): same (noisy,
        seed) -> identical output.
        """
        noisy = jnp.asarray(noisy, jnp.float32)
        if self.mesh is not None:
            noisy = self._shard_batch(noisy, self.mesh)
        out, _ = self.solver.solve_batch(
            noisy, noisy, self.degradation, self.sigma_noise, int(seed)
        )
        return np.asarray(out)

    def warmup(self, batch_size: int | None = None):
        """Compile the solve for a batch shape before serving traffic."""
        bs = batch_size or int(self.args.batch_size_ip)
        dummy = jnp.zeros(
            (bs, self.args.dim_image, self.args.dim_image,
             self.args.num_channels), jnp.float32,
        )
        self.restore(dummy, seed=0)
        return self
