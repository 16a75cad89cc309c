"""Flow-matching trainer — data-parallel over a ``jax.sharding.Mesh``.

Re-design of the reference ``FLOW_MATCHING`` trainer
(pnpflow/train_flow_matching.py:40-264):

  * per-batch minibatch-OT coupling ('ot') or independent coupling ('indep')
    (train_flow_matching.py:85-103) — exact host LP or on-device Sinkhorn
    (ops/ot.py);
  * linear interpolation x_t = t x1 + (1-t) x0, loss sum((v - (x1-x0))^2)/B
    (train_flow_matching.py:104-106);
  * Adam (train_flow_matching.py:245);
  * checkpoint + 16-sample plot every ``save_every`` (50) epochs
    (train_flow_matching.py:117-129), final checkpoint at the end (:249).

Deliberate improvements over the reference (recorded in SURVEY.md §7):
  * the whole update is ONE jitted, donated train step; the batch is sharded
    over the mesh 'data' axis and XLA emits the gradient all-reduce (psum) —
    the TPU-native replacement for torch DataParallel;
  * EMA of parameters (the reference only has EMA in dead vendored code);
  * full train-state checkpointing with resume (reference always restarts at
    epoch 0, train_flow_matching.py:65);
  * the reference's ``iteration > 20: break`` quirk (:70-71) becomes an
    explicit ``max_iters_per_epoch`` knob (default preserves the quirk for
    protocol parity; set -1 to disable).
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

from pnpflow_tpu.ops.ot import ot_pair_indices
from pnpflow_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from pnpflow_tpu.utils.jax_setup import default_compiler_options


def make_fm_loss(model_apply, remat: bool = False):
    """Flow-matching loss on an already-coupled (x0, x1) pair batch.

    ``remat=True`` wraps the model in ``jax.checkpoint`` — trade one extra
    forward for not storing activations, buying batch-size headroom in HBM.
    """
    if remat:
        model_apply = jax.checkpoint(model_apply)

    def loss_fn(params, x0, x1, t):
        xt = t[:, None, None, None] * x1 + (1.0 - t[:, None, None, None]) * x0
        v = model_apply(params, xt, t)
        target = x1 - x0
        # reference normalizes by batch size only (train_flow_matching.py:106)
        return jnp.sum((v - target) ** 2) / x1.shape[0]

    return loss_fn


def _apply_updates(state, loss_and_grads, tx, ema_decay):
    loss, grads = loss_and_grads
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    ema = jax.tree_util.tree_map(
        lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
        state["ema"], params,
    )
    return (
        {"params": params, "opt_state": opt_state, "ema": ema,
         "step": state["step"] + 1},
        loss,
    )


def make_fm_train_step(model_apply, tx, *, coupling: str = "ot",
                       ema_decay: float = 0.999,
                       ot_method: str = "sinkhorn", remat: bool = False):
    """Build the jitted train step ``(state, x1, key) -> (state, loss)``
    with the coupling computed INSIDE the jitted program (indep, on-device
    Sinkhorn, or exact via host callback on backends that support it).

    ``state`` is a dict {params, opt_state, ema, step}.  The step is pure;
    shard x1 over the mesh data axis and XLA inserts the psum for grads.
    """
    loss_fn = make_fm_loss(model_apply, remat=remat)

    def train_step(state, x1, key):
        k_noise, k_t, k_pair = jax.random.split(key, 3)
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        t = jax.random.uniform(k_t, (x1.shape[0],), x1.dtype)

        if coupling == "ot":
            i0, i1 = ot_pair_indices(x0, x1, k_pair, method=ot_method)
            x0, x1 = x0[i0], x1[i1]

        return _apply_updates(
            state, jax.value_and_grad(loss_fn)(state["params"], x0, x1, t),
            tx, ema_decay,
        )

    return train_step


def make_fm_train_step_precoupled(model_apply, tx, *,
                                  ema_decay: float = 0.999,
                                  remat: bool = False):
    """Jitted train step ``(state, x0, x1, key) -> (state, loss)`` for
    ALREADY-COUPLED (x0, x1) pairs.

    Used with host-side exact OT pairing (ops/ot.py:host_ot_pair — the C++
    Jonker-Volgenant solver) on backends without host-callback support: the
    pairing runs between steps on the host, the device program is pure
    compute.
    """
    loss_fn = make_fm_loss(model_apply, remat=remat)

    def train_step(state, x0, x1, key):
        t = jax.random.uniform(key, (x1.shape[0],), x1.dtype)
        return _apply_updates(
            state, jax.value_and_grad(loss_fn)(state["params"], x0, x1, t),
            tx, ema_decay,
        )

    return train_step


def euler_sample(model_apply, params, key, shape, steps: int = 100):
    """Euler integration of dx/dt = v(x, t) from t=0 (noise) to t=1."""
    x = jax.random.normal(key, shape)
    dt = 1.0 / steps

    def body(x, i):
        t = jnp.full((shape[0],), i * dt, dtype=jnp.float32)
        return x + dt * model_apply(params, x, t), None

    x, _ = jax.lax.scan(body, x, jnp.arange(steps, dtype=jnp.float32))
    return x


def euler_sample_stochastic(model_apply, params, key, shape,
                            steps: int = 100, sigma_var: float = 0.0,
                            noise_scale: float = 1.0, eps: float = 1e-3):
    """Stochastic Euler sampler converting the flow ODE into an equivalent
    diffusion while preserving marginals (vendored sampling.py:69-105,
    sigma_t(t) = (1-t) * sigma_var).  sigma_var = 0 reduces to plain Euler
    over t in [eps, 1]."""
    k0, k_loop = jax.random.split(key)
    x = noise_scale * jax.random.normal(k0, shape)
    dt = 1.0 / steps

    def body(carry, i):
        x, key = carry
        num_t = i / steps * (1.0 - eps) + eps
        t = jnp.full((shape[0],), num_t, dtype=jnp.float32)
        pred = model_apply(params, x, t)
        sigma_t = (1.0 - num_t) * sigma_var
        pred_sigma = pred + (sigma_t**2) / (
            2.0 * (noise_scale**2) * (1.0 - num_t) ** 2
        ) * (0.5 * num_t * (1.0 - num_t) * pred - 0.5 * (2.0 - num_t) * x)
        key, sub = jax.random.split(key)
        x = x + pred_sigma * dt + sigma_t * jnp.sqrt(dt) * jax.random.normal(
            sub, shape
        )
        return (x, key), None

    (x, _), _ = jax.lax.scan(
        body, (x, k_loop), jnp.arange(steps, dtype=jnp.float32)
    )
    return x


class FlowMatchingTrainer:
    """Reference-compatible trainer facade (train_flow_matching.py:40-249)."""

    def __init__(self, args, model=None):
        from pnpflow_tpu.models.registry import define_model

        self.args = args
        self.model = model if model is not None else define_model(args)
        self.coupling = "ot" if args.model == "ot" else "indep"
        self.lr = float(args.lr)
        self.num_epoch = int(args.num_epoch)
        self.save_every = int(getattr(args, "save_every", 50) or 50)
        # parity default: the reference breaks after 21 iterations/epoch
        # (train_flow_matching.py:70-71)
        self.max_iters_per_epoch = int(
            getattr(args, "max_iters_per_epoch", 21) or -1
        )
        self.ema_decay = float(getattr(args, "ema_decay", 0.999) or 0.999)
        self.model_dir = os.path.join(
            args.output_root, "model", args.dataset, args.model
        )
        os.makedirs(self.model_dir, exist_ok=True)
        # "msgpack" (default): single-file atomic resume state.  "orbax":
        # versioned async CheckpointManager (training/checkpoint.py).
        self._orbax = None
        if getattr(args, "ckpt_backend", "msgpack") == "orbax":
            from pnpflow_tpu.training.checkpoint import OrbaxCheckpointer

            self._orbax = OrbaxCheckpointer(
                os.path.join(self.model_dir, "orbax")
            )
        self.mesh = make_mesh()
        self.tx = optax.adam(self.lr)
        # exact OT pairing runs on the HOST between steps (C++ LAP solver)
        # — in-jit host callbacks are unsupported on some TPU runtimes;
        # 'sinkhorn' keeps the coupling fully on-device instead.
        self.ot_method = getattr(args, "ot_method", "exact") or "exact"
        self.precoupled = self.coupling == "ot" and self.ot_method == "exact"
        remat = bool(getattr(args, "remat", False))
        if self.precoupled:
            step = make_fm_train_step_precoupled(
                self.model.apply, self.tx, ema_decay=self.ema_decay,
                remat=remat,
            )
        else:
            step = make_fm_train_step(
                self.model.apply, self.tx, coupling=self.coupling,
                ema_decay=self.ema_decay, ot_method=self.ot_method,
                remat=remat,
            )
        # ONE compiled program per step, state buffers donated and rebound.
        # Without this wrap the loop dispatches the fwd+bwd op-by-op — on a
        # remote TPU runtime that is a round-trip per op (~30 s/step for the
        # 35M-param U-Net vs ~0.2 s jitted, measured round 4).
        self.train_step = jax.jit(
            step, donate_argnums=(0,),
            compiler_options=default_compiler_options(),
        )

    # -- state ---------------------------------------------------------------
    def init_state(self, seed: int = 0):
        dim, c = self.args.dim_image, self.args.num_channels
        x = jnp.zeros((1, dim, dim, c))
        params = self.model.init(jax.random.PRNGKey(seed), x, jnp.zeros((1,)))
        return {
            "params": params,
            "opt_state": self.tx.init(params),
            "ema": jax.tree_util.tree_map(jnp.copy, params),
            "step": jnp.zeros((), jnp.int32),
        }

    def _state_path(self):
        return os.path.join(self.model_dir, "train_state.msgpack")

    def save_preemption(self, state, epochs_done: int = 0):
        """Lightweight resume point (the vendored trainer's
        checkpoints-meta pattern, run_lib_pytorch.py:73-80), atomically
        replaced and tagged with the number of COMPLETED epochs."""
        if self._orbax is not None:
            self._orbax.save(state, epochs_done, force=True)
            return
        payload = dict(jax.device_get(state))
        payload["epochs_done"] = np.int32(epochs_done)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, self._state_path())

    def save_state(self, state, epoch=None, epochs_done: int = 0):
        from pnpflow_tpu.models.registry import (
            model_fingerprint,
            save_params_file,
        )

        self.save_preemption(state, epochs_done)
        state = jax.device_get(state)
        name = (
            "model_final.msgpack" if epoch is None
            else "model_{}.msgpack".format(epoch)
        )
        fp = model_fingerprint(self.model, self.args)
        save_params_file(
            state["params"], os.path.join(self.model_dir, name),
            fingerprint=fp,
        )
        save_params_file(
            state["ema"], os.path.join(self.model_dir, "ema_" + name),
            fingerprint=fp,
        )

    def restore_state(self, state):
        """-> (state, epochs_done, resumed).  Incompatible or legacy resume
        files are ignored with a warning (fresh start)."""
        import warnings

        if self._orbax is not None:
            return self._orbax.restore_latest(state)
        path = self._state_path()
        if not os.path.exists(path):
            return state, 0, False
        template = dict(state)
        template["epochs_done"] = np.int32(0)
        with open(path, "rb") as f:
            blob = f.read()
        try:
            restored = serialization.from_bytes(template, blob)
        except Exception as exc:  # corrupt or structurally incompatible
            warnings.warn(
                "Ignoring incompatible resume state at {} ({})".format(
                    path, exc
                )
            )
            return state, 0, False
        epochs_done = int(restored.pop("epochs_done"))
        return restored, epochs_done, True

    # -- loop ----------------------------------------------------------------
    def train(self, data_loaders):
        from pnpflow_tpu.data.prefetch import prefetch

        args = self.args
        train_loader = prefetch(data_loaders["train"])
        state = self.init_state(int(getattr(args, "seed", 0) or 0))
        state, start_epoch, resumed = self.restore_state(state)
        if resumed:
            print(
                "Resumed from step {} (epoch {})".format(
                    int(state["step"]), start_epoch
                )
            )
            if start_epoch >= self.num_epoch:
                print(
                    "Training already complete ({} epochs); delete {} to "
                    "retrain from scratch.".format(
                        start_epoch, self._state_path()
                    )
                )
                return state
        state = replicate(state, self.mesh)

        loss_file = os.path.join(self.model_dir, "loss_training.txt")
        info_file = os.path.join(self.model_dir, "model_info.txt")
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(state["params"])
        )
        with open(info_file, "w") as f:
            f.write("num_params {}\n".format(n_params))

        key = jax.random.fold_in(
            jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0)),
            start_epoch,
        )
        host_rng = np.random.default_rng(
            int(getattr(args, "seed", 0) or 0) + start_epoch
        )
        for epoch in range(start_epoch, self.num_epoch):
            t_ep = time.perf_counter()
            losses = []
            for iteration, (x1, _) in enumerate(train_loader):
                if (
                    self.max_iters_per_epoch > 0
                    and iteration > self.max_iters_per_epoch - 1
                ):
                    break
                x1 = np.asarray(x1, dtype=np.float32)
                self._last_batch = x1
                key, sub = jax.random.split(key)
                if self.precoupled:
                    from pnpflow_tpu.ops.ot import host_ot_pair

                    x0 = host_rng.standard_normal(
                        x1.shape, dtype=np.float32
                    )
                    i0, i1 = host_ot_pair(x0, x1, host_rng)
                    state, loss = self.train_step(
                        state,
                        shard_batch(x0[i0], self.mesh),
                        shard_batch(x1[i1], self.mesh),
                        sub,
                    )
                else:
                    state, loss = self.train_step(
                        state, shard_batch(x1, self.mesh), sub
                    )
                losses.append(loss)
            losses = [float(v) for v in jax.device_get(losses)]
            with open(loss_file, "a") as f:
                for v in losses:
                    f.write("{}\n".format(v))
            print(
                "epoch {} loss {:.4f} ({:.2f}s)".format(
                    epoch, float(np.mean(losses)) if losses else float("nan"),
                    time.perf_counter() - t_ep,
                )
            )
            # full-state resume point.  The state dump (params+opt+ema,
            # hundreds of MB) is ~1s on a local runtime but ~28s on the
            # tunneled axon backend (device->host pull at tunnel line rate;
            # measured round 4: 30s/epoch wall vs 1.5s compute at 64²
            # batch 32).  Default cadence is adaptive: write when the
            # compute accumulated since the last write reaches the measured
            # cost of one write, bounding resume-write overhead at ~50% of
            # wall time on slow-write runtimes while a fast runtime still
            # writes every epoch.  An integer --opts preempt_every forces a
            # fixed every-N-epochs cadence; preemption replays at most the
            # epochs since the last write either way.
            epoch_s = time.perf_counter() - t_ep
            preempt_every = getattr(args, "preempt_every", "auto") or "auto"
            if str(preempt_every) == "auto":
                self._compute_since_write = (
                    getattr(self, "_compute_since_write", 0.0) + epoch_s
                )
                if self._compute_since_write >= getattr(
                    self, "_resume_write_s", 0.0
                ):
                    t_w = time.perf_counter()
                    self.save_preemption(state, epochs_done=epoch + 1)
                    self._resume_write_s = time.perf_counter() - t_w
                    self._compute_since_write = 0.0
            elif (epoch + 1) % int(preempt_every) == 0:
                self.save_preemption(state, epochs_done=epoch + 1)
            if epoch % self.save_every == 0:
                self.save_state(state, epoch, epochs_done=epoch + 1)
                self._save_sample_plot(state, epoch)
                self._fid_checkpoint(state, epoch, data_loaders)
        self.save_state(state, epochs_done=self.num_epoch)
        return state

    def _fid_checkpoint(self, state, epoch, data_loaders, n: int = 5000):
        """FID-5k training curve via Euler-10-step sampling (reference
        train_flow_matching.py:117-129), appended to FID_5k.txt.  Skipped
        unless ``args.compute_metrics`` is set (it costs n model samples)."""
        if not getattr(self.args, "compute_metrics", False):
            return
        try:
            from pnpflow_tpu.metrics.generative import ComputeMetric
            from pnpflow_tpu.solvers.base import ModelBundle

            test = data_loaders.get("test") or data_loaders.get("train")
            bundle = ModelBundle(
                apply=self.model.apply, params=state["ema"],
                kind=self.args.model,
            )
            args = self.args
            if "eval_split" not in args:
                args.eval_split = "test"
            # FID-5k training curve uses the Euler-10 sampler (reference
            # train_flow_matching.py:117-129), not the metric protocol's
            # adaptive dopri5
            out = ComputeMetric({"test": test}, bundle, args).compute_metrics(
                n, steps=10, sampler="euler"
            )
            with open(os.path.join(self.model_dir, "FID_5k.txt"), "a") as f:
                f.write("{} {}\n".format(epoch, out["fid"]))
        except Exception as exc:  # pragma: no cover
            print("FID checkpoint skipped:", exc)

    # -- sampling / eval ------------------------------------------------------
    def apply_flow_matching(self, state_or_params, n: int, key=None,
                            steps: int = 100, use_ema: bool = True,
                            method: str = "euler"):
        """Sample n images by integrating the flow ODE from noise.

        ``method='euler'`` is the fixed-step sampler; ``'dopri5'`` matches
        the reference's adaptive odeint at rtol=atol=1e-5
        (train_flow_matching.py:131-150).
        """
        params = state_or_params
        if isinstance(state_or_params, dict) and "params" in state_or_params:
            params = state_or_params["ema" if use_ema else "params"]
        key = jax.random.PRNGKey(0) if key is None else key
        dim, c = self.args.dim_image, self.args.num_channels
        if method == "euler":
            return euler_sample(
                self.model.apply, params, key, (n, dim, dim, c), steps=steps
            )
        from pnpflow_tpu.ops.ode import odeint_dopri5

        z = jax.random.normal(key, (n, dim, dim, c))

        def vfield(x, t):
            t_vec = jnp.full((x.shape[0],), t, dtype=jnp.float32)
            return self.model.apply(params, x, t_vec)

        return odeint_dopri5(vfield, z, 0.0, 1.0, rtol=1e-5, atol=1e-5)

    def _save_sample_plot(self, state, epoch):
        """Model samples next to training samples (reference save_samples,
        utils.py:399-430)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        samples = jax.device_get(
            self.apply_flow_matching(state, 16, steps=10)
        )
        samples = np.clip((samples + 1.0) / 2.0, 0, 1)
        train = getattr(self, "_last_batch", None)
        ncols = 8 if train is not None else 4
        fig, axes = plt.subplots(4, ncols, figsize=(1.5 * ncols, 6))
        for i in range(16):
            r, c = i % 4, i // 4
            img = samples[i]
            axes[r][c].imshow(
                img[..., 0] if img.shape[-1] == 1 else img, cmap="gray"
            )
            axes[r][c].axis("off")
            if train is not None and i < len(train):
                timg = np.clip((train[i] + 1.0) / 2.0, 0, 1)
                axes[r][c + 4].imshow(
                    timg[..., 0] if timg.shape[-1] == 1 else timg,
                    cmap="gray",
                )
            if train is not None:
                axes[r][c + 4].axis("off")
        fig.suptitle("model samples | training samples")
        fig.savefig(os.path.join(self.model_dir, f"samples_{epoch}.png"))
        plt.close(fig)
