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
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

from pnpflow_tpu.ops.ot import ot_pair_indices
from pnpflow_tpu.parallel.mesh import (
    data_parallel_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def make_fm_loss(model_apply):
    """Flow-matching loss on an already-coupled (x0, x1) pair batch."""

    def loss_fn(params, x0, x1, t):
        xt = t[:, None, None, None] * x1 + (1.0 - t[:, None, None, None]) * x0
        v = model_apply(params, xt, t)
        target = x1 - x0
        # reference normalizes by batch size only (train_flow_matching.py:106)
        return jnp.sum((v - target) ** 2) / x1.shape[0]

    return loss_fn


def make_fm_train_step(model_apply, tx, *, coupling: str = "ot",
                       ema_decay: float = 0.999,
                       ot_method: str = "exact"):
    """Build the jitted train step ``(state, x1, key) -> (state, loss)``.

    ``state`` is a dict {params, opt_state, ema, step}.  The step is pure;
    shard x1 over the mesh data axis and XLA inserts the psum for grads.
    """
    loss_fn = make_fm_loss(model_apply)

    def train_step(state, x1, key):
        k_noise, k_t, k_pair = jax.random.split(key, 3)
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        t = jax.random.uniform(k_t, (x1.shape[0],), x1.dtype)

        if coupling == "ot":
            i0, i1 = ot_pair_indices(x0, x1, k_pair, method=ot_method)
            x0, x1 = x0[i0], x1[i1]

        loss, grads = jax.value_and_grad(loss_fn)(state["params"], x0, x1, t)
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
        self.mesh = make_mesh()
        self.tx = optax.adam(self.lr)
        self.train_step = make_fm_train_step(
            self.model.apply, self.tx, coupling=self.coupling,
            ema_decay=self.ema_decay,
            ot_method=getattr(args, "ot_method", "exact"),
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

    def save_state(self, state, epoch=None):
        state = jax.device_get(state)
        with open(self._state_path(), "wb") as f:
            f.write(serialization.to_bytes(state))
        name = (
            "model_final.msgpack" if epoch is None
            else "model_{}.msgpack".format(epoch)
        )
        with open(os.path.join(self.model_dir, name), "wb") as f:
            f.write(serialization.to_bytes(state["params"]))
        with open(os.path.join(self.model_dir, "ema_" + name), "wb") as f:
            f.write(serialization.to_bytes(state["ema"]))

    def restore_state(self, state):
        path = self._state_path()
        if not os.path.exists(path):
            return state, False
        with open(path, "rb") as f:
            return serialization.from_bytes(state, f.read()), True

    # -- loop ----------------------------------------------------------------
    def train(self, data_loaders):
        args = self.args
        train_loader = data_loaders["train"]
        state = self.init_state(int(getattr(args, "seed", 0) or 0))
        state, resumed = self.restore_state(state)
        if resumed:
            print("Resumed from step", int(state["step"]))
        state = replicate(state, self.mesh)

        loss_file = os.path.join(self.model_dir, "loss_training.txt")
        info_file = os.path.join(self.model_dir, "model_info.txt")
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(state["params"])
        )
        with open(info_file, "w") as f:
            f.write("num_params {}\n".format(n_params))

        key = jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0))
        step0 = int(jax.device_get(state["step"]))
        for epoch in range(self.num_epoch):
            t_ep = time.perf_counter()
            losses = []
            for iteration, (x1, _) in enumerate(train_loader):
                if (
                    self.max_iters_per_epoch > 0
                    and iteration > self.max_iters_per_epoch - 1
                ):
                    break
                x1 = shard_batch(np.asarray(x1, dtype=np.float32), self.mesh)
                key, sub = jax.random.split(key)
                state, loss = self.train_step(state, x1, sub)
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
            if epoch % self.save_every == 0:
                self.save_state(state, epoch)
                self._save_sample_plot(state, epoch)
        self.save_state(state)
        return state

    # -- sampling / eval ------------------------------------------------------
    def apply_flow_matching(self, state_or_params, n: int, key=None,
                            steps: int = 100, use_ema: bool = True):
        params = state_or_params
        if isinstance(state_or_params, dict) and "params" in state_or_params:
            params = state_or_params["ema" if use_ema else "params"]
        key = jax.random.PRNGKey(0) if key is None else key
        dim, c = self.args.dim_image, self.args.num_channels
        return euler_sample(
            self.model.apply, params, key, (n, dim, dim, c), steps=steps
        )

    def _save_sample_plot(self, state, epoch):
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
        fig, axes = plt.subplots(4, 4, figsize=(6, 6))
        for i, ax in enumerate(axes.flat):
            img = samples[i]
            ax.imshow(img[..., 0] if img.shape[-1] == 1 else img, cmap="gray")
            ax.axis("off")
        fig.savefig(os.path.join(self.model_dir, f"samples_{epoch}.png"))
        plt.close(fig)
