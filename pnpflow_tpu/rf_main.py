"""Rectified-flow driver — the working equivalent of the reference's
``image_generation/main.py`` (absl, run_lib) which is broken as shipped
(its run_lib trainers call dataset functions that don't exist;
SURVEY.md §2.2).

Modes (reference --mode train|eval|reflow, image_generation/main.py:30-36):

  train           flow-matching training of the config's model on the
                  config's data (synthetic smoke data or any dataset the
                  data layer serves), with the config's optim settings
                  (Adam + warmup + grad clip, losses.py:26-52) and EMA
  sample          draw samples with the config's sampler (euler/rk45,
                  sigma_variance, sample_N) into PNGs + an .npz
  reflow          reflow/distillation per the config's reflow.* block:
                  generate (z0, x1) pairs from the current weights, then
                  train on them with the configured t-schedule and loss
  generate_pairs  just the pair-generation stage, saved to .npz
                  (reflow_type 'generate_data_from_z0')

Usage:
  python -m pnpflow_tpu.rf_main --config cifar10_rf_gaussian_ddpmpp \
      --mode sample --workdir ./rf_runs/cifar10 [--opts key value ...]

``--opts`` accepts dotted config keys (e.g. ``training.batch_size 32``).
Checkpoints are msgpack at <workdir>/state.msgpack (saved by train/reflow,
loaded by every mode when present).
"""

from __future__ import annotations

import argparse
import os
from ast import literal_eval

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import serialization

import pnpflow_tpu.utils.jax_setup  # noqa: F401


def _apply_opts(cfg, opts):
    from pnpflow_tpu.utils.config import CfgNode

    for key, raw in zip(opts[0::2], opts[1::2]):
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            if p not in node:
                # e.g. adding a reflow.* block to a non-reflow base config
                node[p] = CfgNode({})
            node = node[p]
        try:
            val = literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw
        node[parts[-1]] = val
    return cfg


def _model_and_apply(cfg, dtype=jnp.float32):
    from pnpflow_tpu.models import zoo

    model = zoo.create_model(cfg, dtype=dtype)

    # continuous-time RF models take t*999 labels (losses.py:116,
    # models/registry.py:136-143)
    def apply(params, x, t):
        return model.apply(params, x, t * 999.0)

    return model, apply


def _state_path(workdir):
    return os.path.join(workdir, "state.msgpack")


def _init_params(model, cfg, seed=0):
    d = cfg.data
    x = np.zeros((1, d.image_size, d.image_size, d.num_channels),
                 np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return model.init(jax.random.PRNGKey(seed), jnp.asarray(x),
                          jnp.zeros((1,)))


def _load_or_init(model, cfg, workdir):
    params = _init_params(model, cfg)
    path = _state_path(workdir)
    if os.path.exists(path):
        with open(path, "rb") as f:
            params = serialization.from_bytes(params, f.read())
        print("restored", path)
    return params


def _save(params, workdir):
    os.makedirs(workdir, exist_ok=True)
    with open(_state_path(workdir), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def _optimizer(cfg):
    """Adam + linear warmup + global-norm clip (losses.py:26-52)."""
    o = cfg.optim
    sched = optax.linear_schedule(0.0, o.lr, max(int(o.warmup), 1))
    return optax.chain(
        optax.clip_by_global_norm(o.grad_clip),
        optax.scale_by_adam(b1=o.beta1, eps=o.eps),
        optax.scale_by_learning_rate(sched),
    )


def _data_batches(cfg, n_iters, batch_size):
    """Training batches from the data layer; 'synthetic' smoke data when
    the config's dataset is not materialized locally."""
    from pnpflow_tpu.data.datasets import DataLoaders, synthetic_images

    d = cfg.data
    name = {"CIFAR10": "cifar10", "LSUN": "lsun"}.get(
        d.dataset, str(d.dataset).lower()
    )
    try:
        loaders = DataLoaders(
            name, batch_size, batch_size,
            dim_image=d.image_size, num_channels=d.num_channels,
        ).load_data()
        train = loaders["train"]
    except Exception:
        imgs = synthetic_images(
            max(batch_size * 4, 64), d.image_size, d.num_channels, seed=0
        )
        from pnpflow_tpu.data.datasets import _ArrayDataset

        train = _ArrayDataset(imgs, batch_size, shuffle=True)
        print("dataset '{}' unavailable — synthetic smoke data".format(name))

    it = 0
    while it < n_iters:
        for x, _ in train:
            if it >= n_iters:
                return
            yield jnp.asarray(x)
            it += 1


def mode_train(cfg, workdir, n_iters):
    from pnpflow_tpu.training.flow_matching import (
        make_fm_train_step_precoupled,
    )

    model, apply = _model_and_apply(cfg)
    params = _load_or_init(model, cfg, workdir)
    tx = _optimizer(cfg)
    step = jax.jit(make_fm_train_step_precoupled(
        apply, tx, ema_decay=float(cfg.model.get("ema_rate", 0.999)),
    ))
    state = {"params": params, "opt_state": tx.init(params),
             "ema": params, "step": jnp.int32(0)}
    bs = int(cfg.training.batch_size)
    for i, x1 in enumerate(_data_batches(cfg, n_iters, bs)):
        key = jax.random.PRNGKey(i)
        z0 = jax.random.normal(jax.random.fold_in(key, 1), x1.shape)
        state, loss = step(state, z0, x1, key)
        print("iter {} loss {:.5f}".format(i, float(loss)), flush=True)
    _save(state["params"], workdir)
    print("saved", _state_path(workdir))


def mode_sample(cfg, workdir, n=16):
    from pnpflow_tpu.training.sampling import get_sampling_fn

    model, apply = _model_and_apply(cfg)
    params = _load_or_init(model, cfg, workdir)
    d = cfg.data
    shape = (n, d.image_size, d.image_size, d.num_channels)
    sample = get_sampling_fn(
        cfg, apply, shape,
        inverse_scaler=(lambda x: (x + 1.0) / 2.0) if d.centered
        else (lambda x: x),
    )
    x, nfe = sample(params, jax.random.PRNGKey(0))
    os.makedirs(workdir, exist_ok=True)
    out = os.path.join(workdir, "samples.npz")
    np.savez(out, samples=np.asarray(x))
    print("sampled", x.shape, "nfe", nfe, "->", out)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        side = int(np.ceil(np.sqrt(n)))
        fig, axes = plt.subplots(side, side, figsize=(side * 2, side * 2))
        for i, ax in enumerate(np.ravel(axes)):
            ax.axis("off")
            if i < n:
                img = np.clip(np.asarray(x[i]), 0, 1)
                ax.imshow(img.squeeze(), cmap="gray"
                          if img.shape[-1] == 1 else None)
        fig.savefig(os.path.join(workdir, "samples.png"),
                    bbox_inches="tight")
        plt.close(fig)
    except Exception as exc:  # headless/plot issues must not kill the run
        print("plot skipped:", exc)


def mode_reflow(cfg, workdir, n_iters):
    from pnpflow_tpu.training.reflow import (
        generate_reflow_pairs,
        make_online_reflow_step,
        make_reflow_train_step,
    )

    model, apply = _model_and_apply(cfg)
    params = _load_or_init(model, cfg, workdir)
    r = cfg.reflow
    loss_type = r.reflow_loss
    if "lpips" in str(loss_type):
        # the lpips losses need converted LPIPS weights (metrics/lpips.py);
        # without them fall back to l2 loudly rather than crash
        import warnings

        warnings.warn(
            "reflow_loss {} needs LPIPS weights — falling back to l2 "
            "(pass an lpips_fn via the library API for the real loss)"
            .format(loss_type)
        )
        loss_type = "l2"
    tx = _optimizer(cfg)
    bs = int(cfg.training.batch_size)
    d = cfg.data
    shape = (bs, d.image_size, d.image_size, d.num_channels)
    state = {"params": params, "opt_state": tx.init(params),
             "ema": params, "step": jnp.int32(0)}

    if r.reflow_type == "train_online_reflow":
        import functools

        step = jax.jit(functools.partial(
            make_online_reflow_step(
                apply, tx, t_schedule=r.reflow_t_schedule,
                loss_type=loss_type,
                ema_decay=float(cfg.model.get("ema_rate", 0.9999)),
            ), shape=shape,
        ))
        for i in range(n_iters):
            state, loss = step(state, key=jax.random.PRNGKey(i))
            print("iter {} loss {:.5f}".format(i, float(loss)), flush=True)
    else:
        step = jax.jit(make_reflow_train_step(
            apply, tx, t_schedule=r.reflow_t_schedule,
            loss_type=loss_type,
            ema_decay=float(cfg.model.get("ema_rate", 0.9999)),
        ))
        gen = jax.jit(lambda p, k: generate_reflow_pairs(
            apply, p, k, shape, sampler="euler",
            steps=int(cfg.sampling.get("sample_N", 100)),
        ))
        for i in range(n_iters):
            z0, x1 = gen(state["params"], jax.random.PRNGKey(1000 + i))
            state, loss = step(state, z0, x1, jax.random.PRNGKey(i))
            print("iter {} loss {:.5f}".format(i, float(loss)), flush=True)
    _save(state["params"], workdir)
    print("saved", _state_path(workdir))


def mode_generate_pairs(cfg, workdir):
    from pnpflow_tpu.training.reflow import generate_reflow_pairs

    model, apply = _model_and_apply(cfg)
    params = _load_or_init(model, cfg, workdir)
    r = cfg.reflow
    d = cfg.data
    total = int(r.get("total_number_of_samples", 64))
    bs = min(int(cfg.training.batch_size), total)
    shape = (bs, d.image_size, d.image_size, d.num_channels)
    zs, xs = [], []
    done = 0
    while done < total:
        z0, x1 = generate_reflow_pairs(
            apply, params, jax.random.PRNGKey(done), shape,
            sampler="euler", steps=int(cfg.sampling.get("sample_N", 100)),
        )
        zs.append(np.asarray(z0))
        xs.append(np.asarray(x1))
        done += bs
    os.makedirs(workdir, exist_ok=True)
    out = os.path.join(workdir, "reflow_pairs.npz")
    np.savez(out, z0=np.concatenate(zs)[:total],
             x1=np.concatenate(xs)[:total])
    print("wrote {} pairs -> {}".format(total, out))


def main(argv=None):
    from pnpflow_tpu.config.rf_configs import available, get_config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True,
                   help="one of: {}".format(", ".join(available())))
    p.add_argument("--mode", required=True,
                   choices=["train", "sample", "reflow", "generate_pairs"])
    p.add_argument("--workdir", default="./rf_run")
    p.add_argument("--n_iters", type=int, default=100)
    p.add_argument("--n_samples", type=int, default=16)
    p.add_argument("--opts", nargs=argparse.REMAINDER, default=[])
    ns = p.parse_args(argv)

    cfg = _apply_opts(get_config(ns.config), ns.opts)
    if ns.mode == "train":
        mode_train(cfg, ns.workdir, ns.n_iters)
    elif ns.mode == "sample":
        mode_sample(cfg, ns.workdir, ns.n_samples)
    elif ns.mode == "reflow":
        mode_reflow(cfg, ns.workdir, ns.n_iters)
    else:
        mode_generate_pairs(cfg, ns.workdir)


if __name__ == "__main__":
    main()
