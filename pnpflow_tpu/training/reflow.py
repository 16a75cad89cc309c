"""Reflow / distillation for rectified flows (reference run_lib_reflow.py,
losses.py:43-146, sde_lib.py:8-107).

The reflow procedure retrains a rectified-flow model on *self-generated*
couplings: draw z0 ~ N(0, s²I), integrate the frozen model's ODE from eps
to T to get x1, then train on the (z0, x1) pairs — with a t-schedule and
loss selected by the config (config/rf_configs.py reflow.* keys):

  t-schedule  't0' (k=1 distillation), 't1' (reverse distill), 'uniform'
              (full reflow), or an int k (k-step distillation grid)
              (losses.py:89-105)
  loss        'l2', 'lpips', 'lpips+l2' (losses.py:118-133; the lpips
              variants require t-schedule 't0' and LPIPS weights)

TPU-first design: pair generation is a jitted ``lax.scan`` Euler ODE (or
dopri5 — the rk45-equivalent adaptive integrator from ops/ode.py run
per-batch), and the train step is the same donated, mesh-shardable step
as the FM trainer — reflow is just the precoupled path with a different
(t, target) law.  The reference's broken run_lib trainers are not
reproduced (DESIGN.md non-port list); this module provides the working
equivalents of their living parts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnpflow_tpu.ops.ode import odeint
from pnpflow_tpu.training.flow_matching import _apply_updates

EPS = 1e-3  # reference losses.py eps default / sde_lib ode eps


def sample_reflow_t(key, batch_size: int, schedule, eps: float = EPS,
                    T: float = 1.0, dtype=jnp.float32):
    """Draw per-sample times for a reflow t-schedule (losses.py:89-105)."""
    if schedule == "t0":
        return jnp.full((batch_size,), eps, dtype)
    if schedule == "t1":
        return jnp.full((batch_size,), T, dtype)
    if schedule == "uniform":
        u = jax.random.uniform(key, (batch_size,), dtype)
        return u * (T - eps) + eps
    if isinstance(schedule, int):
        k = jax.random.randint(key, (batch_size,), 0, schedule)
        return k.astype(dtype) * (T - eps) / schedule + eps
    raise NotImplementedError("reflow t-schedule: {}".format(schedule))


def make_reflow_loss(model_apply, t_schedule="uniform", loss_type="l2",
                     lpips_fn=None, reduce_mean: bool = True,
                     eps: float = EPS):
    """Loss on a self-generated (z0, x1) pair batch.

    ``model_apply(params, x, t)`` must already include the model's t
    convention (e.g. the rectified t*999 fold, models/registry.py).
    ``lpips_fn(a, b) -> (B,)`` is required for the lpips variants.
    Returns ``loss_fn(params, z0, x1, t)``.
    """
    if "lpips" in str(loss_type) and lpips_fn is None:
        raise ValueError(
            "loss_type {} needs an lpips_fn (LPIPS weights)".format(loss_type)
        )
    if "lpips" in str(loss_type) and t_schedule != "t0":
        # reference asserts this (losses.py:124,127)
        raise ValueError("lpips reflow losses require t_schedule 't0'")

    def loss_fn(params, z0, x1, t):
        te = t[:, None, None, None]
        xt = te * x1 + (1.0 - te) * z0
        v = model_apply(params, xt, t)
        target = x1 - z0
        b = x1.shape[0]
        if loss_type == "l2":
            per = jnp.square(v - target).reshape(b, -1)
            per = per.mean(-1) if reduce_mean else 0.5 * per.sum(-1)
        elif loss_type == "lpips":
            per = lpips_fn(z0 + v, x1)
        elif loss_type == "lpips+l2":
            per = (lpips_fn(z0 + v, x1)
                   + jnp.square(v - target).reshape(b, -1).mean(-1))
        else:
            raise NotImplementedError("reflow loss: {}".format(loss_type))
        return jnp.mean(per)

    return loss_fn


def make_reflow_train_step(model_apply, tx, *, t_schedule="uniform",
                           loss_type="l2", lpips_fn=None,
                           reduce_mean: bool = True,
                           ema_decay: float = 0.9999, eps: float = EPS):
    """Jitted step ``(state, z0, x1, key) -> (state, loss)`` on
    pre-generated pairs — shard (z0, x1) over the mesh data axis exactly
    like the FM precoupled step."""
    loss_fn = make_reflow_loss(model_apply, t_schedule, loss_type, lpips_fn,
                               reduce_mean, eps)

    def train_step(state, z0, x1, key):
        t = sample_reflow_t(key, x1.shape[0], t_schedule, eps,
                            dtype=x1.dtype)
        return _apply_updates(
            state, jax.value_and_grad(loss_fn)(state["params"], z0, x1, t),
            tx, ema_decay,
        )

    return train_step


def generate_reflow_pairs(model_apply, params, key, shape,
                          sampler: str = "euler", steps: int = 100,
                          init_noise_scale: float = 1.0,
                          ode_tol: float = 1e-5, eps: float = EPS):
    """(z0, x1) pair generation from the frozen model
    (sde_lib.py:37-107 ode/euler_ode; run_lib_reflow 'generate_data_from_z0').

    ``sampler``: 'euler' (fixed N steps, sde_lib.euler_ode) or 'rk45'
    (adaptive dopri5 — same family as scipy's RK45, sde_lib.ode).
    Jittable; wrap in jax.jit at the call site for batched generation.
    """
    z0 = init_noise_scale * jax.random.normal(key, shape)

    def vfield(x, t):
        tvec = jnp.full((shape[0],), t, z0.dtype)
        return model_apply(params, x, tvec)

    if sampler == "euler":
        # the reference's euler_ode quirk (sde_lib.py:74-94): t grid
        # eps + i/N*(T-eps) but dt = 1/N, so the total advance is 1.0,
        # not (1-eps) — reproduced exactly (as the samplers in
        # training/{flow_matching,sampling}.py already do)
        dt = 1.0 / steps

        def body(x, i):
            t = i / steps * (1.0 - eps) + eps
            return x + dt * vfield(x, t), None

        x1, _ = jax.lax.scan(body, z0,
                             jnp.arange(steps, dtype=jnp.float32))
    else:
        method = "dopri5" if sampler == "rk45" else sampler
        x1 = odeint(vfield, z0, eps, 1.0, method=method, steps=steps,
                    rtol=ode_tol, atol=ode_tol)
    return z0, jax.lax.stop_gradient(x1)


def make_online_reflow_step(model_apply, tx, *, t_schedule="t0",
                            loss_type="l2", lpips_fn=None,
                            reduce_mean: bool = True,
                            ema_decay: float = 0.9999,
                            gen_steps: int = 20,
                            init_noise_scale: float = 1.0,
                            eps: float = EPS):
    """One-step online reflow ('train_online_reflow'): generate the (z0,
    x1) pair batch from the CURRENT params (stop-gradient) and immediately
    train on it — all inside one jitted program (pair generation is a
    lax.scan Euler integration, so no host round-trips)."""
    loss_fn = make_reflow_loss(model_apply, t_schedule, loss_type, lpips_fn,
                               reduce_mean, eps)

    def train_step(state, shape, key):
        k_gen, k_t = jax.random.split(key)
        z0, x1 = generate_reflow_pairs(
            model_apply, jax.lax.stop_gradient(state["params"]), k_gen,
            shape, sampler="euler", steps=gen_steps,
            init_noise_scale=init_noise_scale, eps=eps,
        )
        t = sample_reflow_t(k_t, shape[0], t_schedule, eps, dtype=x1.dtype)
        return _apply_updates(
            state, jax.value_and_grad(loss_fn)(state["params"], z0, x1, t),
            tx, ema_decay,
        )

    return train_step
