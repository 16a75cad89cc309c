"""Standalone EMA vs the reference ExponentialMovingAverage semantics
(image_generation/models/ema.py:10-98)."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from pnpflow_tpu.training import ema as ema_mod


def test_warmup_decay_ramp():
    """Effective decay is min(decay, (1+n)/(10+n)) — early updates track
    the params fast (ema.py:44-47)."""
    params = {"w": jnp.zeros((3,))}
    st = ema_mod.init(params, decay=0.999)
    st = ema_mod.update(st, {"w": jnp.ones((3,))})
    # n=1 -> decay = min(0.999, 2/11); shadow = 0 - (1-2/11)*(0-1) = 9/11
    np.testing.assert_allclose(np.asarray(st.shadow["w"]),
                               9.0 / 11.0, rtol=1e-6)
    assert int(st.num_updates) == 1


def test_no_warmup_fixed_decay():
    params = {"w": jnp.zeros((2,))}
    st = ema_mod.init(params, decay=0.9, use_num_updates=False)
    st = ema_mod.update(st, {"w": jnp.ones((2,))})
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 0.1, rtol=1e-6)
    assert st.num_updates is None


def test_invalid_decay_raises():
    with pytest.raises(ValueError):
        ema_mod.init({"w": jnp.zeros(1)}, decay=1.5)


def test_matches_reference_torch_ema():
    """Trajectory parity with the actual reference class over 20 updates."""
    if not os.path.isdir("/root/reference/pnpflow"):
        pytest.skip("reference not mounted")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from pnpflow.image_generation.models.ema import (
        ExponentialMovingAverage,
    )

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3)).astype(np.float32)
    tparam = torch.nn.Parameter(torch.from_numpy(w.copy()))
    ref = ExponentialMovingAverage([tparam], decay=0.999)
    st = ema_mod.init({"w": jnp.asarray(w)}, decay=0.999)

    for i in range(20):
        step = rng.normal(size=w.shape).astype(np.float32) * 0.1
        with torch.no_grad():
            tparam.add_(torch.from_numpy(step))
        ref.update([tparam])
        st = ema_mod.update(st, {"w": jnp.asarray(
            tparam.detach().numpy()
        )})

    np.testing.assert_allclose(
        np.asarray(st.shadow["w"]),
        ref.shadow_params[0].numpy(), rtol=1e-5, atol=1e-6,
    )


def test_stateful_wrapper_store_restore():
    p0 = {"w": jnp.zeros((2,))}
    e = ema_mod.EMA(p0, decay=0.5, use_num_updates=False)
    e.update({"w": jnp.ones((2,))})
    e.store(p0)
    avg = e.copy_to()
    np.testing.assert_allclose(np.asarray(avg["w"]), 0.5)
    back = e.restore()
    np.testing.assert_allclose(np.asarray(back["w"]), 0.0)
    sd = e.state_dict()
    e2 = ema_mod.EMA(p0, decay=0.1)
    e2.load_state_dict(sd)
    np.testing.assert_allclose(np.asarray(e2.copy_to()["w"]), 0.5)
