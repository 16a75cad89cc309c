"""Generative metric correctness: FID math vs scipy reference, Vendi
closed-form cases, sliced-Wasserstein basic properties; SSIM/PSNR parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnpflow_tpu.metrics.generative import (
    activation_statistics,
    fid_from_features,
    frechet_distance,
    inception_score,
    kid_from_features,
    sliced_wasserstein,
    vendi_score,
)
from pnpflow_tpu.metrics.image_quality import psnr, ssim


def test_fid_identical_sets_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(256, 16)).astype(np.float32)
    assert abs(fid_from_features(f, f.copy())) < 1e-3


def test_fid_shifted_gaussians_matches_closed_form():
    """For equal covariance and mean shift d, FID ~ ||d||^2."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20000, 4)).astype(np.float32)
    shift = np.array([1.0, 0.5, 0.0, -0.5], np.float32)
    b = rng.normal(size=(20000, 4)).astype(np.float32) + shift
    fid = fid_from_features(a, b)
    assert abs(fid - float((shift**2).sum())) < 0.1


def test_kid_matches_numpy_mmd():
    """Single-block KID vs an independent numpy unbiased-MMD² with tfgan's
    polynomial kernel (x·y/d + 1)³ (reference vendored
    evaluation.py:224-259 computes the same estimator via tfgan)."""
    rng = np.random.default_rng(3)
    fx = rng.normal(size=(64, 8)).astype(np.float32)
    fy = (rng.normal(size=(48, 8)) + 0.4).astype(np.float32)
    kid, std = kid_from_features(fx, fy)

    d = fx.shape[1]
    kxx = (fx @ fx.T / d + 1.0) ** 3
    kyy = (fy @ fy.T / d + 1.0) ** 3
    kxy = (fx @ fy.T / d + 1.0) ** 3
    m, n = len(fx), len(fy)
    want = ((kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
            - 2.0 * kxy.mean())
    assert abs(kid - want) < 1e-4 * abs(want)
    assert std == 0.0  # one block


def test_kid_identical_near_zero_shifted_positive():
    rng = np.random.default_rng(4)
    f = rng.normal(size=(512, 16)).astype(np.float32)
    kid_same, _ = kid_from_features(f, f.copy())
    g = f + 1.0
    kid_diff, _ = kid_from_features(f, g)
    # identical sets: small (estimator noise only); shifted: large
    assert abs(kid_same) < 0.1
    assert kid_diff > 10 * abs(kid_same)
    # blocked estimator path (n_blocks > 1) stays finite and positive
    kid_b, std_b = kid_from_features(f, g, max_block_size=128)
    assert np.isfinite(kid_b) and np.isfinite(std_b)
    assert abs(kid_b - kid_diff) < 0.5 * kid_diff + 1e-6


def test_inception_score_closed_forms():
    """Uniform p(y|x) -> IS = 1; K distinct one-hot classes used uniformly
    -> IS = K (both exact closed forms of exp(E KL(p(y|x)||p(y))))."""
    k = 16
    uniform = np.full((200, k), 1.0 / k)
    mean, std = inception_score(uniform, splits=4)
    assert abs(mean - 1.0) < 1e-6 and std < 1e-6

    eye = np.eye(k)
    onehot = eye[np.arange(320) % k]  # every split sees all K classes
    mean, std = inception_score(onehot, splits=4)
    assert abs(mean - k) < 1e-3

    # mean/std over splits: a mixed set gives finite positive values
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(k), size=500)
    mean, std = inception_score(p, splits=10)
    assert 1.0 <= mean <= k and std >= 0.0


def test_frechet_distance_vs_scipy_direct():
    rng = np.random.default_rng(2)
    f1 = rng.normal(size=(500, 8)).astype(np.float64)
    f2 = (rng.normal(size=(500, 8)) * 1.5 + 0.3).astype(np.float64)
    m1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
    m2, s2 = f2.mean(0), np.cov(f2, rowvar=False)
    from scipy import linalg

    covmean = linalg.sqrtm(s1.dot(s2)).real
    expected = (
        ((m1 - m2) ** 2).sum() + np.trace(s1) + np.trace(s2)
        - 2 * np.trace(covmean)
    )
    ours_m1, ours_s1 = activation_statistics(jnp.asarray(f1, jnp.float32))
    ours_m2, ours_s2 = activation_statistics(jnp.asarray(f2, jnp.float32))
    got = frechet_distance(
        np.asarray(ours_m1), np.asarray(ours_s1),
        np.asarray(ours_m2), np.asarray(ours_s2),
    )
    assert abs(got - expected) < 0.05


def test_vendi_identical_rows_is_one():
    f = np.tile(np.random.default_rng(3).normal(size=(1, 8)), (16, 1))
    assert abs(float(vendi_score(jnp.asarray(f, jnp.float32))) - 1.0) < 1e-3


def test_vendi_orthogonal_rows_is_n():
    f = np.eye(8, dtype=np.float32)
    assert abs(float(vendi_score(jnp.asarray(f))) - 8.0) < 1e-3


def test_sliced_wasserstein_zero_for_identical():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(64, 10)).astype(np.float32)
    assert float(sliced_wasserstein(jnp.asarray(x), jnp.asarray(x))) < 1e-6


def test_sliced_wasserstein_detects_shift():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(256, 10)).astype(np.float32)
    y = x + 2.0
    d = float(sliced_wasserstein(jnp.asarray(x), jnp.asarray(y)))
    assert d > 0.5


# ---------------------------------------------------------------------------
# restoration metrics vs torch implementations


def test_psnr_matches_closed_form():
    rng = np.random.default_rng(6)
    a = rng.uniform(size=(4, 8, 8, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(size=a.shape) * 0.1, 0, 1).astype(np.float32)
    ours = float(psnr(jnp.asarray(b), jnp.asarray(a)))
    per_img = []
    for i in range(4):
        mse = np.mean((a[i] - b[i]) ** 2)
        per_img.append(10 * np.log10(1.0 / mse))
    assert abs(ours - np.mean(per_img)) < 1e-3


def test_ssim_matches_torch_ignite_style():
    """Compare against a direct torch implementation of gaussian-window SSIM
    with uniform averaging (ignite semantics used by the reference,
    utils.py:795-802)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    a = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(size=a.shape) * 0.05, 0, 1).astype(np.float32)

    def torch_ssim(x, y, k=11, sigma=1.5):
        coords = torch.arange(k, dtype=torch.float64) - (k - 1) / 2.0
        g = torch.exp(-(coords**2) / (2 * sigma**2))
        g /= g.sum()
        w = torch.outer(g, g)[None, None].repeat(3, 1, 1, 1)
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).double()
        yt = torch.from_numpy(np.transpose(y, (0, 3, 1, 2))).double()
        pad = (k - 1) // 2
        xt = F.pad(xt, (pad,) * 4, mode="reflect")
        yt = F.pad(yt, (pad,) * 4, mode="reflect")
        mu_x = F.conv2d(xt, w, groups=3)
        mu_y = F.conv2d(yt, w, groups=3)
        xx = F.conv2d(xt * xt, w, groups=3) - mu_x**2
        yy = F.conv2d(yt * yt, w, groups=3) - mu_y**2
        xy = F.conv2d(xt * yt, w, groups=3) - mu_x * mu_y
        c1, c2 = 0.01**2, 0.03**2
        s = ((2 * mu_x * mu_y + c1) * (2 * xy + c2)) / (
            (mu_x**2 + mu_y**2 + c1) * (xx + yy + c2)
        )
        return float(s.mean())

    ours = float(ssim(jnp.asarray(b), jnp.asarray(a)))
    ref = torch_ssim(b, a)
    assert abs(ours - ref) < 5e-3


def test_lpips_converter_and_distance_match_torch_replica(tmp_path):
    """Locks the lpips_convert key map (torchvision alexnet features.* +
    lpips lin{i}.model.1.weight) and the native LPIPS math against an
    executable torch replica of lpips.LPIPS(net='alex') — the exact
    architecture the reference scores with (utils.py:677-724): scaling
    layer, 5 relu feature taps (maxpool after taps 0 and 1), channel
    normalization, squared diff, nonnegative 1x1 heads, spatial average."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from pnpflow_tpu.metrics.lpips import lpips_distance
    from pnpflow_tpu.utils.lpips_convert import convert_from_state_dicts

    g = torch.Generator().manual_seed(0)
    layout = [  # (out_ch, in_ch, k, stride, pad) — torchvision alexnet
        (64, 3, 11, 4, 2),
        (192, 64, 5, 1, 2),
        (384, 192, 3, 1, 1),
        (256, 384, 3, 1, 1),
        (256, 256, 3, 1, 1),
    ]
    feat_idx = [0, 3, 6, 8, 10]  # Sequential indices in alexnet.features
    alexnet_sd, convs = {}, []
    for (o, i, k, s, p), fi in zip(layout, feat_idx):
        w = 0.1 * torch.randn((o, i, k, k), generator=g)
        b = 0.1 * torch.randn((o,), generator=g)
        alexnet_sd[f"features.{fi}.weight"] = w.numpy()
        alexnet_sd[f"features.{fi}.bias"] = b.numpy()
        convs.append((w, b, s, p))
    lpips_sd, lins = {}, []
    for i, (o, *_rest) in enumerate(layout):
        lw = torch.rand((1, o, 1, 1), generator=g)  # nonneg heads
        lpips_sd[f"lin{i}.model.1.weight"] = lw.numpy()
        lins.append(lw)

    out = tmp_path / "lpips_alex.npz"
    convert_from_state_dicts(alexnet_sd, lpips_sd, str(out))
    weights = dict(np.load(str(out)))

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_lpips(x, y):
        hx, hy = (x - shift) / scale, (y - shift) / scale
        total = torch.zeros(x.shape[0])
        for i, (w, b, s, p) in enumerate(convs):
            hx = F.relu(F.conv2d(hx, w, b, stride=s, padding=p))
            hy = F.relu(F.conv2d(hy, w, b, stride=s, padding=p))

            def unit(t):
                return t / (torch.sqrt((t**2).sum(1, keepdim=True)) + 1e-10)

            diff = (unit(hx) - unit(hy)) ** 2
            total = total + (diff * lins[i]).sum(1).mean((1, 2))
            if i in (0, 1):
                hx = F.max_pool2d(hx, 3, stride=2)
                hy = F.max_pool2d(hy, 3, stride=2)
        return total.mean()

    rng = np.random.default_rng(5)
    x = np.tanh(rng.normal(size=(2, 64, 64, 3)) * 0.5).astype(np.float32)
    y = np.clip(x + 0.1 * rng.normal(size=x.shape), -1, 1).astype(np.float32)

    expected = torch_lpips(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(np.transpose(y, (0, 3, 1, 2))),
    )
    got = lpips_distance(weights, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-4, atol=1e-5)


def test_compute_metric_chunked_dopri5_and_mesh_batch(tmp_path):
    """ComputeMetric protocol/scale invariants: test features are extracted
    chunk-by-chunk (never one n x dim² array), the sampling batch is a
    multiple of the device count (so the mesh shard path engages), and the
    default sampler is the reference's adaptive dopri5
    (train_flow_matching.py:131-150)."""
    from pnpflow_tpu.metrics.generative import ComputeMetric
    from pnpflow_tpu.solvers.base import ModelBundle
    from pnpflow_tpu.utils.config import CfgNode

    n_dev = len(jax.devices())
    seen_chunks = []

    # linear contracting field: x(1) = x0 / e under exact integration
    bundle = ModelBundle(
        apply=lambda p, x, t: -x, params={}, kind="ot"
    )
    args = CfgNode(
        dict(dataset="synthetic", model="ot", eval_split="test", seed=0,
             output_root=str(tmp_path) + "/", dim_image=8, num_channels=1)
    )

    rng = np.random.default_rng(0)
    batches = [
        (rng.normal(size=(10, 8, 8, 1)).astype(np.float32), np.zeros(10))
        for _ in range(3)
    ]
    cm = ComputeMetric({"test": batches}, bundle, args)

    orig_feature_fn = cm._feature_fn

    def spying_feature_fn():
        fn, outputs_fn, name = orig_feature_fn()

        def spy(x01):
            seen_chunks.append(int(x01.shape[0]))
            return fn(x01)

        return spy, outputs_fn, name

    cm._feature_fn = spying_feature_fn
    n = 24
    with pytest.warns(UserWarning, match="pixel features"):
        out = cm.compute_metrics(n)

    assert np.isfinite(out["fid"]) and np.isfinite(out["sw"])
    # every chunk bounded by the device-aligned batch; gen chunks aligned
    batch = max(n_dev, min((50 // n_dev) * n_dev,
                           ((n + n_dev - 1) // n_dev) * n_dev))
    assert max(seen_chunks) <= batch
    assert any(c == batch for c in seen_chunks)  # gen batches are aligned
    assert batch % n_dev == 0
    # dopri5 on dx/dt=-x from N(0,1): samples contract to std 1/e
    key = jax.random.PRNGKey(99)
    s = cm._sample_batch(key, batch, steps=100)
    assert abs(float(jnp.std(s)) - np.exp(-1.0)) < 0.05

    # metrics.txt written with the feature tag
    import os

    path = os.path.join(str(tmp_path), "results", "synthetic", "ot",
                        "metrics.txt")
    assert os.path.exists(path)
    assert "pixels_32" in open(path).read()


def test_compute_metric_resumes_from_chunk_cache(tmp_path):
    """Per-chunk feature persistence: a re-run after an interruption loads
    finished chunks from disk instead of re-sampling (the n=5000 dopri5
    protocol is hours of device time through the tunneled runtime — a
    dropped connection must not zero it out), reproduces the identical
    metric values, and stamps a resumed_chunks token into metrics.txt."""
    import os

    from pnpflow_tpu.metrics.generative import ComputeMetric
    from pnpflow_tpu.solvers.base import ModelBundle
    from pnpflow_tpu.utils.config import CfgNode

    bundle = ModelBundle(apply=lambda p, x, t: -x, params={}, kind="ot")
    args = CfgNode(
        dict(dataset="synthetic", model="ot", eval_split="test", seed=0,
             output_root=str(tmp_path) + "/", dim_image=8, num_channels=1)
    )
    rng = np.random.default_rng(0)
    batches = [
        (rng.normal(size=(16, 8, 8, 1)).astype(np.float32), np.zeros(16))
        for _ in range(2)
    ]
    cm = ComputeMetric({"test": batches}, bundle, args)

    sample_calls = []
    orig_sample = cm._sample_batch

    def spying_sample(key, batch, steps, sampler=None):
        sample_calls.append(batch)
        return orig_sample(key, batch, steps, sampler)

    cm._sample_batch = spying_sample
    n = 24
    with pytest.warns(UserWarning, match="pixel features"):
        out1 = cm.compute_metrics(n, steps=20, sampler="euler")
    calls_first = len(sample_calls)
    assert calls_first > 0

    # second run: every chunk comes from the cache, zero sampling calls,
    # identical metric values
    with pytest.warns(UserWarning, match="pixel features"):
        out2 = cm.compute_metrics(n, steps=20, sampler="euler")
    assert len(sample_calls) == calls_first
    assert out2["fid"] == pytest.approx(out1["fid"], rel=1e-6)
    assert out2["sw"] == pytest.approx(out1["sw"], rel=1e-6)

    mpath = os.path.join(str(tmp_path), "results", "synthetic", "ot",
                         "metrics.txt")
    lines = open(mpath).read().splitlines()
    assert "resumed_chunks" not in lines[0]
    assert "resumed_chunks {}/{}".format(calls_first, calls_first) in lines[1]

    # partial resume: drop one chunk file -> exactly one fresh sample call
    cache_root = os.path.join(str(tmp_path), "results", "synthetic", "ot",
                              "metric_cache")
    sub = [d for d in os.listdir(cache_root) if d.startswith("s20_")][0]
    victim = sorted(os.listdir(os.path.join(cache_root, sub)))[0]
    os.remove(os.path.join(cache_root, sub, victim))
    with pytest.warns(UserWarning, match="pixel features"):
        out3 = cm.compute_metrics(n, steps=20, sampler="euler")
    assert len(sample_calls) == calls_first + 1
    assert out3["fid"] == pytest.approx(out1["fid"], rel=1e-6)

    # a different protocol (steps) must not hit the same cache
    with pytest.warns(UserWarning, match="pixel features"):
        cm.compute_metrics(n, steps=10, sampler="euler")
    assert len(sample_calls) > calls_first + 1


def test_compute_metric_replica_invalidated_on_param_swap(tmp_path):
    """A bundle whose params object is swapped after the first sample must
    not keep sampling with the stale replicated copy (round-3 VERDICT
    Weak #4)."""
    from pnpflow_tpu.metrics.generative import ComputeMetric
    from pnpflow_tpu.solvers.base import ModelBundle
    from pnpflow_tpu.utils.config import CfgNode

    bundle = ModelBundle(
        apply=lambda p, x, t: -x * p["scale"], params={"scale": jnp.float32(1.0)}
    )
    args = CfgNode(
        dict(dataset="synthetic", model="ot", eval_split="test", seed=0,
             output_root=str(tmp_path) + "/", dim_image=8, num_channels=1)
    )
    cm = ComputeMetric({"test": []}, bundle, args)
    if cm.mesh is None:
        pytest.skip("needs a multi-device mesh")

    key = jax.random.PRNGKey(0)
    s1 = cm._sample_batch(key, 8, steps=20, sampler="euler")
    replica1 = cm._params_r

    # same params object -> replica reused (no re-replication per batch)
    cm._sample_batch(key, 8, steps=20, sampler="euler")
    assert cm._params_r is replica1

    # swapped params -> replica rebuilt and the samples actually change
    cm.bundle = ModelBundle(
        apply=bundle.apply, params={"scale": jnp.float32(3.0)}
    )
    s2 = cm._sample_batch(key, 8, steps=20, sampler="euler")
    assert cm._params_r is not replica1
    # dx/dt = -scale*x, 20 Euler steps from the same x0: contraction
    # (1 - scale/20)^20, so the std ratio has a closed form
    want = (1 - 1 / 20) ** 20 / (1 - 3 / 20) ** 20
    got = float(jnp.std(s1)) / float(jnp.std(s2))
    assert abs(got - want) < 0.05 * want, (got, want)
