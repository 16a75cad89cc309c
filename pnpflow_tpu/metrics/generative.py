"""Generative metrics: FID, Vendi score, sliced Wasserstein.

The reference computes FID only (pnpflow/fid_score.py:21-197,
compute_metric.py:17-45) despite claiming Vendi + sliced-Wasserstein in its
README/config (README.md:68, main_config.yaml:16) — we implement all three
(a recorded deliberate improvement, SURVEY.md §7).

TPU-native design: activation statistics (mean/cov), similarity spectra and
projections run on-device; only the matrix square root of the FID formula
runs on host (scipy.linalg.sqrtm, same as the reference fid_score.py:74-128).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# FID


def activation_statistics(features: jnp.ndarray):
    """(mu, sigma) of (N, D) activation features (fid_score.py:131-156)."""
    mu = jnp.mean(features, axis=0)
    centered = features - mu
    sigma = centered.T @ centered / (features.shape[0] - 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance with the reference's sqrtm stabilization
    (fid_score.py:74-128): on singular product, retry with eps*I offset;
    strip small imaginary parts."""
    from scipy import linalg

    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError("Imaginary component {}".format(m))
        covmean = covmean.real
    return float(
        diff.dot(diff)
        + np.trace(sigma1)
        + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


def fid_from_features(feat1, feat2) -> float:
    m1, s1 = activation_statistics(jnp.asarray(feat1))
    m2, s2 = activation_statistics(jnp.asarray(feat2))
    return frechet_distance(
        np.asarray(m1), np.asarray(s1), np.asarray(m2), np.asarray(s2)
    )


# ---------------------------------------------------------------------------
# Vendi score (Friedman & Dieng 2022): exp of the von Neumann entropy of
# K/n, K the kernel (cosine similarity) matrix of normalized features.


@jax.jit
def vendi_score(features: jnp.ndarray) -> jnp.ndarray:
    x = features / jnp.maximum(
        jnp.linalg.norm(features, axis=1, keepdims=True), 1e-12
    )
    n = x.shape[0]
    k = x @ x.T / n
    eig = jnp.linalg.eigvalsh(k)
    eig = jnp.clip(eig, 0.0, None)
    ent = -jnp.sum(jnp.where(eig > 1e-12, eig * jnp.log(eig), 0.0))
    return jnp.exp(ent)


# ---------------------------------------------------------------------------
# Sliced Wasserstein distance (SW2) between two point clouds: random 1-D
# projections, sorted-quantile L2.


def sliced_wasserstein(x, y, key=None, n_projections: int = 128):
    x = jnp.asarray(x).reshape(x.shape[0], -1)
    y = jnp.asarray(y).reshape(y.shape[0], -1)
    key = jax.random.PRNGKey(0) if key is None else key
    d = x.shape[1]
    proj = jax.random.normal(key, (d, n_projections), jnp.float32)
    proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=0, keepdims=True), 1e-12)
    px = jnp.sort(x @ proj, axis=0)
    py = jnp.sort(y @ proj, axis=0)
    n = min(px.shape[0], py.shape[0])
    # equal-size quantile comparison (subsample the longer cloud's quantiles)
    if px.shape[0] != n:
        idx = jnp.linspace(0, px.shape[0] - 1, n).astype(jnp.int32)
        px = px[idx]
    if py.shape[0] != n:
        idx = jnp.linspace(0, py.shape[0] - 1, n).astype(jnp.int32)
        py = py[idx]
    return jnp.sqrt(jnp.mean((px - py) ** 2))


# ---------------------------------------------------------------------------
# ComputeMetric facade (reference compute_metric.py:17-45)


class ComputeMetric:
    """FID (+ Vendi, SW) of generated samples vs the test set.

    Mirrors the reference protocol: Inception-2048 statistics of n test
    images vs n generated images sampled in batches of 50 via the flow ODE
    (compute_metric.py:20-45).  Falls back to raw-pixel features with a
    warning when Inception weights are unavailable (zero-egress).
    """

    def __init__(self, data_loaders, bundle, args):
        self.loaders = data_loaders
        self.bundle = bundle
        self.args = args

    def _feature_fn(self):
        from pnpflow_tpu.models.inception import get_inception_feature_fn

        fn = get_inception_feature_fn(self.args)
        if fn is not None:
            return fn, "inception_2048"
        import warnings

        warnings.warn(
            "Inception FID weights unavailable — falling back to "
            "32x32-downsampled pixel features for relative comparison."
        )

        def pixel_features(x01):
            b = x01.shape[0]
            small = jax.image.resize(
                x01, (b, 32, 32, x01.shape[-1]), method="bilinear"
            )
            return small.reshape(b, -1)

        return pixel_features, "pixels_32"

    def compute_metrics(self, n: int, steps: int = 100):
        args = self.args
        feature_fn, feat_name = self._feature_fn()

        # test-set features ([-1,1] -> [0,1])
        xs = []
        count = 0
        for x, _ in self.loaders[args.eval_split]:
            xs.append(np.asarray(x, np.float32))
            count += len(x)
            if count >= n:
                break
        test = jnp.asarray(np.concatenate(xs, axis=0)[:n])
        test01 = (test + 1.0) / 2.0
        feat_test = feature_fn(test01)

        # generated features via Euler flow sampling in batches of 50
        from pnpflow_tpu.training.flow_matching import euler_sample

        gen_feats = []
        gen_sw = []
        key = jax.random.PRNGKey(int(getattr(args, "seed", 0) or 0))
        batch = 50
        dim, c = args.dim_image, args.num_channels
        # ceil-divide so any n >= 1 works; trim the overshoot below
        for i in range((n + batch - 1) // batch):
            key, sub = jax.random.split(key)
            samples = euler_sample(
                self.bundle.apply, self.bundle.params, sub,
                (batch, dim, dim, c), steps=steps,
            )
            s01 = jnp.clip((samples + 1.0) / 2.0, 0.0, 1.0)
            gen_feats.append(feature_fn(s01))
            gen_sw.append(np.asarray(s01))
        feat_gen = jnp.concatenate(gen_feats, axis=0)[:n]

        fid = fid_from_features(feat_test, feat_gen)
        vendi = float(vendi_score(feat_gen[: min(2048, feat_gen.shape[0])]))
        sw = float(
            sliced_wasserstein(
                jnp.asarray(np.concatenate(gen_sw, axis=0)[:n]),
                test01,
                key=jax.random.PRNGKey(0),
            )
        )

        path = os.path.join(
            args.output_root, "results", args.dataset, args.model
        )
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "metrics.txt"), "a") as f:
            f.write(
                "n {} features {} FID {} Vendi {} SW {}\n".format(
                    n, feat_name, fid, vendi, sw
                )
            )
        return {"fid": fid, "vendi": vendi, "sw": sw}
