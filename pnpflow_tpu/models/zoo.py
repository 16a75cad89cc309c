"""Score-model zoo registry (reference image_generation/models/utils.py).

Mirrors the reference's ``register_model`` / ``get_model`` /
``create_model`` surface (utils.py:24-103) for the image-generation model
families — ``ddpm``, ``ncsn``, ``ncsnv2_64/128/256``, ``ncsnpp`` — with
Flax modules instead of torch classes.  ``create_model`` builds the module
from a config tree (``config.model.*`` / ``config.data.*`` keys, same
names as the reference's ml_collections configs); parallelism is the
caller's mesh sharding, not DataParallel (utils.py:102).

Also provides ``get_sigmas`` / ``get_ddpm_params`` (utils.py:52-88).
"""

from __future__ import annotations

import numpy as np

_MODELS = {}


def register_model(cls=None, *, name=None):
    """Decorator registry (reference utils.py:27-44)."""

    def _register(cls):
        local_name = cls.__name__ if name is None else name
        if local_name in _MODELS:
            raise ValueError(
                "Already registered model with name: {}".format(local_name)
            )
        _MODELS[local_name] = cls
        return cls

    return _register if cls is None else _register(cls)


def get_model(name):
    _ensure_populated()
    return _MODELS[name]


def geometric_sigmas(sigma_max: float, sigma_min: float, num_scales: int):
    """Geometric SMLD noise ladder (reference utils.py:52-62) — the single
    implementation; config- and scalar-keyed helpers both delegate here."""
    return np.exp(np.linspace(
        np.log(sigma_max), np.log(sigma_min), num_scales
    ))


def get_sigmas(config):
    """Config-keyed ladder with the reference's float64 dtype."""
    return geometric_sigmas(
        config.model.sigma_max, config.model.sigma_min,
        config.model.num_scales,
    )


def get_ddpm_params(config):
    """Beta/alpha schedules of the original DDPM (reference utils.py:65-88)."""
    num_diffusion_timesteps = 1000
    beta_start = config.model.beta_min / config.model.num_scales
    beta_end = config.model.beta_max / config.model.num_scales
    betas = np.linspace(beta_start, beta_end, num_diffusion_timesteps,
                        dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


_BUILTINS_REGISTERED = False


def _ensure_populated():
    """Lazy registration — avoids import cycles and keeps `import zoo`
    cheap.  Guarded by its own flag: user registrations via
    ``register_model`` must not suppress the built-ins."""
    global _BUILTINS_REGISTERED
    if _BUILTINS_REGISTERED:
        return
    _BUILTINS_REGISTERED = True
    from pnpflow_tpu.models import ddpm as _ddpm
    from pnpflow_tpu.models import ncsnv2 as _ncsnv2
    from pnpflow_tpu.models import ncsnpp as _ncsnpp

    _MODELS["ddpm"] = _ddpm.DDPM
    _MODELS["ncsn"] = _ncsnv2.NCSN
    _MODELS["ncsnv2_64"] = _ncsnv2.NCSNv2
    _MODELS["ncsnv2_128"] = _ncsnv2.NCSNv2_128
    _MODELS["ncsnv2_256"] = _ncsnv2.NCSNv2_256
    _MODELS["ncsnpp"] = _ncsnpp.NCSNpp


def create_model(config, dtype=None):
    """Build the Flax module named by ``config.model.name`` from the
    reference-shaped config tree (reference utils.py:91-103)."""
    import jax.numpy as jnp

    _ensure_populated()
    name = config.model.name
    m, d = config.model, config.data
    dtype = dtype or jnp.float32

    if name == "ddpm":
        return get_model(name)(
            nf=m.nf, ch_mult=tuple(m.ch_mult),
            num_res_blocks=m.num_res_blocks,
            attn_resolutions=tuple(m.attn_resolutions),
            dropout=m.dropout, resamp_with_conv=m.resamp_with_conv,
            conditional=m.conditional, image_size=d.image_size,
            channels=d.num_channels, centered=d.centered,
            scale_by_sigma=m.scale_by_sigma,
            nonlinearity=m.nonlinearity,
            sigmas=tuple(get_sigmas(config)), dtype=dtype,
        )
    if name == "ncsn":
        return get_model(name)(
            nf=m.nf, channels=d.num_channels, image_size=d.image_size,
            num_scales=m.num_scales, centered=d.centered,
            normalization=m.normalization, nonlinearity=m.nonlinearity,
        )
    if name in ("ncsnv2_64", "ncsnv2_128", "ncsnv2_256"):
        kwargs = dict(
            nf=m.nf, channels=d.num_channels, centered=d.centered,
            normalization=m.normalization, nonlinearity=m.nonlinearity,
            sigmas=tuple(get_sigmas(config)),
        )
        if name == "ncsnv2_64":
            kwargs["image_size"] = d.image_size
        return get_model(name)(**kwargs)
    if name == "ncsnpp":
        from pnpflow_tpu.models.ncsnpp import make_ncsnpp_from_config

        return make_ncsnpp_from_config(config, dtype=dtype)
    raise ValueError("Unknown model name: {}".format(name))
