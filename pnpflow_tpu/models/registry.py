"""Model factory + checkpoint resolution (reference utils.py:170-240).

``define_model(args)`` builds the Flax module for ``args.model``:
  ot / indep / gradient_step -> VelocityUNet (utils.py:171-180)
  rectified                  -> NCSN++       (utils.py:186-203)
  diffusion                  -> DiffUNet     (utils.py:182-184)

``build_model_bundle(args)`` additionally resolves parameters, searching (in
order) a native msgpack checkpoint, then the published torch ``.pt`` (which
is converted on the fly), then falling back to a seeded random init with a
warning so smoke runs work without weights.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from pnpflow_tpu.models.unet import VelocityUNet
from pnpflow_tpu.solvers.base import ModelBundle


def define_model(args, dtype=jnp.float32):
    if args.model in ("ot", "indep", "gradient_step"):
        if args.dim_image % 8 == 0:
            ch_mult, attn = (1, 2, 4, 8), (16, 8)
        else:
            # e.g. MNIST 28x28 (28 % 8 != 0): drop the deepest level
            ch_mult, attn = (1, 2, 4), (14, 7)
        return VelocityUNet(
            input_channels=args.num_channels,
            input_height=args.dim_image,
            ch=32,
            ch_mult=ch_mult,
            num_res_blocks=6,
            attn_resolutions=attn,
            dtype=dtype,
            # bf16 norms with bf16 compute: the measured-fastest headline
            # configuration (BASELINE.md batch sweep — bf16-norm 11.94 vs
            # fp32-norm 10.92 img/s); fp32 compute keeps fp32 norms.
            norm_dtype=dtype if dtype == jnp.bfloat16 else None,
        )
    if args.model == "rectified":
        from pnpflow_tpu.models.ncsnpp import make_ncsnpp

        return make_ncsnpp(args, dtype=dtype)
    if args.model == "diffusion":
        from pnpflow_tpu.models.diffunet import make_diffunet

        return make_diffunet(args, dtype=dtype)
    raise ValueError("Unknown model: {}".format(args.model))


def init_params(module, args, seed: int = 0):
    """Random init on the HOST cpu backend — initialization is a one-off
    trace of the full forward; compiling it on a remote TPU wastes minutes.
    The params transfer to the accelerator on first use."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    x = np.zeros(
        (1, args.dim_image, args.dim_image, args.num_channels), np.float32
    )
    t = np.zeros((1,), np.float32)
    if cpu is not None:
        with jax.default_device(cpu):
            return module.init(jax.random.PRNGKey(seed), x, t)
    return module.init(jax.random.PRNGKey(seed), x, t)


# -- architecture fingerprint -------------------------------------------------
#
# ``flax.serialization.from_bytes`` restores structurally: a fully
# convolutional U-Net trained at 64² has byte-identical parameter shapes to
# one built at 16², so a checkpoint from any resolution would silently load
# into a model of any other.  Every checkpoint this framework writes is
# therefore wrapped in an envelope carrying the architecture fingerprint
# below, verified on load (reference contract: utils.py:208-240 keys
# checkpoints by dataset/model only and has the same hazard).

_ARCH_KEY = "__pnpflow_arch__"


def model_fingerprint(module, args) -> dict:
    """Identity of the (model kind, geometry, architecture) a checkpoint
    was produced for: {model, dim_image, num_channels} plus any
    architecture fields the module exposes (ch/ch_mult/num_res_blocks/
    attn_resolutions for VelocityUNet, nf etc. for NCSN++)."""
    fp = {
        "model": str(args.model),
        "dim_image": int(args.dim_image),
        "num_channels": int(args.num_channels),
    }
    for field in ("ch", "nf", "ch_mult", "num_res_blocks",
                  "attn_resolutions"):
        if hasattr(module, field):
            v = getattr(module, field)
            fp[field] = (
                [int(e) for e in v] if isinstance(v, (tuple, list))
                else int(v)
            )
    return fp


def _normalize_fp(fp: dict) -> dict:
    return {
        k: ([int(e) for e in v] if isinstance(v, (tuple, list)) else v)
        for k, v in fp.items()
    }


def save_params_file(params, path, fingerprint: dict | None = None):
    """Write a params checkpoint; with ``fingerprint`` the file is an
    envelope ``{_ARCH_KEY: fp, 'params': state_dict}`` rejected on load by
    any model whose fingerprint differs.  Without it, the legacy raw
    format is written (converter CLIs for published torch checkpoints,
    whose geometry the CLI cannot know)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    state = serialization.to_state_dict(jax.device_get(params))
    payload = (
        {_ARCH_KEY: _normalize_fp(fingerprint), "params": state}
        if fingerprint is not None else state
    )
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def restore_params_bytes(template, blob):
    """-> (params, fingerprint_or_None).  Accepts both envelope and legacy
    raw formats; raises ValueError on structural mismatch."""
    raw = serialization.msgpack_restore(blob)
    if isinstance(raw, dict) and _ARCH_KEY in raw:
        return (
            serialization.from_state_dict(template, raw["params"]),
            raw[_ARCH_KEY],
        )
    return serialization.from_state_dict(template, raw), None


def checkpoint_paths(args):
    base = os.path.join(
        args.output_root, "model", args.dataset, args.model
    )
    return {
        "msgpack": os.path.join(base, "model_final.msgpack"),
        "torch": os.path.join(base, "model_final.pt"),
    }


def load_params(module, args, require: bool = False):
    """Resolve parameters: native msgpack > torch .pt > random init."""
    paths = checkpoint_paths(args)
    if os.path.exists(paths["msgpack"]):
        template = init_params(module, args)
        with open(paths["msgpack"], "rb") as f:
            blob = f.read()
        try:
            params, stored_fp = restore_params_bytes(template, blob)
        except ValueError as exc:
            # checkpoint belongs to a different architecture (e.g. a
            # different channel count) — fail loudly when weights are
            # required, fall through to random init otherwise
            if require:
                raise
            warnings.warn(
                "Checkpoint at {} does not match the current model "
                "configuration ({}) — ignoring it.".format(
                    paths["msgpack"], exc
                )
            )
            params = None
        if params is not None:
            expected_fp = _normalize_fp(model_fingerprint(module, args))
            if stored_fp is not None and _normalize_fp(stored_fp) != expected_fp:
                msg = (
                    "Checkpoint at {} was saved for a different "
                    "architecture: stored {} vs expected {}.".format(
                        paths["msgpack"], stored_fp, expected_fp
                    )
                )
                if require:
                    raise ValueError(msg)
                warnings.warn(msg + " Ignoring it.")
            else:
                return params
    if os.path.exists(paths["torch"]):
        from pnpflow_tpu.utils.torch_convert import (
            convert_unet_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(paths["torch"])
        return convert_unet_state_dict(sd)
    if require:
        raise FileNotFoundError(
            "No checkpoint at {} or {}".format(paths["msgpack"], paths["torch"])
        )
    warnings.warn(
        "No checkpoint found for {}/{} — using random init".format(
            args.dataset, args.model
        )
    )
    return init_params(module, args, seed=int(getattr(args, "seed", 0) or 0))


def save_params(params, path, fingerprint: dict | None = None):
    save_params_file(params, path, fingerprint=fingerprint)


def build_model_bundle(args, dtype=jnp.float32, params=None,
                       require_ckpt: bool = False) -> ModelBundle:
    module = define_model(args, dtype=dtype)
    if params is None:
        params = load_params(module, args, require=require_ckpt)

    kind = args.model
    if kind == "rectified":
        # t is scaled by 999 before hitting NCSN++ (reference
        # pnp_flow.py:23-27, models/utils.py:106-135), floored at the
        # reference's own RF integration epsilon (sde_lib.py:45,
        # sampling.py:44: "only integrated to eps for numerical
        # stability", eps=1e-3): the fourier embedding takes log(t·999)
        # and scale_by_sigma divides by t·999, so t=0 — which pnp_flow's
        # first iteration feeds (t1 = delta·0, pnp_flow.py:107-108) — is
        # NaN in the torch reference too (0/0 through the zero-init
        # head; verified against the mounted reference).  Flooring only
        # changes the t=0 point, where the reference has no finite value.
        def apply(p, x, t):
            return module.apply(p, x, jnp.maximum(t, 1e-3) * 999.0)
    else:
        def apply(p, x, t):
            return module.apply(p, x, t)

    # ``--opts remat True``: rematerialize the model forward inside
    # differentiated solver programs (d_flow's LBFGS-through-the-flow,
    # ot_ode's model vjp, flow_priors' jvp) — trades one extra forward for
    # not storing activations, the HBM lever for 256² NCSN++ backprop.
    # Forward-only solvers (pnp_flow) are unaffected by jax.checkpoint.
    if bool(getattr(args, "remat", False)):
        apply = jax.checkpoint(apply)

    # Commit the weights to the default (accelerator) device ONCE — and as
    # a device-CREATED pytree, not a host-committed one: on the remoted TPU
    # backend, device_put output passed as a jit argument is re-streamed
    # host->device on EVERY dispatch (~0.9 s/call for the 256² NCSN++'s
    # 250 MB params; ~33 ms once laundered — scripts/probe_call_overhead.py).
    dev = jax.devices()[0]
    if dev.platform != "cpu":
        from pnpflow_tpu.utils.jax_setup import commit_tree

        params = commit_tree(params, dev)

    return ModelBundle(apply=apply, params=params, kind=kind)
