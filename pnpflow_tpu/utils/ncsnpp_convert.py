"""Torch -> Flax converter for NCSN++ ('rectified') checkpoints.

The published RectifiedFlow checkpoints store the score net as
``all_modules.{i}.<param>`` (reference ncsnpp.py:230, torch ModuleList).
Our Flax NCSN++ names its submodules ``m{i}`` in the identical construction
order (models/ncsnpp.py), so conversion is a structural walk: for every leaf
in the Flax param tree, translate the path to the torch key and transpose:

  flax  conv  kernel (kh, kw, I, O)   <- torch conv   weight (O, I, kh, kw)
  flax  dense kernel (I, O)           <- torch linear weight (O, I)
  flax  GroupNorm scale               <- torch GroupNorm weight
  flax  NIN W / b                     <- torch NIN W / b  (same layout)
  flax  Upsample/Downsample Conv2d_0_weight (kh, kw, I, O)
                                      <- torch Conv2d_0 weight (O, I, kh, kw)

The vendored checkpoints are a dict {optimizer, model, ema, step}
(image_generation/utils.py:7-23); pass ``state['model']`` (or the EMA shadow
via ema state) as ``sd``.
"""

from __future__ import annotations

import numpy as np


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _translate_leaf(flax_path, flax_leaf):
    """Map a flax (path..., leaf) to the torch suffix + transform."""
    leaf = flax_path[-1]
    ndim = np.ndim(flax_leaf)
    if leaf == "kernel":
        if ndim == 4:
            return "weight", lambda w: np.transpose(w, (2, 3, 1, 0))
        return "weight", lambda w: np.transpose(w, (1, 0))
    if leaf == "scale":
        return "weight", lambda w: w
    if leaf == "bias":
        return "bias", lambda w: w
    if leaf == "Conv2d_0_weight":
        return "Conv2d_0.weight", lambda w: np.transpose(w, (2, 3, 1, 0))
    if leaf == "Conv2d_0_bias":
        return "Conv2d_0.bias", lambda w: w
    if leaf in ("W", "b"):
        return leaf, lambda w: w
    raise KeyError("Unknown flax leaf: {}".format(flax_path))


def convert_ncsnpp_state_dict(sd, flax_params):
    """Fill a template flax param tree (``module.init(...)['params']``) from
    a torch NCSN++ state dict.  Returns {'params': tree}; raises on missing
    or shape-mismatched keys."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def walk(node, path):
        out = {}
        for name, child in node.items():
            p = path + (name,)
            if isinstance(child, dict):
                out[name] = walk(child, p)
            else:
                suffix, tf = _translate_leaf(p, child)
                # path: ('m3',) or ('m4', 'GroupNorm_0', 'scale')
                torch_key = "all_modules." + p[0][1:]
                mid = p[1:-1]
                if mid:
                    torch_key += "." + ".".join(mid)
                # inverse transform: torch tensor -> flax layout
                tkey = torch_key + "." + suffix
                if tkey not in sd:
                    raise KeyError("Missing torch key: {}".format(tkey))
                w = tf(_to_numpy(sd[tkey]))
                if w.shape != np.shape(child):
                    raise ValueError(
                        "Shape mismatch at {}: torch {} vs flax {}".format(
                            tkey, w.shape, np.shape(child)
                        )
                    )
                out[name] = w
        return out

    # invert: _translate_leaf returns flax->torch name + flax->? transform.
    # We need torch->flax layout transforms, which are the same transposes
    # (transpose (2,3,1,0) maps OIHW->HWIO; (1,0) maps (O,I)->(I,O)).
    return {"params": walk(flax_params, ())}


def main(argv=None):
    """CLI: ``python -m pnpflow_tpu.utils.ncsnpp_convert IN.pth OUT.msgpack
    --image-size 256``

    Converts a published RectifiedFlow NCSN++ checkpoint — the
    {optimizer, model, ema, step} dict of image_generation/utils.py:7-23 —
    to native msgpack.  ``--ema`` converts the EMA shadow params instead of
    the raw model weights.
    """
    import argparse
    import os

    import jax
    import jax.numpy as jnp
    import torch
    from flax import serialization

    from pnpflow_tpu.models.ncsnpp import NCSNpp

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("pth_path", help="RectifiedFlow torch checkpoint (.pth)")
    p.add_argument("out", help="output msgpack path")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--num-channels", type=int, default=3)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument(
        "--ch-mult", type=int, nargs="+", default=(1, 1, 2, 2, 2, 2, 2)
    )
    p.add_argument("--num-res-blocks", type=int, default=2)
    p.add_argument("--attn-resolutions", type=int, nargs="+", default=(16,))
    p.add_argument(
        "--ema", action="store_true",
        help="convert the EMA shadow parameters instead of the live weights",
    )
    ns = p.parse_args(argv)

    state = torch.load(ns.pth_path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        sd = state["model"]
        if ns.ema and state.get("ema") is None:
            raise SystemExit(
                "--ema requested but the checkpoint's ema slot is empty"
            )
        if ns.ema and "ema" in state:
            # ema state: {'decay', 'num_updates', 'shadow_params'} where
            # shadow_params lists requires_grad parameters in
            # model.parameters() order (image_generation/models/ema.py:28-30)
            # — i.e. the state-dict key order minus buffers ('sigmas',
            # ncsnpp.py:42) and the frozen Fourier projection W
            # (layerspp.py:36, requires_grad=False).
            def in_shadow(key):
                k = key.replace("module.", "", 1)
                return k != "sigmas" and k != "all_modules.0.W"

            names = [k for k in sd.keys() if in_shadow(k)]
            shadow = state["ema"]["shadow_params"]
            assert len(names) == len(shadow), (len(names), len(shadow))
            sd = dict(sd)
            sd.update(dict(zip(names, shadow)))
    else:
        sd = state

    model = NCSNpp(
        image_size=ns.image_size, num_channels=ns.num_channels, nf=ns.nf,
        ch_mult=tuple(ns.ch_mult), num_res_blocks=ns.num_res_blocks,
        attn_resolutions=tuple(ns.attn_resolutions),
    )
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, ns.image_size, ns.image_size, ns.num_channels)),
        jnp.full((1,), 500.0),
    )["params"]
    params = convert_ncsnpp_state_dict(sd, template)
    os.makedirs(os.path.dirname(ns.out) or ".", exist_ok=True)
    with open(ns.out, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(v.size for v in jax.tree_util.tree_leaves(params))
    print("wrote {} ({} parameters)".format(ns.out, n))


if __name__ == "__main__":
    main()
