"""One-off converter: published PyTorch checkpoints -> Flax params.

The reference ships trained `.pt` state dicts of its torch U-Net
(pnpflow/models.py:302-495, saved at train_flow_matching.py:117-120,249).
This maps them onto our NHWC Flax `VelocityUNet` so restoration hits PSNR
parity without retraining:

  torch Conv2d  weight (O, I, kH, kW) -> flax Conv kernel (kH, kW, I, O)
  torch Linear  weight (out, in)      -> flax Dense kernel (in, out)
  torch GroupNorm weight/bias         -> flax GroupNorm scale/bias

Key-name mapping follows the reference ModuleDict layout
(models.py:350-433): ``down_modules.{L}.{L}a_{B}a_block``,
``{L}a_{B}b_attn``, ``{L}b_downsample``, ``mid_modules.{0,1,2}``,
``up_modules.{idx}.{L}a_{B}a_block`` (idx = num_levels-1-L),
``{L}b_upsample.up_conv``, ``begin_conv``, ``end_conv.{0,2}``,
``temb_net.main.{0,2}``.
"""

from __future__ import annotations

import re

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def _dense_w(w):
    return np.transpose(np.asarray(w, dtype=np.float32), (1, 0))


def _f32(w):
    return np.asarray(w, dtype=np.float32)


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


_RES_SUBS = {
    "norm1.weight": ("norm1", "scale", _f32),
    "norm1.bias": ("norm1", "bias", _f32),
    "conv1.weight": ("conv1", "kernel", _conv_w),
    "conv1.bias": ("conv1", "bias", _f32),
    "temb_proj.weight": ("temb_proj", "kernel", _dense_w),
    "temb_proj.bias": ("temb_proj", "bias", _f32),
    "norm2.weight": ("norm2", "scale", _f32),
    "norm2.bias": ("norm2", "bias", _f32),
    "conv2.weight": ("conv2", "kernel", _conv_w),
    "conv2.bias": ("conv2", "bias", _f32),
    "shortcut.weight": ("shortcut", "kernel", _conv_w),
    "shortcut.bias": ("shortcut", "bias", _f32),
}

_ATTN_SUBS = {
    "norm.weight": ("norm", "scale", _f32),
    "norm.bias": ("norm", "bias", _f32),
    "attn_q.weight": ("attn_q", "kernel", _conv_w),
    "attn_q.bias": ("attn_q", "bias", _f32),
    "attn_k.weight": ("attn_k", "kernel", _conv_w),
    "attn_k.bias": ("attn_k", "bias", _f32),
    "attn_v.weight": ("attn_v", "kernel", _conv_w),
    "attn_v.bias": ("attn_v", "bias", _f32),
    "proj_out.weight": ("proj_out", "kernel", _conv_w),
    "proj_out.bias": ("proj_out", "bias", _f32),
}


def convert_unet_state_dict(state_dict, num_resolutions: int = 4):
    """Convert a reference torch U-Net ``state_dict`` (tensors or ndarrays)
    into a flax param tree for :class:`VelocityUNet`.

    Raises on any unrecognized key so silent weight drops are impossible.
    """
    params: dict = {}

    def emit(flax_module, sub_key, table, value):
        if sub_key not in table:
            raise KeyError(
                "unknown sub-parameter {!r} under {}".format(sub_key, flax_module)
            )
        leaf_mod, leaf_name, fn = table[sub_key]
        _set(params, (flax_module, leaf_mod, leaf_name), fn(value))

    for key, value in state_dict.items():
        value = getattr(value, "numpy", lambda: value)()

        if key.startswith("temb_net.main."):
            idx, leaf = key.split(".")[2], key.split(".")[3]
            name = {"0": "dense_0", "2": "dense_1"}[idx]
            fn = _dense_w if leaf == "weight" else _f32
            _set(
                params,
                ("temb_net", name, "kernel" if leaf == "weight" else "bias"),
                fn(value),
            )
        elif key.startswith("begin_conv."):
            leaf = key.split(".")[1]
            fn = _conv_w if leaf == "weight" else _f32
            _set(
                params,
                ("begin_conv", "kernel" if leaf == "weight" else "bias"),
                fn(value),
            )
        elif key.startswith("end_conv."):
            idx, leaf = key.split(".")[1], key.split(".")[2]
            if idx == "0":  # GroupNorm
                _set(
                    params,
                    ("end_norm", "scale" if leaf == "weight" else "bias"),
                    _f32(value),
                )
            else:  # final conv (Sequential index 2)
                fn = _conv_w if leaf == "weight" else _f32
                _set(
                    params,
                    ("end_conv", "kernel" if leaf == "weight" else "bias"),
                    fn(value),
                )
        elif key.startswith("mid_modules."):
            _, idx, rest = key.split(".", 2)
            if idx == "1":
                sub = rest
                emit("mid_attn", sub, _ATTN_SUBS, value)
            else:
                name = "mid_block_0" if idx == "0" else "mid_block_1"
                emit(name, rest, _RES_SUBS, value)
        elif key.startswith("down_modules.") or key.startswith("up_modules."):
            side = "down" if key.startswith("down_modules.") else "up"
            _, idx, mod_name, rest = key.split(".", 3)
            m = re.match(r"(\d+)a_(\d+)a_block$", mod_name)
            if m:
                level, block = m.group(1), m.group(2)
                emit(f"{side}_{level}_block_{block}", rest, _RES_SUBS, value)
                continue
            m = re.match(r"(\d+)a_(\d+)b_attn$", mod_name)
            if m:
                level, block = m.group(1), m.group(2)
                emit(f"{side}_{level}_attn_{block}", rest, _ATTN_SUBS, value)
                continue
            m = re.match(r"(\d+)b_downsample$", mod_name)
            if m:
                level, leaf = m.group(1), rest
                fn = _conv_w if leaf == "weight" else _f32
                _set(
                    params,
                    (
                        f"down_{level}_downsample",
                        "conv",
                        "kernel" if leaf == "weight" else "bias",
                    ),
                    fn(value),
                )
                continue
            m = re.match(r"(\d+)b_upsample$", mod_name)
            if m:
                level = m.group(1)
                # Sequential('up_nn', 'up_conv') — only up_conv has params
                _, leaf = rest.split(".")
                fn = _conv_w if leaf == "weight" else _f32
                _set(
                    params,
                    (
                        f"up_{level}_upsample",
                        "conv",
                        "kernel" if leaf == "weight" else "bias",
                    ),
                    fn(value),
                )
                continue
            raise KeyError("unrecognized module name: {}".format(key))
        else:
            raise KeyError("unrecognized checkpoint key: {}".format(key))

    return {"params": params}


def load_torch_checkpoint(path: str):
    """Load a torch .pt state dict as numpy arrays (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def main(argv=None):
    """CLI: ``python -m pnpflow_tpu.utils.torch_convert IN.pt [OUT.msgpack]``

    Converts a published reference U-Net checkpoint
    (train_flow_matching.py:117-120,249) to the native msgpack format that
    ``models.registry.load_params`` resolves first.
    """
    import argparse
    import os

    from flax import serialization

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("pt_path", help="reference torch .pt state dict")
    p.add_argument(
        "out", nargs="?", default=None,
        help="output path (default: <pt_path dir>/model_final.msgpack)",
    )
    ns = p.parse_args(argv)
    out = ns.out or os.path.join(
        os.path.dirname(ns.pt_path) or ".", "model_final.msgpack"
    )
    params = convert_unet_state_dict(load_torch_checkpoint(ns.pt_path))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(params))
    import jax

    n = sum(v.size for v in jax.tree_util.tree_leaves(params))
    print("wrote {} ({} parameters)".format(out, n))


if __name__ == "__main__":
    main()
