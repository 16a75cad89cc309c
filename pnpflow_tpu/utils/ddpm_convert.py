"""torch→Flax converter for DDPM checkpoints (models/ddpm.py).

The reference DDPM stores every layer positionally in one
``nn.ModuleList`` (``all_modules.{idx}.*``, reference ddpm.py:55-106);
this converter replays the exact construction order to map each index to
the named Flax module, transposing conv kernels NCHW→HWIO and Dense
weights (out,in)→(in,out).  NIN tables (in,out) carry over unchanged.
"""

from __future__ import annotations

import numpy as np


def _conv(sd, prefix):
    return {
        "kernel": np.transpose(np.asarray(sd[prefix + ".weight"]),
                               (2, 3, 1, 0)),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _dense(sd, prefix):
    return {
        "kernel": np.transpose(np.asarray(sd[prefix + ".weight"])),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _gn(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _nin(sd, prefix):
    return {
        "W": np.asarray(sd[prefix + ".W"]),
        "b": np.asarray(sd[prefix + ".b"]),
    }


def _resblock(sd, prefix, has_temb=True):
    out = {
        "GroupNorm_0": _gn(sd, prefix + ".GroupNorm_0"),
        "Conv_0": _conv(sd, prefix + ".Conv_0"),
        "GroupNorm_1": _gn(sd, prefix + ".GroupNorm_1"),
        "Conv_1": _conv(sd, prefix + ".Conv_1"),
    }
    if has_temb and prefix + ".Dense_0.weight" in sd:
        out["Dense_0"] = _dense(sd, prefix + ".Dense_0")
    if prefix + ".NIN_0.W" in sd:
        out["NIN_0"] = _nin(sd, prefix + ".NIN_0")
    if prefix + ".Conv_2.weight" in sd:
        out["Conv_2"] = _conv(sd, prefix + ".Conv_2")
    return out


def _attn(sd, prefix):
    out = {"GroupNorm_0": _gn(sd, prefix + ".GroupNorm_0")}
    for i in range(4):
        out["NIN_{}".format(i)] = _nin(sd, prefix + ".NIN_{}".format(i))
    return out


def convert_ddpm_state_dict(sd, *, nf, ch_mult, num_res_blocks,
                            attn_resolutions, image_size,
                            conditional=True, resamp_with_conv=True):
    """Map ``all_modules.{i}`` positional params to the named Flax tree.

    The index walk mirrors reference ddpm.py:55-106 exactly.
    """
    num_resolutions = len(ch_mult)
    all_res = [image_size // (2 ** i) for i in range(num_resolutions)]
    params = {}
    idx = [0]

    def take():
        i = idx[0]
        idx[0] += 1
        return "all_modules.{}".format(i)

    if conditional:
        params["Dense_0"] = _dense(sd, take())
        params["Dense_1"] = _dense(sd, take())

    params["conv_in"] = _conv(sd, take())
    for i_level in range(num_resolutions):
        for i_block in range(num_res_blocks):
            params["down_{}_block_{}".format(i_level, i_block)] = \
                _resblock(sd, take())
            if all_res[i_level] in attn_resolutions:
                params["down_{}_attn_{}".format(i_level, i_block)] = \
                    _attn(sd, take())
        if i_level != num_resolutions - 1:
            mod = take()  # Downsample occupies an index even with no conv
            if resamp_with_conv:
                params["down_{}_downsample".format(i_level)] = {
                    "Conv_0": _conv(sd, mod + ".Conv_0"),
                }

    params["mid_block_0"] = _resblock(sd, take())
    params["mid_attn"] = _attn(sd, take())
    params["mid_block_1"] = _resblock(sd, take())

    for i_level in reversed(range(num_resolutions)):
        for i_block in range(num_res_blocks + 1):
            params["up_{}_block_{}".format(i_level, i_block)] = \
                _resblock(sd, take())
        if all_res[i_level] in attn_resolutions:
            params["up_{}_attn".format(i_level)] = _attn(sd, take())
        if i_level != 0:
            mod = take()
            if resamp_with_conv:
                params["up_{}_upsample".format(i_level)] = {
                    "Conv_0": _conv(sd, mod + ".Conv_0"),
                }

    params["norm_out"] = _gn(sd, take())
    params["conv_out"] = _conv(sd, take())
    return {"params": params}
