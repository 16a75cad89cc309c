"""One-off converter: torch ``lpips`` package weights -> lpips_alex.npz.

The reference scores LPIPS with ``lpips.LPIPS(net='alex')``
(pnpflow/utils.py:677-724).  Run this on a machine with the ``lpips``
package (or its checkpoint files) to produce the npz our native LPIPS
(metrics/lpips.py) loads:

    python -m pnpflow_tpu.utils.lpips_convert [out.npz]

Layout: conv{i}_w (kh, kw, in, out), conv{i}_b (out,), lin{i}_w (C,) — the
LPIPS linear heads are nonnegative 1x1 convs whose weight vector we store
densely.
"""

from __future__ import annotations

import sys

import numpy as np


def convert_from_lpips_module(out_path: str = "model/lpips_alex.npz"):
    import lpips as lpips_pkg  # torch package, only needed for conversion

    net = lpips_pkg.LPIPS(net="alex")
    weights = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    conv_idx = 0
    for m in convs:
        if m.__class__.__name__ == "Conv2d":
            w = m.weight.detach().cpu().numpy()
            weights[f"conv{conv_idx}_w"] = np.transpose(w, (2, 3, 1, 0))
            weights[f"conv{conv_idx}_b"] = m.bias.detach().cpu().numpy()
            conv_idx += 1
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().cpu().numpy()  # (1, C, 1, 1)
        weights[f"lin{i}_w"] = w.reshape(-1)
    np.savez(out_path, **weights)
    print("wrote", out_path, "({} conv layers)".format(conv_idx))


def convert_from_state_dicts(alexnet_sd, lpips_sd,
                             out_path: str = "model/lpips_alex.npz"):
    """Convert from raw state dicts (torchvision alexnet.features.* plus the
    lpips lin{i}.model.1.weight heads) without the lpips package."""
    weights = {}
    conv_keys = sorted(
        {k.rsplit(".", 1)[0] for k in alexnet_sd if k.startswith("features")
         and k.endswith(".weight")},
        key=lambda s: int(s.split(".")[1]),
    )
    for i, base in enumerate(conv_keys):
        w = np.asarray(alexnet_sd[base + ".weight"], np.float32)
        weights[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0))
        weights[f"conv{i}_b"] = np.asarray(
            alexnet_sd[base + ".bias"], np.float32
        )
    for i in range(5):
        key = "lin{}.model.1.weight".format(i)
        weights[f"lin{i}_w"] = np.asarray(
            lpips_sd[key], np.float32
        ).reshape(-1)
    np.savez(out_path, **weights)


if __name__ == "__main__":
    convert_from_lpips_module(
        sys.argv[1] if len(sys.argv) > 1 else "model/lpips_alex.npz"
    )
