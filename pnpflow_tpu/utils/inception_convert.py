"""One-off converter: pytorch-fid InceptionV3 weights -> inception_fid.npz.

The reference downloads the ``pt_inception-2015-12-05`` checkpoint
(pnpflow/models.py:501).  Run this where that file is available:

    python -m pnpflow_tpu.utils.inception_convert pt_inception.pth

Output: flat npz with ``block/.../leaf`` keys that
``models/inception.load_inception_params`` re-nests.
"""

from __future__ import annotations

import sys

import numpy as np

# our block name -> torch module prefix
_TOP = {
    "c1": "Conv2d_1a_3x3", "c2": "Conv2d_2a_3x3", "c3": "Conv2d_2b_3x3",
    "c4": "Conv2d_3b_1x1", "c5": "Conv2d_4a_3x3",
    "a1": "Mixed_5b", "a2": "Mixed_5c", "a3": "Mixed_5d",
    "b": "Mixed_6a",
    "c_1": "Mixed_6b", "c_2": "Mixed_6c", "c_3": "Mixed_6d", "c_4": "Mixed_6e",
    "d": "Mixed_7a",
    "e1": "Mixed_7b", "e2": "Mixed_7c",
}

# our sub-conv name -> torch branch name, per block family
_SUBS = {
    "a": {
        "b1x1": "branch1x1", "b5_1": "branch5x5_1", "b5_2": "branch5x5_2",
        "b3_1": "branch3x3dbl_1", "b3_2": "branch3x3dbl_2",
        "b3_3": "branch3x3dbl_3", "bpool": "branch_pool",
    },
    "b": {
        "b3": "branch3x3", "bd_1": "branch3x3dbl_1",
        "bd_2": "branch3x3dbl_2", "bd_3": "branch3x3dbl_3",
    },
    "c": {
        "b1x1": "branch1x1", "b7_1": "branch7x7_1", "b7_2": "branch7x7_2",
        "b7_3": "branch7x7_3", "bd_1": "branch7x7dbl_1",
        "bd_2": "branch7x7dbl_2", "bd_3": "branch7x7dbl_3",
        "bd_4": "branch7x7dbl_4", "bd_5": "branch7x7dbl_5",
        "bpool": "branch_pool",
    },
    "d": {
        "b3_1": "branch3x3_1", "b3_2": "branch3x3_2",
        "b7_1": "branch7x7x3_1", "b7_2": "branch7x7x3_2",
        "b7_3": "branch7x7x3_3", "b7_4": "branch7x7x3_4",
    },
    "e": {
        "b1x1": "branch1x1", "b3_1": "branch3x3_1", "b3_2a": "branch3x3_2a",
        "b3_2b": "branch3x3_2b", "bd_1": "branch3x3dbl_1",
        "bd_2": "branch3x3dbl_2", "bd_3a": "branch3x3dbl_3a",
        "bd_3b": "branch3x3dbl_3b", "bpool": "branch_pool",
    },
}


def _family(block: str) -> str | None:
    if block.startswith("a"):
        return "a"
    if block == "b":
        return "b"
    if block.startswith("c_"):
        return "c"
    if block == "d":
        return "d"
    if block.startswith("e"):
        return "e"
    return None  # stem conv


def _conv_bn(sd, prefix):
    w = np.asarray(sd[prefix + ".conv.weight"], np.float32)
    return {
        "w": np.transpose(w, (2, 3, 1, 0)),
        "gamma": np.asarray(sd[prefix + ".bn.weight"], np.float32),
        "beta": np.asarray(sd[prefix + ".bn.bias"], np.float32),
        "mean": np.asarray(sd[prefix + ".bn.running_mean"], np.float32),
        "var": np.asarray(sd[prefix + ".bn.running_var"], np.float32),
    }


def convert_inception_state_dict(sd) -> dict:
    """Return flat {block/sub/leaf: array} ready for np.savez."""
    flat = {}
    for block, torch_top in _TOP.items():
        fam = _family(block)
        if fam is None:
            for leaf, val in _conv_bn(sd, torch_top).items():
                flat["{}/{}".format(block, leaf)] = val
        else:
            for sub, torch_branch in _SUBS[fam].items():
                prefix = "{}.{}".format(torch_top, torch_branch)
                for leaf, val in _conv_bn(sd, prefix).items():
                    flat["{}/{}/{}".format(block, sub, leaf)] = val
    # 1008-way classifier head (present in pt_inception-2015-12-05;
    # powers Inception Score — models/inception.inception_logits)
    if "fc.weight" in sd:
        flat["fc/w"] = np.transpose(
            np.asarray(sd["fc.weight"], np.float32), (1, 0)
        )
        flat["fc/b"] = np.asarray(sd["fc.bias"], np.float32)
    return flat


def main(path, out="model/inception_fid.npz"):
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    np.savez(out, **convert_inception_state_dict(sd))
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
