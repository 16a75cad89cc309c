"""Config system with the same public surface as the reference CLI.

The reference (pnpflow/utils.py:37-167, main.py:29-56) uses a dict-subclass
``CfgNode`` with attribute access, a flattened-YAML loader (every top-level
section's keys are hoisted to the root), and a ``--opts key value ...``
override list whose values are coerced with ``ast.literal_eval`` and
type-checked against the existing value (tuple<->list casts allowed, unknown
keys silently added).  We keep that exact contract so the reference's
``scripts/*.sh`` run unchanged against our driver.
"""

from __future__ import annotations

import copy
import os
from ast import literal_eval
from typing import List

import yaml


class CfgNode(dict):
    """Dict-like config node with attribute-style access.

    Mirrors reference pnpflow/utils.py:37-86.
    """

    def __init__(self, init_dict=None, key_list=None):
        init_dict = {} if init_dict is None else init_dict
        key_list = [] if key_list is None else key_list
        for k, v in init_dict.items():
            if type(v) is dict:
                init_dict[k] = CfgNode(v, key_list=key_list + [k])
        super().__init__(init_dict)

    def __getattr__(self, name):
        if name in self:
            return self[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __str__(self):
        lines = []
        for k, v in sorted(self.items()):
            if isinstance(v, CfgNode):
                lines.append(f"{k}:")
                lines.extend("  " + sub for sub in str(v).split("\n"))
            else:
                lines.append(f"{k}: {v}")
        return "\n".join(lines)

    def __repr__(self):
        return "{}({})".format(type(self).__name__, super().__repr__())


def _decode_cfg_value(v):
    """Best-effort literal_eval of a CLI string (reference utils.py:89-98)."""
    if not isinstance(v, str):
        return v
    try:
        v = literal_eval(v)
    except (ValueError, SyntaxError):
        pass
    return v


def _coerce_cfg_value_type(replacement, original, full_key):
    """Require matching types, allowing tuple<->list casts
    (reference utils.py:101-132)."""
    original_type = type(original)
    replacement_type = type(replacement)
    if replacement_type == original_type:
        return replacement
    for from_type, to_type in [(tuple, list), (list, tuple)]:
        if replacement_type == from_type and original_type == to_type:
            return to_type(replacement)
    raise ValueError(
        f"config key {full_key!r}: cannot override value {original!r} of "
        f"type {original_type.__name__} with {replacement!r} of type "
        f"{replacement_type.__name__}"
    )


def load_cfg_from_cfg_file(file: str) -> CfgNode:
    """Load a YAML whose single-level sections are flattened to the root
    (reference utils.py:135-148)."""
    cfg = {}
    assert os.path.isfile(file) and file.endswith(".yaml"), (
        "{} is not a yaml file".format(file)
    )
    with open(file, "r") as f:
        cfg_from_file = yaml.safe_load(f)
    for section in cfg_from_file:
        for k, v in cfg_from_file[section].items():
            cfg[k] = v
    return CfgNode(cfg)


def merge_cfg_from_list(cfg: CfgNode, cfg_list: List[str]) -> CfgNode:
    """Merge ``--opts k v k v ...`` overrides (reference utils.py:151-167).

    Known keys are type-coerced against the current value; unknown keys are
    added verbatim (after literal_eval).
    """
    new_cfg = copy.deepcopy(cfg)
    assert len(cfg_list) % 2 == 0, cfg_list
    for full_key, v in zip(cfg_list[0::2], cfg_list[1::2]):
        subkey = full_key.split(".")[-1]
        value = _decode_cfg_value(v)
        if subkey in cfg:
            value = _coerce_cfg_value_type(value, cfg[subkey], full_key)
        setattr(new_cfg, subkey, value)
    return new_cfg


def load_full_config(opts: List[str] | None, root: str = "./") -> CfgNode:
    """Three-tier config resolution identical to the reference driver
    (main.py:29-56): main -> dataset -> method, with CLI overrides applied
    both before tier 2/3 selection and again at the end; the method-file keys
    are captured in ``cfg.dict_cfg_method`` (post-override values) for
    result-dir naming."""
    cfg = load_cfg_from_cfg_file(os.path.join(root, "config/main_config.yaml"))
    if opts:
        cfg = merge_cfg_from_list(cfg, opts)

    dataset_config = os.path.join(
        cfg.root, "config/dataset_config/{}.yaml".format(cfg.dataset)
    )
    cfg.update(load_cfg_from_cfg_file(dataset_config))

    method_config_file = os.path.join(
        cfg.root, "config/method_config/{}.yaml".format(cfg.method)
    )
    cfg.update(load_cfg_from_cfg_file(method_config_file))

    if opts:
        cfg = merge_cfg_from_list(cfg, opts)

    method_cfg = load_cfg_from_cfg_file(method_config_file)
    cfg.dict_cfg_method = {}
    for key in method_cfg.keys():
        cfg.dict_cfg_method[key] = cfg[key]
    return cfg


def get_save_path_ip(dict_cfg_method) -> str:
    """key1=value1/key2=value2/... result-dir component
    (reference utils.py:1112-1120)."""
    path = ""
    for key, value in dict_cfg_method.items():
        path = os.path.join(path, "{}={}".format(key, value))
    return path
