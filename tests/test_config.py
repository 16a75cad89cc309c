"""Config-system parity tests (vs reference utils.py:37-167, main.py:29-56)."""

import os

import pytest

from pnpflow_tpu.utils.config import (
    CfgNode,
    load_cfg_from_cfg_file,
    load_full_config,
    merge_cfg_from_list,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flattened_yaml_load():
    cfg = load_cfg_from_cfg_file(os.path.join(REPO, "config/main_config.yaml"))
    # top-level section keys are hoisted
    assert cfg.dataset == "celeba"
    assert cfg.batch_size_ip == 4
    assert cfg.train is False


def test_attribute_access_and_set():
    cfg = CfgNode({"a": 1, "nested": {"b": 2}})
    assert cfg.a == 1
    assert cfg.nested.b == 2
    cfg.c = 3
    assert cfg["c"] == 3
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_merge_type_coercion():
    cfg = CfgNode({"x": 1, "name": "foo", "lst": [1, 2]})
    out = merge_cfg_from_list(cfg, ["x", "5", "name", "bar", "lst", "(3, 4)"])
    assert out.x == 5 and isinstance(out.x, int)
    assert out.name == "bar"
    assert out.lst == [3, 4] and isinstance(out.lst, list)  # tuple->list cast


def test_merge_unknown_keys_allowed():
    cfg = CfgNode({"x": 1})
    out = merge_cfg_from_list(cfg, ["new_key", "2.5"])
    assert out.new_key == 2.5


def test_merge_type_mismatch_raises():
    cfg = CfgNode({"x": 1})
    with pytest.raises(ValueError):
        merge_cfg_from_list(cfg, ["x", "'a string'"])


def test_full_config_three_tier(monkeypatch):
    monkeypatch.chdir(REPO)
    cfg = load_full_config(
        ["dataset", "celeba", "method", "pnp_flow", "steps_pnp", "7"]
    )
    assert cfg.dim_image == 128  # from dataset tier
    assert cfg.steps_pnp == 7  # CLI override after method tier
    # dict_cfg_method captures post-override values of method-file keys
    assert cfg.dict_cfg_method["steps_pnp"] == 7
    assert set(cfg.dict_cfg_method) == {
        "steps_pnp", "lr_pnp", "gamma_style", "num_samples", "alpha",
    }
