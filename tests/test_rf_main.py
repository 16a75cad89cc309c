"""rf_main driver: the working equivalent of the reference's broken
image_generation/main.py — smoke every mode on a tiny config (CPU)."""

import os

import numpy as np
import pytest

from pnpflow_tpu import rf_main


def _tiny_opts(workdir):
    return [
        "--config", "cifar10_rf_gaussian_ddpmpp",
        "--workdir", str(workdir),
        "--opts",
        "data.image_size", "8",
        "model.nf", "16",
        "model.num_res_blocks", "1",
        "model.attn_resolutions", "()",
        "training.batch_size", "4",
        "sampling.sample_N", "5",
        "sampling.use_ode_sampler", "euler",
        "optim.warmup", "2",
    ]


@pytest.mark.slow
def test_train_then_sample_roundtrip(tmp_path, capsys):
    wd = tmp_path / "run"
    rf_main.main(["--mode", "train", "--n_iters", "3",
                  *_tiny_opts(wd)])
    assert os.path.exists(wd / "state.msgpack")
    out = capsys.readouterr().out
    assert out.count("loss") == 3

    rf_main.main(["--mode", "sample", "--n_samples", "4",
                  *_tiny_opts(wd)])
    data = np.load(wd / "samples.npz")
    assert data["samples"].shape == (4, 8, 8, 3)
    assert np.isfinite(data["samples"]).all()
    assert "restored" in capsys.readouterr().out


@pytest.mark.slow
def test_reflow_modes(tmp_path, capsys):
    wd = tmp_path / "run"
    # offline reflow (train_reflow): regenerates pairs each iter
    rf_main.main(["--mode", "reflow", "--n_iters", "2",
                  *_tiny_opts(wd),
                  "reflow.reflow_type", "train_reflow",
                  "reflow.reflow_t_schedule", "uniform",
                  "reflow.reflow_loss", "l2"])
    assert os.path.exists(wd / "state.msgpack")

    # pair generation to npz
    rf_main.main(["--mode", "generate_pairs", *_tiny_opts(wd),
                  "reflow.reflow_type", "generate_data_from_z0",
                  "reflow.total_number_of_samples", "6"])
    pairs = np.load(wd / "reflow_pairs.npz")
    assert pairs["z0"].shape == (6, 8, 8, 3)
    assert pairs["x1"].shape == (6, 8, 8, 3)


@pytest.mark.slow
def test_online_reflow_and_lpips_fallback(tmp_path):
    wd = tmp_path / "run"
    with pytest.warns(UserWarning, match="LPIPS"):
        rf_main.main(["--mode", "reflow", "--n_iters", "2",
                      *_tiny_opts(wd),
                      "reflow.reflow_type", "train_online_reflow",
                      "reflow.reflow_t_schedule", "t0",
                      "reflow.reflow_loss", "lpips"])
    assert os.path.exists(wd / "state.msgpack")


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        rf_main.main(["--config", "nope", "--mode", "sample"])
