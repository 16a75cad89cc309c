"""End-to-end execution of the weight-gated metric paths.

The published LPIPS-AlexNet and FID-Inception weights cannot be downloaded
in a zero-egress environment, so every previous round left the converted-npz
-> runtime -> output-file seam unexecuted.  These tests close it with
locally-generated random-but-SAVED weights in the exact torch formats the
converters consume (torchvision ``alexnet.features.*`` + lpips
``lin{i}.model.1.weight``; torchvision ``Mixed_*.branch*.conv/bn`` FID
inception), run through the ACTUAL converters and then the ACTUAL CLI,
asserting the reference's output artifacts appear:

  * ``final_lpips.txt`` (reference utils.py:677-777, compute_average_lpips)
  * ``metrics.txt`` with ``inception_2048`` features
    (compute_metric.py:44-45, fid_score.py:131-156)

After this, the only untested element of these paths is the published
weight values themselves.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _write_lpips_npz(root: str):
    """Random torchvision-alexnet-shaped state dicts -> the real converter."""
    from pnpflow_tpu.utils.lpips_convert import convert_from_state_dicts

    rng = np.random.default_rng(0)
    layout = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
              (256, 256, 3)]
    feat_idx = [0, 3, 6, 8, 10]  # Sequential indices in alexnet.features
    alexnet_sd, lpips_sd = {}, {}
    for (o, i, k), fi in zip(layout, feat_idx):
        alexnet_sd["features.{}.weight".format(fi)] = (
            0.1 * rng.normal(size=(o, i, k, k))
        ).astype(np.float32)
        alexnet_sd["features.{}.bias".format(fi)] = (
            0.1 * rng.normal(size=(o,))
        ).astype(np.float32)
    for i, (o, _, _) in enumerate(layout):
        lpips_sd["lin{}.model.1.weight".format(i)] = rng.random(
            (1, o, 1, 1)
        ).astype(np.float32)
    os.makedirs(os.path.join(root, "model"), exist_ok=True)
    convert_from_state_dicts(
        alexnet_sd, lpips_sd, os.path.join(root, "model", "lpips_alex.npz")
    )


def _write_inception_npz(root: str):
    """Random FID-InceptionV3-shaped state dict -> the real converter."""
    from pnpflow_tpu.utils.inception_convert import (
        convert_inception_state_dict,
    )
    from test_inception import synthetic_state_dict

    flat = convert_inception_state_dict(synthetic_state_dict(seed=1))
    os.makedirs(os.path.join(root, "model"), exist_ok=True)
    np.savez(os.path.join(root, "model", "inception_fid.npz"), **flat)


def _run_cli(*opts):
    # load THIS repo's main.py by path: the reference-parity tests put the
    # mounted reference repo on sys.path, whose own main.py would win an
    # ``import main`` in a shared pytest process
    import importlib.util

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "pnpflow_tpu_cli_main", os.path.join(repo_root, "main.py")
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    argv = ["main.py", "--opts"] + [str(o) for o in opts]
    old = sys.argv
    sys.argv = argv
    try:
        cli.main()
    finally:
        sys.argv = old


def test_cli_emits_final_lpips_with_converted_weights(tmp_path):
    root = str(tmp_path) + "/"
    _write_lpips_npz(str(tmp_path))
    with pytest.warns(UserWarning, match="random init"):
        _run_cli(
            "dataset", "synthetic", "model", "ot", "eval", "True",
            "problem", "denoising", "method", "pnp_flow",
            "dim_image", "32", "output_root", root,
            "max_batch", "1", "batch_size_ip", "2",
            "steps_pnp", "2", "num_samples", "1",
            "save_results", "True", "compute_time", "False",
            "compute_memory", "False", "seed", "0",
        )
    save_path = tmp_path / "results" / "synthetic" / "ot" / "denoising" / \
        "pnp_flow" / "test"
    final = save_path / "final_lpips.txt"
    assert final.exists(), "final_lpips.txt was not produced"
    lines = final.read_text().strip().splitlines()
    assert lines[0].split()[:2] == ["lpips_rec", "lpips_noisy"]
    rec, noisy = (float(v) for v in lines[1].split()[:2])
    assert np.isfinite(rec) and np.isfinite(noisy)
    # per-batch + averaged artifacts exist under the key=value dir
    ip_dirs = [
        os.path.join(dirpath, f)
        for dirpath, _, files in os.walk(save_path)
        for f in files
    ]
    names = {os.path.basename(p) for p in ip_dirs}
    assert "lpips_rec_batch0.txt" in names
    assert "lpips_rec_average.txt" in names


def test_cli_compute_metrics_inception_2048(tmp_path):
    root = str(tmp_path) + "/"
    _write_inception_npz(str(tmp_path))
    with pytest.warns(UserWarning, match="random init"):
        _run_cli(
            "dataset", "synthetic", "model", "ot", "eval", "True",
            "compute_metrics", "True", "metric_n", "16",
            "metric_steps", "2", "metric_sampler", "euler",
            "problem", "denoising", "method", "pnp_flow",
            "dim_image", "32", "output_root", root,
            "max_batch", "0", "batch_size_ip", "2",
            "save_results", "False", "compute_time", "False",
            "compute_memory", "False", "seed", "0",
        )
    metrics = tmp_path / "results" / "synthetic" / "ot" / "metrics.txt"
    assert metrics.exists(), "metrics.txt was not produced"
    line = metrics.read_text().strip().splitlines()[-1]
    toks = line.split()
    assert toks[toks.index("features") + 1] == "inception_2048"
    fid = float(toks[toks.index("FID") + 1])
    kid = float(toks[toks.index("KID") + 1])
    assert np.isfinite(kid)
    vendi = float(toks[toks.index("Vendi") + 1])
    sw = float(toks[toks.index("SW") + 1])
    assert np.isfinite(fid) and fid >= 0
    assert np.isfinite(vendi) and vendi >= 1.0 - 1e-6
    assert np.isfinite(sw) and sw >= 0
    # the fc head rode through the converter -> Inception Score emitted
    is_mean = float(toks[toks.index("IS") + 1])
    assert np.isfinite(is_mean) and is_mean >= 1.0 - 1e-4
