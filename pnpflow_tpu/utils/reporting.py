"""Result reporting with the reference's exact txt/result-dir layout.

The reference reports everything through append-only text files under
``results[/_laplace]/{dataset}/{model}/{problem}/{method}/{split}/k=v/...``
(utils.py:594-901, main.py:186-191): per-batch ``psnr_rec_batch{b}.txt`` rows
of ``iter value``, per-metric ``*_average.txt``, and ``final_*.txt`` tables
whose header row names the method hyperparameters.  We keep that contract so
downstream tooling and the reference's sweep scripts parse our output
unchanged.
"""

from __future__ import annotations

import ast
import math
import os
from collections import defaultdict

import numpy as np

from pnpflow_tpu.metrics.image_quality import psnr as _psnr, ssim as _ssim


def postprocess(img, args):
    """Undo dataset normalization to [0,1] for metric computation.

    All our pipelines normalize to [-1, 1]; the reference's celeba inverse
    Normalize(mean=-1, std=2) equals (x+1)/2, as do the afhq_cat and
    rectified paths (utils.py:546-577), so a single affine suffices.
    """
    del args
    return (img + 1.0) / 2.0


def _metric_inputs(clean_img, noisy_img, rec_img, args, H_adj):
    clean = postprocess(clean_img, args)
    rec = postprocess(rec_img, args)
    if args.problem in ("superresolution", "superresolution_bicubic"):
        noisy = postprocess(H_adj(noisy_img), args)
    else:
        noisy = postprocess(noisy_img, args)
    return clean, noisy, rec


def _append(path, line):
    with open(path, "a") as f:
        f.write(line + "\n")


# One jitted program per (metric, sr-flag, H_adj identity): postprocess +
# metric fused.  Metrics run on the HOST cpu backend: they're tiny, and
# compiling/dispatching them on a remote TPU costs more than the compute.
_JIT_CACHE: dict = {}


def _cpu_device():
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def _jitted_pair(metric_fn, args, H_adj):
    import jax

    sr = args.problem in ("superresolution", "superresolution_bicubic")
    # key on the H_adj callable itself (bound methods of one instance hash
    # equal); holding the reference also prevents id() aliasing after GC
    cache_key = (metric_fn.__name__, sr, H_adj)
    if cache_key not in _JIT_CACHE:

        @jax.jit
        def fn(clean_img, noisy_img, rec_img):
            clean = (clean_img + 1.0) / 2.0
            rec = (rec_img + 1.0) / 2.0
            noisy = (
                (H_adj(noisy_img) + 1.0) / 2.0 if sr
                else (noisy_img + 1.0) / 2.0
            )
            return (
                metric_fn(rec, clean, data_range=1.0),
                metric_fn(noisy, clean, data_range=1.0),
            )

        cpu = _cpu_device()

        def wrapped(clean_img, noisy_img, rec_img):
            a = np.asarray(clean_img)
            b = np.asarray(noisy_img)
            c = np.asarray(rec_img)
            if cpu is not None:
                with jax.default_device(cpu):
                    return fn(a, b, c)
            return fn(a, b, c)

        _JIT_CACHE[cache_key] = wrapped
    return _JIT_CACHE[cache_key]


def compute_psnr(clean_img, noisy_img, rec_img, args, H_adj, iter="final"):
    pair = _jitted_pair(_psnr, args, H_adj)(clean_img, noisy_img, rec_img)
    psnr_rec, psnr_noisy = float(pair[0]), float(pair[1])
    _append(
        os.path.join(args.save_path_ip, f"psnr_rec_batch{args.batch}.txt"),
        f"{iter} {psnr_rec}",
    )
    _append(
        os.path.join(args.save_path_ip, f"psnr_noisy_batch{args.batch}.txt"),
        f"{iter} {psnr_noisy}",
    )
    return psnr_rec


def compute_ssim(clean_img, noisy_img, rec_img, args, H_adj, iter="final"):
    pair = _jitted_pair(_ssim, args, H_adj)(clean_img, noisy_img, rec_img)
    ssim_rec, ssim_noisy = float(pair[0]), float(pair[1])
    _append(
        os.path.join(args.save_path_ip, f"ssim_rec_batch{args.batch}.txt"),
        f"{iter} {ssim_rec}",
    )
    _append(
        os.path.join(args.save_path_ip, f"ssim_noisy_batch{args.batch}.txt"),
        f"{iter} {ssim_noisy}",
    )
    return ssim_rec


def compute_lpips(clean_img, noisy_img, rec_img, args, H_adj, iter="final"):
    """LPIPS (AlexNet) in [-1,1]; requires converted weights — silently
    skipped (with one warning) when unavailable, since the published LPIPS
    weights cannot be downloaded in a zero-egress environment."""
    from pnpflow_tpu.metrics import lpips as lpips_mod

    fn = lpips_mod.get_lpips_fn(args)
    if fn is None:
        return None
    clean, noisy, rec = _metric_inputs(clean_img, noisy_img, rec_img, args, H_adj)
    lpips_rec = float(fn(2 * clean - 1, 2 * rec - 1))
    lpips_noisy = float(fn(2 * clean - 1, 2 * noisy - 1))
    _append(
        os.path.join(args.save_path_ip, f"lpips_rec_batch{args.batch}.txt"),
        f"{iter} {lpips_rec}",
    )
    _append(
        os.path.join(args.save_path_ip, f"lpips_noisy_batch{args.batch}.txt"),
        f"{iter} {lpips_noisy}",
    )
    return lpips_rec


def _compute_average(metric_name, args):
    """Aggregate per-batch txt files into ``{metric}_{word}_average.txt`` and
    a ``final_{metric}.txt`` row keyed by the method hyperparameters
    (reference utils.py:628-674)."""
    finals = {}
    for word in ["rec", "noisy"]:
        by_iteration = defaultdict(list)
        for batch in range(args.max_batch):
            filename = os.path.join(
                args.save_path_ip, f"{metric_name}_{word}_batch{batch}.txt"
            )
            if not os.path.exists(filename):
                return  # metric never produced (e.g. lpips without weights)
            with open(filename) as f:
                for line in f:
                    iteration, value = line.strip().split()
                    by_iteration[int(float(iteration))].append(float(value))
        averages = {it: float(np.mean(v)) for it, v in by_iteration.items()}
        avg_filename = os.path.join(
            args.save_path_ip, f"{metric_name}_{word}_average.txt"
        )
        with open(avg_filename, "a") as f:
            for it, avg in sorted(averages.items()):
                f.write(f"{it} {avg:.4f}\n")
        with open(avg_filename) as f:
            finals[word] = float(f.readlines()[-1].split()[1])

    final_path = os.path.join(args.save_path, f"final_{metric_name}.txt")
    write_header = (
        not os.path.exists(final_path) or os.stat(final_path).st_size == 0
    )
    with open(final_path, "a") as f:
        if write_header:
            f.write(f"{metric_name}_rec ")
            f.write(f"{metric_name}_noisy ")
            for key in args.dict_cfg_method.keys():
                f.write(f"{key} ")
            f.write("\n")
        f.write(f"{finals['rec']} ")
        f.write(f"{finals['noisy']} ")
        for value in args.dict_cfg_method.values():
            f.write(f"{value} ")
        f.write("\n")


def compute_average_psnr(args):
    _compute_average("psnr", args)


def compute_average_ssim(args):
    _compute_average("ssim", args)


def compute_average_lpips(args):
    _compute_average("lpips", args)


def save_time_use(dict_time, args):
    _append(os.path.join(args.save_path_ip, "time_stats.txt"), str(dict_time))


def save_memory_use(dict_mem, args):
    _append(os.path.join(args.save_path_ip, "memory_stats.txt"), str(dict_mem))


def _average_stat(args, stats_file, value_key, out_file, label):
    values = np.zeros(args.max_batch)
    filename = os.path.join(args.save_path_ip, stats_file)
    with open(filename) as f:
        lines = [ast.literal_eval(line.strip()) for line in f]
    for batch in range(args.max_batch):
        for data in lines:
            if data["batch"] == batch:
                values[batch] = data[value_key]
                break
    _append(
        os.path.join(args.save_path_ip, out_file),
        f"{label}: {values.mean():.4f}",
    )


def compute_average_time(args):
    _average_stat(
        args, "time_stats.txt", "time_per_batch", "time_average.txt",
        "average time",
    )


def compute_average_memory(args):
    _average_stat(
        args, "memory_stats.txt", "max_allocated", "max_memory_average.txt",
        "average mem",
    )


def save_images(clean_img, noisy_img, rec_img, args, H_adj, iter="final"):
    """Final clean/noisy/restored grids (reference utils.py:433-543).

    Images arrive NHWC in model range; saved as matplotlib grids.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # pull to host first, then pure-numpy postprocess (no device dispatch)
    clean = (np.asarray(clean_img) + 1.0) / 2.0
    rec = (np.asarray(rec_img) + 1.0) / 2.0
    if args.problem in ("superresolution", "superresolution_bicubic"):
        cpu = _cpu_device()
        import jax

        if cpu is not None:
            with jax.default_device(cpu):
                up = np.asarray(H_adj(np.asarray(noisy_img)))
        else:
            up = np.asarray(H_adj(noisy_img))
        noisy = (up + 1.0) / 2.0
    else:
        noisy = (np.asarray(noisy_img) + 1.0) / 2.0

    batch_size = clean.shape[0]
    cols = max(int(math.sqrt(batch_size)), 1)
    rows = max(batch_size // cols, 1)

    # test split: first batches additionally get per-image .eps files with
    # the PSNR embedded in the filename (reference utils.py:509-543 —
    # batch < 4, or < 8 for d_flow; clean/noisy only for pnp_flow)
    if (
        getattr(args, "eval_split", None) == "test"
        and (
            (args.batch < 8 and args.method == "d_flow") or args.batch < 4
        )
    ):
        def psnr_of(a, b):
            mse = float(np.mean((a - b) ** 2))
            return 10.0 * math.log10(1.0 / max(mse, 1e-20))

        def save_one(img2d, fname):
            fig = plt.figure()
            shown = np.clip(img2d, 0, 1)
            if shown.shape[-1] == 1:
                plt.imshow(shown[..., 0], cmap="gray", vmin=0, vmax=1)
            else:
                plt.imshow(shown)
            plt.axis("off")
            fig.savefig(
                os.path.join(args.save_path_ip, fname),
                bbox_inches="tight", pad_inches=0,
            )
            plt.close(fig)

        for i in range(batch_size):
            p = args.problem
            if args.method == "pnp_flow":
                save_one(
                    clean[i], f"{p}_clean_batch{args.batch}_im{i}.eps"
                )
                save_one(
                    noisy[i],
                    "{}_noisy_batch{}_im{}_pnsr{:4.2f}.eps".format(
                        p, args.batch, i, psnr_of(clean[i], noisy[i])
                    ),
                )
            save_one(
                rec[i],
                "{}_{}_batch{}_im{}_iter{}_pnsr{:4.2f}.eps".format(
                    p, args.method, args.batch, i, iter,
                    psnr_of(clean[i], rec[i]),
                ),
            )

    names = ["clean", "noisy", args.method]
    for name, img in zip(names, [clean, noisy, rec]):
        fig, ax = plt.subplots(rows, cols, squeeze=False)
        for i in range(rows):
            for j in range(cols):
                idx = i + j * rows
                if idx < batch_size:
                    shown = np.clip(img[idx], 0, 1)
                    if shown.shape[-1] == 1:
                        ax[i][j].imshow(shown[..., 0], cmap="gray", vmin=0, vmax=1)
                    else:
                        ax[i][j].imshow(shown)
                ax[i][j].set_xticks([])
                ax[i][j].set_yticks([])
        fig.savefig(
            os.path.join(
                args.save_path_ip,
                f"{args.problem}_{name}_batch{args.batch}_{iter}.png",
            )
        )
        plt.close(fig)
