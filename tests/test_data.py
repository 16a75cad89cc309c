"""Data pipeline tests: synthetic + mnist loaders, batch shapes/ranges,
file-dataset robustness, and the 28x28 model configuration."""

import gzip
import os
import struct

import numpy as np
import jax.numpy as jnp

from pnpflow_tpu.data.datasets import DataLoaders, synthetic_images


def test_synthetic_loader_shapes_and_range():
    loaders = DataLoaders("synthetic", 16, 8, dim_image=32,
                          num_channels=3).load_data()
    x, y = next(iter(loaders["train"]))
    assert x.shape == (16, 32, 32, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    x, _ = next(iter(loaders["test"]))
    assert x.shape == (8, 32, 32, 3)


def test_synthetic_deterministic_per_seed():
    a = synthetic_images(4, 16, 1, seed=0)
    b = synthetic_images(4, 16, 1, seed=0)
    c = synthetic_images(4, 16, 1, seed=1)
    assert np.allclose(a, b)
    assert not np.allclose(a, c)


def test_shuffle_changes_order_across_epochs():
    loaders = DataLoaders("synthetic", 8, 8, dim_image=16,
                          num_channels=1).load_data()
    train = loaders["train"]
    first_epoch = next(iter(train))[0].copy()
    second_epoch = next(iter(train))[0].copy()
    assert not np.allclose(first_epoch, second_epoch)


def _write_idx(path, images):
    n, h, w = images.shape
    with gzip.open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, h, w))
        f.write(images.astype(np.uint8).tobytes())


def test_mnist_loader(tmp_path):
    root = tmp_path / "mnist"
    root.mkdir()
    rng = np.random.default_rng(0)
    _write_idx(root / "train-images-idx3-ubyte.gz",
               rng.integers(0, 255, size=(20, 28, 28)))
    _write_idx(root / "t10k-images-idx3-ubyte.gz",
               rng.integers(0, 255, size=(10, 28, 28)))
    loaders = DataLoaders("mnist", 8, 4, root=str(tmp_path)).load_data()
    x, _ = next(iter(loaders["train"]))
    assert x.shape == (8, 28, 28, 1)
    assert -1.0 <= x.min() and x.max() <= 1.0
    # 10 test images -> 5 val + 5 test, bs 4 -> 2 batches each
    assert len(list(loaders["val"])) + len(list(loaders["test"])) == 4


def test_mnist_28px_model_builds():
    """BASELINE configs[0]: MNIST 28x28 denoising — the registry must build
    a U-Net for a dim not divisible by 8."""
    import jax
    from pnpflow_tpu.models.registry import define_model, init_params
    from pnpflow_tpu.utils.config import CfgNode

    args = CfgNode(dict(model="ot", dim_image=28, num_channels=1))
    model = define_model(args)
    params = init_params(model, args)
    out = model.apply(
        params, jnp.zeros((2, 28, 28, 1)), jnp.full((2,), 0.5)
    )
    assert out.shape == (2, 28, 28, 1)


def test_unknown_dataset_raises():
    import pytest

    with pytest.raises(ValueError):
        DataLoaders("nope", 1, 1).load_data()


def test_prefetch_iterator_matches_and_propagates_errors():
    from pnpflow_tpu.data.prefetch import PrefetchIterator, prefetch

    data = [(np.full((2, 2), i), i) for i in range(5)]
    out = list(PrefetchIterator(data, depth=2))
    assert len(out) == 5
    assert all(np.allclose(a[0], b[0]) for a, b in zip(out, data))
    # re-iterable
    assert len(list(PrefetchIterator(data))) == 5

    class Boom:
        def __iter__(self):
            yield data[0]
            raise RuntimeError("decode failed")

    import pytest

    with pytest.raises(RuntimeError):
        list(PrefetchIterator(Boom()))

    d = prefetch({"train": data, "val": None})
    assert d["val"] is None
    assert len(list(d["train"])) == 5


def test_prefetch_early_break_releases_producer():
    """Breaking out of iteration must not leave the producer thread blocked
    (code-review finding: per-epoch thread + queued-batch leak)."""
    import threading
    import time

    from pnpflow_tpu.data.prefetch import PrefetchIterator

    n_before = threading.active_count()
    data = [(np.zeros((4, 4)), i) for i in range(100)]
    for _ in range(20):  # 20 'epochs' with early break
        for i, item in enumerate(PrefetchIterator(data, depth=2)):
            if i == 2:
                break
    deadline = time.time() + 5.0
    while threading.active_count() > n_before + 1 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before + 1
