"""Data pipeline tests: synthetic + mnist loaders, batch shapes/ranges,
file-dataset robustness, and the 28x28 model configuration."""

import gzip
import os
import struct

import numpy as np
import pytest
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# real-file dataset trees (reference dataloaders.py:25-110,121-219 semantics)


def _write_png(path, size=(200, 220), value=None, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    w, h = size
    if value is None:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    else:
        arr = np.full((h, w, 3), value, dtype=np.uint8)
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    Image.fromarray(arr).save(str(path))


def _make_celeba_tree(root, n_per_split=3):
    """Fake CelebA layout: img_align_celeba/*.jpg + list_eval_partition.csv.
    Returns the per-split image name lists (CSV row order)."""
    img_dir = os.path.join(root, "celeba/img_align_celeba")
    rows, names = [], {0: [], 1: [], 2: []}
    i = 0
    for part in (0, 1, 2):
        for _ in range(n_per_split):
            name = "{:06d}.jpg".format(i + 1)
            _write_png(os.path.join(img_dir, name), seed=i)
            rows.append((name, part))
            names[part].append(name)
            i += 1
    # one listed-but-missing file in the test split (custom_collate
    # semantics: silently skipped, dataloaders.py:213-219)
    rows.append(("missing.jpg", 2))
    names[2].append("missing.jpg")
    csv = os.path.join(root, "celeba/list_eval_partition.csv")
    with open(csv, "w") as f:
        f.write("image_id,partition\n")
        for name, part in rows:
            f.write("{},{}\n".format(name, part))
    return names


def test_celeba_tree_splits_transforms_and_missing_files(tmp_path):
    import warnings as _warnings

    root = str(tmp_path / "data")
    names = _make_celeba_tree(root)
    loaders = DataLoaders("celeba", 4, 4, root=root, dim_image=128).load_data()

    # pandas read with header=0 + skiprows=1 + names consumes the CSV header
    # AND the first data row (identical to reference dataloaders.py:128-131),
    # so split 0 loses its first image
    train_batches = list(loaders["train"])
    assert sum(len(b[0]) for b in train_batches) == len(names[0]) - 1

    val, _ = next(iter(loaders["val"]))
    assert val.shape == (3, 128, 128, 3)
    assert val.min() >= -1.0 and val.max() <= 1.0

    # the missing file must be skipped with a warning, shrinking the batch
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        test_batches = list(loaders["test"])
    assert sum(len(b[0]) for b in test_batches) == len(names[2]) - 1
    assert any("missing.jpg" in str(w.message) for w in caught)


def test_celeba_center_crop_then_resize(tmp_path):
    """CenterCrop(178) must happen before Resize: pixels outside the central
    178x178 window of the source must not influence the output."""
    from PIL import Image

    root = str(tmp_path / "data")
    img_dir = os.path.join(root, "celeba/img_align_celeba")
    # constant gray center, white border outside the 178-crop
    arr = np.full((220, 200, 3), 255, dtype=np.uint8)
    arr[21:199, 11:189, :] = 128  # the exact central 178x178 window
    os.makedirs(img_dir)
    Image.fromarray(arr).save(os.path.join(img_dir, "a.jpg"))
    Image.fromarray(arr).save(os.path.join(img_dir, "b.jpg"))
    with open(os.path.join(root, "celeba/list_eval_partition.csv"), "w") as f:
        f.write("image_id,partition\n")  # header
        f.write("a.jpg,2\n")             # consumed by the header=0 quirk
        f.write("b.jpg,2\n")
    loaders = DataLoaders("celeba", 2, 2, root=root, dim_image=128).load_data()
    x, _ = next(iter(loaders["test"]))
    assert x.shape == (1, 128, 128, 3)
    # jpeg + bilinear wiggle, but nothing near the white border value
    assert np.all(np.abs(x - (128 / 255.0 * 2.0 - 1.0)) < 0.1)


def test_celebahq_tree(tmp_path):
    root = str(tmp_path / "data")
    for i in range(3):
        _write_png(
            os.path.join(root, "celebahq/test/{:05d}.png".format(i)),
            size=(300, 300), seed=i,
        )
    loaders = DataLoaders("celebahq", 2, 2, root=root).load_data()
    assert loaders["train"] is None and loaders["val"] is None
    batches = list(loaders["test"])
    assert [len(b[0]) for b in batches] == [2, 1]
    x = batches[0][0]
    assert x.shape == (2, 256, 256, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_afhq_tree_splits_and_drop_last(tmp_path):
    root = str(tmp_path / "data")
    for split, n in (("train", 5), ("val", 2), ("test", 3)):
        for i in range(n):
            _write_png(
                os.path.join(root, "afhq_cat/{}/cat/{:03d}.png".format(split, i)),
                size=(512, 512), seed=i,
            )
    loaders = DataLoaders("afhq_cat", 2, 2, root=root).load_data()
    # train: shuffle + drop_last (reference dataloaders.py:108-110)
    train_batches = list(loaders["train"])
    assert [len(b[0]) for b in train_batches] == [2, 2]
    x = train_batches[0][0]
    assert x.shape == (2, 256, 256, 3)
    assert [len(b[0]) for b in list(loaders["test"])] == [2, 1]
    assert [len(b[0]) for b in list(loaders["val"])] == [2]
