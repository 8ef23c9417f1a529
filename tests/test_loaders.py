"""Loader abstraction + out-of-core training tests.

The reference streams training data from an HDF5-backed Dataset
(``loader_data.py:74-125``); these tests prove our unified loader path is
(a) batch-identical to the in-RAM path, (b) resumable, and (c) actually
out-of-core (bounded RSS while iterating a cache larger than any batch).
"""

import os

import numpy as np
import pytest

import jax

from vct.core.config import Config
from vct.data.loaders import (
    ArrayLoader,
    ClipCacheMapLoader,
    HDF5Loader,
    split_indices,
)
from vct.train.engine import Trainer


def _make_hdf5(path, x, y):
    import h5py

    with h5py.File(path, "w") as hf:
        hf.create_dataset("videos", data=x)
        hf.create_dataset("labels", data=y)
    return str(path)


def _rand_dataset(n=10, t=3, h=8, w=8, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(n, t, h, w, 3).astype(np.float32)
    y = rng.randint(0, 3, size=n).astype(np.int64)
    return x, y


def test_hdf5_loader_matches_array_loader(tmp_path):
    x, y = _rand_dataset()
    path = _make_hdf5(tmp_path / "d.h5", x, y)
    a = ArrayLoader(x, y, batch_size=4)
    with HDF5Loader(path, batch_size=4) as h:
        for (xa, ya, ma), (xh, yh, mh) in zip(
            a.epoch(np.random.RandomState(7)), h.epoch(np.random.RandomState(7))
        ):
            np.testing.assert_array_equal(xa, xh)
            np.testing.assert_array_equal(ya, yh)
            np.testing.assert_array_equal(ma, mh)


def test_hdf5_loader_subset_indices(tmp_path):
    x, y = _rand_dataset()
    path = _make_hdf5(tmp_path / "d.h5", x, y)
    idx = np.array([1, 3, 4, 8])
    with HDF5Loader(path, batch_size=3, indices=idx) as h:
        assert h.num_examples == 4
        got_x, got_y = [], []
        for xb, yb, mask in h.epoch():
            k = int(mask.sum())
            got_x.append(xb[:k])
            got_y.append(yb[:k])
        np.testing.assert_array_equal(np.concatenate(got_x), x[idx])
        np.testing.assert_array_equal(np.concatenate(got_y), y[idx])


def test_clipcache_map_loader_roundtrip(tmp_path):
    from vct.data.clipcache import write_clipcache

    rng = np.random.RandomState(0)
    clips = rng.randint(0, 256, (9, 2, 8, 8, 3), np.uint8)
    labels = rng.randint(0, 4, 9).astype(np.int64)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)

    idx = np.array([0, 2, 5, 6, 7])
    with ClipCacheMapLoader(path, batch_size=2, indices=idx) as m:
        assert m.num_examples == 5
        got_x, got_y = [], []
        for xb, yb, mask in m.epoch():
            k = int(mask.sum())
            assert xb.dtype == np.uint8
            got_x.append(xb[:k])
            got_y.append(yb[:k])
        np.testing.assert_array_equal(np.concatenate(got_x), clips[idx])
        np.testing.assert_array_equal(np.concatenate(got_y), labels[idx])


def test_clipcache_map_loader_rejects_truncated(tmp_path):
    from vct.data.clipcache import write_clipcache

    clips = np.zeros((3, 2, 8, 8, 3), np.uint8)
    labels = np.zeros(3, np.int64)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) - 100)
    with pytest.raises(IOError):
        ClipCacheMapLoader(path, batch_size=2)


def test_native_loader_rejects_truncated(tmp_path):
    """ccl_open must fail cleanly on truncated/foreign files (no SIGBUS)."""
    from vct.data.clipcache import ClipCacheLoader, write_clipcache

    clips = np.zeros((3, 2, 8, 8, 3), np.uint8)
    labels = np.zeros(3, np.int64)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) - 64)
    with pytest.raises(IOError):
        ClipCacheLoader(path, batch_size=2)
    tiny = str(tmp_path / "tiny.vctc")
    with open(tiny, "wb") as f:
        f.write(b"short")
    with pytest.raises(IOError):
        ClipCacheLoader(tiny, batch_size=2)


def _base_cfg(tmp_path, epochs=2):
    return Config().replace(**{
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "gru",
        "model.rnn_input_size": "4",
        "model.rnn_layer": "1",
        "data.sequence_length": "3",
        "data.img_height": "8",
        "data.img_width": "8",
        "model.num_classes": "3",
        "train.batch_size": "4",
        "train.epochs": str(epochs),
        "train.save_model": "false",
        "train.model_path": str(tmp_path / "ckpt"),
    })


@pytest.mark.slow
def test_fit_loader_equals_fit_arrays(tmp_path):
    """Same data via HDF5 stream and in-RAM arrays -> identical losses."""
    x, y = _rand_dataset(n=12)
    path = _make_hdf5(tmp_path / "d.h5", x, y)
    names = ["a", "b", "c"]
    cfg = _base_cfg(tmp_path)

    tr1 = Trainer(cfg, names)
    s1 = tr1.init_state(jax.random.PRNGKey(0), x)
    s1, run1 = tr1.fit(s1, x, y, log=False)

    tr2 = Trainer(cfg, names)
    s2 = tr2.init_state(jax.random.PRNGKey(0), x)
    with HDF5Loader(path, batch_size=cfg.train.batch_size) as loader:
        s2, run2 = tr2.fit(s2, loader, log=False)
        m1 = tr1.evaluate(s1, x, y, log=False)
        m2 = tr2.evaluate(s2, loader, log=False)

    np.testing.assert_allclose(run1.epoch_losses, run2.epoch_losses, rtol=1e-5)
    assert m1.accuracy == pytest.approx(m2.accuracy)
    assert m1.f1 == pytest.approx(m2.f1)


@pytest.mark.slow
def test_stream_resume_after_crash(tmp_path):
    """Epoch resume is bit-consistent on the streaming path too."""
    x, y = _rand_dataset(n=12)
    path = _make_hdf5(tmp_path / "d.h5", x, y)
    names = ["a", "b", "c"]

    def run(epochs, resume):
        cfg = _base_cfg(tmp_path, epochs=epochs).replace(
            **{"train.resume": str(resume).lower()}
        )
        tr = Trainer(cfg, names)
        s = tr.init_state(jax.random.PRNGKey(0), x)
        with HDF5Loader(path, batch_size=cfg.train.batch_size) as loader:
            return tr.fit(s, loader, log=False)[1]

    ref = run(3, resume=False)
    run1 = run(1, resume=True)     # epoch 1, then "crash"
    run2 = run(3, resume=True)     # fresh process resumes epochs 2..3
    # The resumed run's history covers the WHOLE run: the checkpointed
    # pre-crash epoch plus the two it trains itself.
    assert len(run2.epoch_losses) == 3
    assert run2.epoch_losses[0] == run1.epoch_losses[0]
    np.testing.assert_allclose(run2.epoch_losses, ref.epoch_losses, rtol=1e-4)


def _vm_rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def test_map_loader_is_out_of_core(tmp_path):
    """Iterating a cache much larger than a batch keeps RSS growth far below
    the float32 materialization the old load_dataset_cache did."""
    from vct.data.clipcache import ClipCacheWriter

    N, T, H, W = 192, 16, 64, 64
    path = str(tmp_path / "big.vctc")
    frame = np.arange(T * H * W * 3, dtype=np.uint8).reshape(T, H, W, 3)
    with ClipCacheWriter(path, T, H, W, 3) as wr:
        for i in range(N):
            wr.append(frame, i % 3)
    uint8_mb = N * T * H * W * 3 / 1e6  # ~37 MB file; f32 copy would be ~150 MB

    before = _vm_rss_mb()
    with ClipCacheMapLoader(path, batch_size=8) as m:
        peak = 0.0
        for xb, yb, mask in m.epoch(np.random.RandomState(0)):
            peak = max(peak, _vm_rss_mb())
    growth = peak - before
    # mmap pages touched during the epoch are file-backed and evictable; the
    # bound proves no float32 whole-dataset materialization (4x the file).
    assert growth < uint8_mb * 2.5, f"RSS grew {growth:.0f} MB on a {uint8_mb:.0f} MB cache"
