"""Native C++ clip cache: write/read integrity, shuffled epochs, streaming
training integration."""

import os

import numpy as np
import pytest

from vct.data.clipcache import ClipCacheLoader, ClipCacheWriter, write_clipcache


def _data(n=20, t=4, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    clips = rng.randint(0, 256, (n, t, h, w, 3), np.uint8)
    labels = rng.randint(0, 4, n).astype(np.int64)
    return clips, labels


def test_roundtrip_integrity(tmp_path):
    clips, labels = _data()
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)
    with ClipCacheLoader(path, batch_size=8, shuffle=False, workers=2) as loader:
        assert loader.num_clips == 20
        assert loader.num_batches == 3
        xs, ys = [], []
        for xb, yb in loader.epoch():
            xs.append(xb)
            ys.append(yb)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    # unshuffled: exact order match
    np.testing.assert_array_equal(x, clips)
    np.testing.assert_array_equal(y, labels)


def test_shuffled_epochs_cover_all_and_differ(tmp_path):
    clips, labels = _data(n=30)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)
    sums = {int(clips[i].sum()) for i in range(30)}
    with ClipCacheLoader(path, batch_size=7, shuffle=True, seed=3, workers=3) as loader:
        orders = []
        for _ in range(2):
            got = []
            for xb, yb in loader.epoch():
                got.extend(int(x.sum()) for x in xb)
            assert set(got) == sums  # full coverage
            orders.append(got)
    assert orders[0] != orders[1]  # reshuffled between epochs


def test_set_epoch_replays_shuffle_stream(tmp_path):
    """set_epoch(k) on a FRESH loader reproduces epoch k's permutation of an
    uninterrupted run — the checkpoint-resume reproducibility contract."""
    clips, labels = _data(n=30)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)

    def epoch_order(loader):
        got = []
        for xb, _ in loader.epoch():
            got.extend(int(x.sum()) for x in xb)
        return got

    with ClipCacheLoader(path, batch_size=7, shuffle=True, seed=3,
                         workers=2) as loader:
        uninterrupted = [epoch_order(loader) for _ in range(3)]
    with ClipCacheLoader(path, batch_size=7, shuffle=True, seed=3,
                         workers=2) as resumed:
        resumed.set_epoch(2)
        assert epoch_order(resumed) == uninterrupted[2]


def test_float_label_vectors(tmp_path):
    rng = np.random.RandomState(0)
    clips = rng.randint(0, 256, (10, 2, 8, 8, 3), np.uint8)
    labels = (rng.rand(10, 3) > 0.5).astype(np.float32)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)
    with ClipCacheLoader(path, batch_size=4, shuffle=False, workers=2) as loader:
        assert loader.label_dim == 3
        ys = [yb for _, yb in loader.epoch()]
    np.testing.assert_array_equal(np.concatenate(ys), labels)


def test_drop_last(tmp_path):
    clips, labels = _data(n=10)
    path = str(tmp_path / "c.vctc")
    write_clipcache(path, clips, labels)
    with ClipCacheLoader(path, batch_size=4, drop_last=True, shuffle=False) as loader:
        assert loader.num_batches == 2
        counts = [len(xb) for xb, _ in loader.epoch()]
    assert counts == [4, 4]


def test_writer_shape_validation(tmp_path):
    with ClipCacheWriter(str(tmp_path / "c.vctc"), 4, 16, 16, 3) as writer:
        with pytest.raises(ValueError, match="clip shape"):
            writer.append(np.zeros((2, 16, 16, 3), np.uint8), 0)
        writer.append(np.zeros((4, 16, 16, 3), np.uint8), 1)


def test_bad_file_raises(tmp_path):
    bad = tmp_path / "bad.vctc"
    bad.write_bytes(b"not a clip cache at all padding padding padding padding")
    with pytest.raises(IOError):
        ClipCacheLoader(str(bad), batch_size=2)


def test_ingest_clipcache_format(tmp_path):
    """load_or_build_dataset honors cache_format=clipcache end-to-end from a
    prebuilt cache (no videos needed)."""
    from vct.core.config import Config
    from vct.data.ingest import load_or_build_dataset

    cfg = Config().replace(**{
        "data.processed_data_path": str(tmp_path),
        "data.cache_format": "clipcache",
        "data.sequence_length": "4",
        "data.img_height": "16",
        "data.img_width": "16",
    })
    assert cfg.data.data_file.endswith(".vctc")
    clips, labels = _data(n=12, t=4, h=16, w=16)
    write_clipcache(cfg.data.data_file, clips, labels)
    np.save(cfg.data.classes_file, np.asarray(["a", "b", "c", "d"]))
    x, y, classes = load_or_build_dataset(cfg)
    assert x.shape == (12, 4, 16, 16, 3) and x.dtype == np.float32
    assert float(x.max()) <= 1.0
    np.testing.assert_array_equal(y, labels)
    assert classes == ["a", "b", "c", "d"]


def test_ensure_cache_rejects_stale_geometry(tmp_path):
    """The cache filename keys only (max_videos, seq, sampling) — a config
    whose img size or classif_mode changed must refuse the stale cache
    instead of silently training on wrong-resolution clips."""
    from vct.core.config import Config
    from vct.data.ingest import ensure_cache

    cfg = Config().replace(**{
        "data.processed_data_path": str(tmp_path),
        "data.cache_format": "clipcache",
        "data.sequence_length": "4",
        "data.img_height": "16",
        "data.img_width": "16",
    })
    clips, labels = _data(n=6, t=4, h=16, w=16)
    write_clipcache(cfg.data.data_file, clips, labels)
    np.save(cfg.data.classes_file, np.asarray(["a", "b", "c", "d"]))
    ensure_cache(cfg)  # matching geometry: fine
    stale = cfg.replace(**{"data.img_height": "32", "data.img_width": "32"})
    with pytest.raises(ValueError, match="stale cache"):
        ensure_cache(stale)
    multilabel = cfg.replace(**{"model.classif_mode": "multiple_binary"})
    with pytest.raises(ValueError, match="stale cache"):
        ensure_cache(multilabel)


@pytest.mark.slow
def test_fit_stream_trains(tmp_path):
    """Streaming uint8 training through the native loader + device preproc."""
    import jax

    from vct.core.config import Config
    from vct.train.engine import Trainer

    clips, labels = _data(n=24, t=4, h=32, w=32)
    path = str(tmp_path / "train.vctc")
    write_clipcache(path, clips, labels)
    cfg = Config().replace(**{
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.epochs": "2", "train.save_model": "false",
        "train.learning_rate": "0.003",
    })
    tr = Trainer(cfg, ["a", "b", "c", "d"])
    sample = clips[:1].astype(np.float32) / 255.0
    state = tr.init_state(jax.random.PRNGKey(0), sample)
    with ClipCacheLoader(path, batch_size=8, shuffle=True, workers=2) as loader:
        state, run = tr.fit_stream(state, loader, log=False)
    assert len(run.epoch_losses) == 2
    assert all(np.isfinite(l) for l in run.epoch_losses)
