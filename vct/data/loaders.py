"""Batch-loader abstraction: one epoch interface for every training input.

The reference has two training input paths — whole-array-in-RAM and an
HDF5-backed streaming ``VideoDataset`` (``loader_data.py:74-125``) — and the
round-1 engine mirrored that split with ``fit``/``fit_stream``. This module
unifies them: ``Trainer.fit``/``evaluate`` consume any object with

    num_examples: int
    batch_size:   int
    epoch(rng: np.random.RandomState | None) -> iter of (xb, yb, mask)

where ``xb`` is either float32 (already normalized) or uint8 (normalized
on-device by the Pallas/XLA preprocess kernel — uint8 also quarters the
host->device copy). Exactly one ``rng.permutation(num_examples)`` is consumed
per shuffled epoch, so checkpoint resume can fast-forward the shuffle stream
deterministically on every loader.

Loaders:
  * ArrayLoader      — in-memory arrays (the reference's simple path)
  * HDF5Loader       — streams batches straight from the HDF5 cache; the
                       dataset is never materialized in host RAM
                       (out-of-core counterpart of loader_data.py:74-125)
  * ClipCacheMapLoader — mmap view of the native uint8 clip cache with
                       index-subset support (train/test split) and O(batch)
                       resident memory; the OS page cache does the caching
  * ClipCacheStream  — wraps the native multithreaded prefetch loader
                       (maximum-throughput full-epoch streaming)
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

__all__ = [
    "ArrayLoader",
    "HDF5Loader",
    "ClipCacheMapLoader",
    "ClipCacheStream",
    "as_loader",
    "open_cache_loader",
    "split_indices",
]

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray]


def split_indices(n: int, test_fraction: float = 0.2, seed: int = 42):
    """Index-level train/test split (same permutation split as
    ``vct.data.batcher.train_test_split``, without touching the data)."""
    order = np.random.RandomState(seed).permutation(n)
    n_test = int(round(n * test_fraction))
    return np.sort(order[n_test:]), np.sort(order[:n_test])


def _pad(xb, yb, k, batch_size) -> Batch:
    mask = np.ones(k, np.float32)
    if k < batch_size:
        pad = batch_size - k
        xb = np.concatenate([xb, np.zeros((pad,) + xb.shape[1:], xb.dtype)])
        yb = np.concatenate([yb, np.zeros((pad,) + yb.shape[1:], yb.dtype)])
        mask = np.concatenate([mask, np.zeros(pad, np.float32)])
    return xb, yb, mask


class ArrayLoader:
    """Wrap in-memory (x, y) arrays."""

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int):
        self.x, self.y = x, y
        self.batch_size = batch_size
        self.num_examples = len(x)

    def epoch(self, rng: Optional[np.random.RandomState] = None) -> Iterator[Batch]:
        order = _epoch_order(self.num_examples, rng)
        for start in range(0, self.num_examples, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield _pad(self.x[idx], self.y[idx], len(idx), self.batch_size)


class HDF5Loader:
    """Stream (videos, labels) batches from the HDF5 cache out-of-core.

    Labels are read once (tiny); video batches are gathered per step with
    h5py fancy indexing (which requires sorted indices — the gather reorders
    after the read so shuffling semantics match ArrayLoader exactly).
    """

    def __init__(self, path: str, batch_size: int,
                 indices: Optional[np.ndarray] = None):
        import h5py

        self.path = path
        self.batch_size = batch_size
        self._hf = h5py.File(path, "r")
        self._videos = self._hf["videos"]
        self.clip_shape = tuple(int(s) for s in self._videos.shape[1:])
        n_total = self._videos.shape[0]
        self.indices = (
            np.asarray(indices, np.int64)
            if indices is not None
            else np.arange(n_total, dtype=np.int64)
        )
        self.num_examples = len(self.indices)
        self.labels = np.asarray(self._hf["labels"])[self.indices]

    def epoch(self, rng: Optional[np.random.RandomState] = None) -> Iterator[Batch]:
        order = _epoch_order(self.num_examples, rng)
        for start in range(0, self.num_examples, self.batch_size):
            sel = order[start : start + self.batch_size]
            file_idx = self.indices[sel]
            sort = np.argsort(file_idx)
            gathered = self._videos[file_idx[sort]]
            xb = np.empty_like(gathered)
            xb[sort] = gathered  # undo the sorted-read reorder
            yield _pad(xb, self.labels[sel], len(sel), self.batch_size)

    def close(self):
        if self._hf is not None:
            self._hf.close()
            self._hf = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


_CC_HEADER_DTYPE = np.dtype([
    ("magic", "<u8"), ("num_clips", "<u8"), ("t", "<u8"), ("h", "<u8"),
    ("w", "<u8"), ("c", "<u8"), ("label_kind", "<u8"), ("label_dim", "<u8"),
])
# Must equal kMagic in native/clipcache.cpp ("VCTC1"); the round-trip test
# (native writer -> ClipCacheMapLoader) fails if the two ever diverge.
_CC_MAGIC = 0x5643544331


def _epoch_order(n: int, rng: Optional[np.random.RandomState]) -> np.ndarray:
    return rng.permutation(n) if rng is not None else np.arange(n)


def _read_cc_header(path: str):
    hd = np.fromfile(path, dtype=_CC_HEADER_DTYPE, count=1)
    if hd.size != 1 or hd[0]["magic"] != _CC_MAGIC:
        raise IOError(f"{path} is not a clip cache")
    return hd[0]


class ClipCacheMapLoader:
    """mmap view of the native clip cache with index subsets.

    Same on-disk format as ``native/clipcache.cpp`` (header, label block,
    clip block). Batches are gathered from the memory map, so resident
    memory stays O(batch) and warm pages come from the OS page cache.
    Yields uint8 clips — normalization happens on-device.
    """

    def __init__(self, path: str, batch_size: int,
                 indices: Optional[np.ndarray] = None):
        self.batch_size = batch_size
        hd = _read_cc_header(path)
        n = int(hd["num_clips"])
        t, h, w, c = (int(hd[k]) for k in ("t", "h", "w", "c"))
        self.clip_shape = (t, h, w, c)
        label_kind, label_dim = int(hd["label_kind"]), int(hd["label_dim"])
        lb = 8 if label_kind == 0 else 4 * label_dim
        cb = t * h * w * c
        want = _CC_HEADER_DTYPE.itemsize + n * (lb + cb)
        if os.path.getsize(path) != want:
            raise IOError(f"{path}: size {os.path.getsize(path)} != expected {want}")
        off = _CC_HEADER_DTYPE.itemsize
        if label_kind == 0:
            self.labels = np.fromfile(path, "<i8", count=n, offset=off)
        else:
            self.labels = np.fromfile(
                path, "<f4", count=n * label_dim, offset=off
            ).reshape(n, label_dim)
        self._clips = np.memmap(
            path, np.uint8, "r", offset=off + n * lb, shape=(n, t, h, w, c)
        )
        self.indices = (
            np.asarray(indices, np.int64)
            if indices is not None
            else np.arange(n, dtype=np.int64)
        )
        self.num_examples = len(self.indices)
        self.labels = self.labels[self.indices]

    def epoch(self, rng: Optional[np.random.RandomState] = None) -> Iterator[Batch]:
        order = _epoch_order(self.num_examples, rng)
        for start in range(0, self.num_examples, self.batch_size):
            sel = order[start : start + self.batch_size]
            xb = np.asarray(self._clips[self.indices[sel]])  # gather -> RAM copy
            yield _pad(xb, self.labels[sel], len(sel), self.batch_size)

    def close(self):
        self._clips = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ClipCacheStream:
    """Adapter over the native multithreaded prefetch loader
    (``vct.data.clipcache.ClipCacheLoader``): full-dataset epochs at maximum
    throughput. The native side owns shuffling (per-epoch permutation is a
    pure function of (seed, epoch)); the engine's rng is still consumed once
    per epoch so rng-based loaders stay in lockstep, and ``set_epoch``
    forwards the resume fast-forward to the native shuffle stream."""

    def __init__(self, loader):
        self.loader = loader
        self.batch_size = loader.batch_size
        self.num_examples = int(loader.num_clips)

    def set_epoch(self, epoch: int) -> None:
        self.loader.set_epoch(epoch)

    def epoch(self, rng: Optional[np.random.RandomState] = None) -> Iterator[Batch]:
        if rng is not None:
            rng.permutation(self.num_examples)  # keep the stream position
        for xb, yb in self.loader.epoch():
            yield _pad(xb, yb, len(xb), self.batch_size)


def as_loader(x, y=None, batch_size: int = 32):
    """Coerce (x, y) arrays or a loader-shaped object to the loader API."""
    if hasattr(x, "epoch") and hasattr(x, "num_examples"):
        return x
    if hasattr(x, "epoch") and hasattr(x, "num_clips"):  # native ClipCacheLoader
        return ClipCacheStream(x)
    if y is None:
        raise TypeError(f"not a loader and no labels given: {type(x)!r}")
    return ArrayLoader(np.asarray(x), np.asarray(y), batch_size)


def open_cache_loader(cfg, indices: Optional[np.ndarray] = None,
                      batch_size: Optional[int] = None):
    """Open the configured dataset cache as a streaming loader
    (clipcache -> ClipCacheMapLoader, hdf5 -> HDF5Loader)."""
    d = cfg.data
    bs = batch_size or cfg.train.batch_size
    if d.cache_format == "clipcache":
        return ClipCacheMapLoader(d.data_file, bs, indices)
    return HDF5Loader(d.data_file, bs, indices)


def cache_num_examples(cfg) -> int:
    """Number of examples in the configured cache without loading it."""
    d = cfg.data
    if d.cache_format == "clipcache":
        return int(_read_cc_header(d.data_file)["num_clips"])
    import h5py

    with h5py.File(d.data_file, "r") as hf:
        return hf["videos"].shape[0]
