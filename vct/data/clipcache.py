"""Python bindings for the native clip cache (``native/clipcache.cpp``).

A memory-mapped uint8 clip store with a multithreaded prefetching batch
loader — the framework's native-runtime replacement for the reference's
h5py-random-access training input path (``loader_data.py:74-125``). Clips
stay uint8 on disk and over the host->device copy; normalization happens on
the TPU (``vct.data.preprocess`` / the Pallas normalize kernel).

The shared library builds on first use with g++ (cached next to the source);
ctypes keeps the GIL out of the gather threads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["ClipCacheWriter", "ClipCacheLoader", "build_library", "write_clipcache"]

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "clipcache.cpp",
)
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libclipcache.so")
_lib = None


def build_library(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    if force or not os.path.exists(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        _locked_build(_SRC, _LIB_PATH, [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC,
        ])
    return _LIB_PATH

def _locked_build(src: str, lib_path: str, cmd) -> None:
    """Compile under an exclusive file lock with an atomic rename, so
    concurrent processes (ParallelDecoder workers) never dlopen a
    half-written library."""
    import fcntl
    import os as _os

    lock_path = lib_path + ".lock"
    with open(lock_path, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        try:
            # another process may have finished the build while we waited
            if _os.path.exists(lib_path) and (
                _os.path.getmtime(lib_path) >= _os.path.getmtime(src)
            ):
                return
            tmp = lib_path + f".tmp.{_os.getpid()}"
            subprocess.run(cmd + ["-o", tmp], check=True,
                           capture_output=True, text=True)
            _os.replace(tmp, lib_path)
        finally:
            fcntl.flock(lock, fcntl.LOCK_UN)



def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(build_library())
    i64, u64, p = ctypes.c_int64, ctypes.c_uint64, ctypes.c_void_p
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.ccw_open.restype = p
    lib.ccw_open.argtypes = [ctypes.c_char_p, i64, i64, i64, i64, i64, i64]
    lib.ccw_append.restype = ctypes.c_int
    lib.ccw_append.argtypes = [p, u8p, ctypes.POINTER(i64), ctypes.POINTER(ctypes.c_float)]
    lib.ccw_close.restype = ctypes.c_int
    lib.ccw_close.argtypes = [p]
    lib.ccl_open.restype = p
    lib.ccl_open.argtypes = [ctypes.c_char_p, i64, ctypes.c_int, u64,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ccl_num_clips.restype = i64
    lib.ccl_num_clips.argtypes = [p]
    lib.ccl_num_batches.restype = i64
    lib.ccl_num_batches.argtypes = [p]
    lib.ccl_dims.restype = None
    lib.ccl_dims.argtypes = [p, ctypes.POINTER(i64)]
    lib.ccl_next.restype = i64
    lib.ccl_next.argtypes = [p, u8p, u8p, i64]
    lib.ccl_next_epoch.restype = None
    lib.ccl_next_epoch.argtypes = [p]
    lib.ccl_set_epoch.restype = None
    lib.ccl_set_epoch.argtypes = [p, i64]
    lib.ccl_close.restype = None
    lib.ccl_close.argtypes = [p]
    _lib = lib
    return lib


class ClipCacheWriter:
    """Stream (T, H, W, C) uint8 clips + labels into a cache file."""

    def __init__(self, path: str, t: int, h: int, w: int, c: int = 3,
                 label_dim: int = 0):
        """label_dim=0 -> int64 class labels; >0 -> float32 label vectors."""
        self._lib = _load()
        self.shape = (t, h, w, c)
        self.label_dim = label_dim
        self._handle = self._lib.ccw_open(
            path.encode(), t, h, w, c, 0 if label_dim == 0 else 1, label_dim
        )
        if not self._handle:
            raise IOError(f"could not open {path} for writing")

    def append(self, clip: np.ndarray, label) -> None:
        clip = np.ascontiguousarray(clip, np.uint8)
        if clip.shape != self.shape:
            raise ValueError(f"clip shape {clip.shape} != {self.shape}")
        clip_p = clip.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if self.label_dim == 0:
            lab = ctypes.c_int64(int(label))
            rc = self._lib.ccw_append(self._handle, clip_p, ctypes.byref(lab), None)
        else:
            flab = np.ascontiguousarray(label, np.float32)
            if flab.shape != (self.label_dim,):
                raise ValueError(f"label shape {flab.shape} != ({self.label_dim},)")
            rc = self._lib.ccw_append(
                self._handle, clip_p, None,
                flab.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        if rc != 0:
            raise IOError("append failed")

    def close(self) -> None:
        if self._handle:
            handle, self._handle = self._handle, None
            # Clear the handle FIRST: ccw_close always frees the native
            # writer, so a raise here must not let a later close() (e.g.
            # the with-block __exit__ after an explicit close) double-free.
            if self._lib.ccw_close(handle) != 0:
                raise IOError("finalize failed")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class ClipCacheLoader:
    """Iterate shuffled uint8 batches assembled by native worker threads."""

    def __init__(self, path: str, batch_size: int, shuffle: bool = True,
                 seed: int = 0, workers: int = 4, drop_last: bool = False,
                 prefetch_depth: int = 3):
        self._lib = _load()
        self._handle = self._lib.ccl_open(
            path.encode(), batch_size, int(shuffle), seed, workers,
            int(drop_last), prefetch_depth,
        )
        if not self._handle:
            raise IOError(f"could not open clip cache {path}")
        self.batch_size = batch_size
        dims = (ctypes.c_int64 * 6)()
        self._lib.ccl_dims(self._handle, dims)
        self.t, self.h, self.w, self.c = dims[0], dims[1], dims[2], dims[3]
        self.label_kind, self.label_dim = dims[4], dims[5]
        self.num_clips = self._lib.ccl_num_clips(self._handle)

    @property
    def num_batches(self) -> int:
        return self._lib.ccl_num_batches(self._handle)

    def set_epoch(self, epoch: int) -> None:
        """Jump the native shuffle stream to ``epoch`` (checkpoint resume):
        each epoch's permutation is a pure function of (seed, epoch), so a
        resumed run replays exactly what an uninterrupted run would see."""
        self._lib.ccl_set_epoch(self._handle, epoch)

    def epoch(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (clips uint8 (n,T,H,W,C), labels) for one epoch, then
        prepare the next epoch (reshuffled)."""
        clips = np.empty((self.batch_size, self.t, self.h, self.w, self.c), np.uint8)
        if self.label_kind == 0:
            labels = np.empty((self.batch_size,), np.int64)
        else:
            labels = np.empty((self.batch_size, self.label_dim), np.float32)
        clips_p = clips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        labels_p = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        consumed = 0
        try:
            while True:
                n = self._lib.ccl_next(self._handle, clips_p, labels_p, consumed)
                if n <= 0:
                    break
                consumed += 1
                yield clips[:n].copy(), labels[:n].copy()
        finally:
            # Always reset the native side — abandoning the generator
            # mid-epoch (exception, break) must not wedge the next epoch.
            if self._handle:
                self._lib.ccl_next_epoch(self._handle)

    def close(self) -> None:
        if self._handle:
            self._lib.ccl_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_clipcache(path: str, clips_u8: np.ndarray, labels: np.ndarray) -> str:
    """Convenience: write an (N, T, H, W, C) uint8 array + labels."""
    n, t, h, w, c = clips_u8.shape
    label_dim = 0 if labels.ndim == 1 else labels.shape[1]
    with ClipCacheWriter(path, t, h, w, c, label_dim) as writer:
        for i in range(n):
            writer.append(clips_u8[i], labels[i])
    return path
