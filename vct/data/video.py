"""Host-side video decode.

OpenCV decode loop matching the reference (``loader_data.py:152-166``:
read -> resize -> BGR->RGB), kept on the host (video codecs don't run on
TPU), but parallelised across a process pool with prefetch so decode overlaps
device compute — the reference decodes serially in the training process
(SURVEY.md §3.1 flags this as the real bottleneck at high clip rates).

Note the reference passes ``(IMG_HEIGHT, IMG_WIDTH)`` to ``cv2.resize``,
whose argument order is (width, height) (``loader_data.py:162``) — harmless
for its square configs; we pass (width, height) correctly.
"""

from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import Iterable, List, Optional, Tuple

import numpy as np

__all__ = ["decode_video", "decode_uniform_seek", "decode_and_sample", "ParallelDecoder"]


def decode_video(
    path: str,
    height: int,
    width: int,
    max_frames: Optional[int] = None,
    to_rgb: bool = True,
    decoder: str = "cv2",
) -> List[np.ndarray]:
    """Decode a video into a list of resized HxWx3 uint8 RGB frames.

    decoder:
      * "cv2" (default): the reference's decode path — and the fastest here
        (cv2's ffmpeg wrapper measured faster than a hand-rolled
        libavcodec+swscale loop; docs/performance.md).
      * "native": the C++ ffmpeg decoder (vct.data.videodec) — exists so
        deployments can drop the opencv dependency entirely. Pixels are
        cv2-bit-exact when cv2 is present (source-size decode + cv2 resize),
        swscale-bilinear otherwise.
      * "auto": cv2 when importable, else the native decoder."""
    if to_rgb and decoder != "cv2":
        try:
            import cv2  # noqa: F401

            has_cv2 = True
        except ImportError:
            has_cv2 = False
        if decoder == "native" or not has_cv2:
            from vct.data import videodec

            return videodec.decode_video_native(
                path, height, width, max_frames,
                resize="cv2" if has_cv2 else "native",
            )
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Could not open video file {path}")
    frames: List[np.ndarray] = []
    while max_frames is None or len(frames) < max_frames:
        ret, frame = cap.read()
        if not ret:
            break
        frame = cv2.resize(frame, (width, height))
        if to_rgb:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        frames.append(frame)
    cap.release()
    return frames


def decode_uniform_seek(
    path: str, height: int, width: int, sequence_length: int
) -> List[np.ndarray]:
    """Seek-based uniform sampling: decode ONLY the T needed frames
    (``lrcn/backup_ucf50.py:48-68``: CAP_PROP_POS_FRAMES to i*interval).

    Selects the same indices as ``uniform_sampling`` (stride = total//T),
    so results match the decode-everything path whenever container seeking
    is frame-accurate; for long videos this reads T frames instead of all.
    Returns [] when the video is shorter than T (caller falls back)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Could not open video file {path}")
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if total < sequence_length or total <= 0:
            return []
        interval = total // sequence_length
        frames: List[np.ndarray] = []
        for i in range(sequence_length):
            cap.set(cv2.CAP_PROP_POS_FRAMES, i * interval)
            ret, frame = cap.read()
            if not ret:
                return []  # inaccurate metadata/seek: fall back
            frame = cv2.resize(frame, (width, height))
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        return frames
    finally:
        cap.release()


def decode_and_sample(
    path: str,
    height: int,
    width: int,
    sequence_length: int,
    sampling_method: str = "uniform",
    normalize: bool = True,
    decoder: str = "cv2",
) -> np.ndarray:
    """Full per-clip host pipeline: decode -> sample -> pad -> (T,H,W,3).

    Returns float32 in [0,1] when ``normalize`` (reference /255,
    loader_data.py:182) else uint8 (for the on-device preprocessing path,
    which does the normalize on TPU).
    """
    from vct.data.samplers import sample_frames

    if sampling_method == "uniform_seek":
        # Seek-decode only the T frames (backup_ucf50.py variant); fall back
        # to the full decode + pad path for short clips, failed seeks, or
        # cv2-free hosts (seeking needs cv2's VideoCapture).
        try:
            frames = decode_uniform_seek(path, height, width, sequence_length)
        except ImportError:
            frames = []
        if frames:
            clip = np.stack(frames).astype(np.float32 if normalize else np.uint8)
            if normalize:
                clip /= 255.0
            return clip
        sampling_method = "uniform"

    # Uniform sampling only needs the first T*interval frames when the
    # clip is long, but interval depends on total length — decode all for
    # parity with the reference's read-everything loop.
    frames = decode_video(path, height, width, decoder=decoder)
    if not frames:
        raise ValueError(f"No frames found in {path}")
    frames = sample_frames(frames, sequence_length, sampling_method)
    clip = np.stack(frames).astype(np.float32 if normalize else np.uint8)
    if normalize:
        clip /= 255.0
    return clip


def _decode_one(args) -> Tuple[str, Optional[np.ndarray], str]:
    path, h, w, t, method, normalize, decoder = args
    try:
        return path, decode_and_sample(path, h, w, t, method, normalize, decoder), ""
    except Exception as e:  # defensive-skip style of the reference
        return path, None, str(e)


class ParallelDecoder:
    """Process-pool decode with bounded in-flight prefetch."""

    def __init__(self, workers: int = 4, decoder: str = "cv2"):
        self.workers = max(1, workers)
        self.decoder = decoder

    def decode_many(
        self,
        paths: Iterable[str],
        height: int,
        width: int,
        sequence_length: int,
        sampling_method: str = "uniform",
        normalize: bool = True,
        on_error=None,
    ):
        """Yields (path, clip) in input order, skipping failed clips."""
        jobs = [
            (p, height, width, sequence_length, sampling_method, normalize,
             self.decoder)
            for p in paths
        ]

        def emit(path, clip, err):
            if clip is None:
                if on_error is not None:
                    on_error(path, err)
                else:
                    print(f"Error processing {os.path.basename(path)}: {err}")
                return None
            return path, clip

        if self.workers == 1 or len(jobs) <= 1:
            for job in jobs:
                out = emit(*_decode_one(job))
                if out is not None:
                    yield out
            return

        # Bounded in-flight window: at most workers*4 decoded clips buffered
        # ahead of the consumer (a decoded float32 clip is MBs; unbounded
        # submission would balloon RSS on large classes). Results yield in
        # input order. The pool is always shut down.
        from collections import deque

        window = self.workers * 4
        with ProcessPoolExecutor(max_workers=self.workers) as pool:
            pending = deque()
            job_iter = iter(jobs)
            for job in job_iter:
                pending.append(pool.submit(_decode_one, job))
                if len(pending) >= window:
                    break
            while pending:
                out = emit(*pending.popleft().result())
                nxt = next(job_iter, None)
                if nxt is not None:
                    pending.append(pool.submit(_decode_one, nxt))
                if out is not None:
                    yield out
