"""Caption inference over a directory of videos (C30's deploy side).

The reference decodes eval clips one by one in host Python and prints
``Generated Caption: ...`` per video (``s2vt/beam_search.py:552-570``).
This module is that surface for vct: point it at a trained caption
checkpoint directory OR a compiled ``.vctaot`` caption artifact
(``vct.serve.aot``) and a directory of videos; clips decode host-side in
bounded chunks (O(chunk) resident, the out-of-core discipline of
``LazyCaptionLoader``) and the beam search runs jitted on device — or fully
inside the artifact's executable.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["caption_directory", "VIDEO_EXTS"]

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def _list_videos(video_dir: str, video_ext: Optional[str]) -> List[str]:
    exts = (video_ext.lower(),) if video_ext else VIDEO_EXTS
    return sorted(
        os.path.join(video_dir, f)
        for f in os.listdir(video_dir)
        if f.lower().endswith(exts)
    )


def _skip_errors():
    """Per-file decode failures worth skipping. cv2.error subclasses
    Exception directly — without it one corrupt stream that opens but then
    raises inside cv2 would abort the whole directory run."""
    errs = (ValueError, OSError, RuntimeError)
    try:
        import cv2

        return errs + (cv2.error,)
    except ImportError:  # native-decoder-only host
        return errs


def _decode_chunk(paths: List[str], num_frames: int, size: int):
    """(clips f32 [0,1], kept paths) — unreadable files skip with a print
    (the reference's defensive-skip style, loader_data.py:301-303).

    Only per-file decode failures are skipped; systemic errors (cv2 missing,
    OOM, Ctrl-C) propagate — otherwise a broken host prints one error per
    video and the CLI exits 0 having captioned nothing.
    """
    from vct.caption.data import extract_frames_interval

    clips, kept = [], []
    for p in paths:
        try:
            clips.append(extract_frames_interval(p, num_frames, size))
        except _skip_errors() as e:
            print(f"Error processing {os.path.basename(p)}: {e}")
            continue
        kept.append(p)
    return clips, kept


def _decode_chunk_raw(
    paths: List[str], raw_len: int, size: int, target_frames: int
):
    """(raw uint8 clips padded to raw_len, true lengths, kept paths) — the
    host half of the caption raw-artifact contract; same defensive-skip
    discipline as ``_decode_chunk``. ``target_frames`` lets over-capacity
    videos fall back to host interval extraction so they caption identically
    to the plain path (see ``extract_frames_raw``)."""
    from vct.caption.data import extract_frames_raw

    raws, lens, kept = [], [], []
    for p in paths:
        try:
            fr = extract_frames_raw(p, raw_len, size,
                                    target_frames=target_frames)
        except _skip_errors() as e:
            print(f"Error processing {os.path.basename(p)}: {e}")
            continue
        lens.append(len(fr))
        if len(fr) < raw_len:
            pad = np.zeros((raw_len - len(fr), size, size, 3), np.uint8)
            fr = np.concatenate([fr, pad])
        raws.append(fr)
        kept.append(p)
    return raws, lens, kept


def caption_directory(
    model_path: str,
    video_dir: str,
    beam_width: Optional[int] = None,
    video_ext: Optional[str] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    chunk: Optional[int] = None,
) -> List[Tuple[str, str]]:
    """Caption every video in ``video_dir``; returns [(path, caption), ...]
    and prints the reference's ``Generated Caption:`` line per video.

    ``model_path`` is a caption checkpoint directory (self-describing
    manifest: config + vocab) or a ``.vctaot`` caption artifact. Artifacts
    bake their geometry and beam width into the compiled executable, so for
    an artifact an explicit ``height``/``width``/``beam_width`` that differs
    from what was baked is an error (re-export to change them), never a
    silent ignore. For a checkpoint, geometry defaults to the reference's
    224x224 caption pipeline.

    ``chunk`` bounds how many clips are host-resident at once. Default:
    the artifact's largest compiled batch bucket (smaller chunks would be
    zero-padded up to a bucket inside the executable — wasted beam-search
    compute), or 8 for a checkpoint.
    """
    paths = _list_videos(video_dir, video_ext)
    if not paths:
        raise ValueError(
            f"no videos matching {video_ext or VIDEO_EXTS} in {video_dir}"
        )

    if not os.path.exists(model_path):
        raise FileNotFoundError(
            f"{model_path}: no such file or directory (expected a caption "
            "checkpoint directory or a .vctaot caption artifact)"
        )
    if os.path.isfile(model_path):  # a .vctaot caption artifact
        from vct.serve.aot import CaptionAotServable

        sv = CaptionAotServable.load(model_path)
        T, H, W, _ = sv.input_shape
        if beam_width is not None and beam_width != sv.beam_width:
            raise ValueError(
                f"beam_width={beam_width} but the artifact bakes in "
                f"beam_width={sv.beam_width}; re-export the artifact to "
                "change it (python -m vct.serve.aot --beam_width ...)"
            )
        for name, got, baked in (("height", height, H), ("width", width, W)):
            if got is not None and got != baked:
                raise ValueError(
                    f"{name}={got} but the artifact bakes in {name}={baked}; "
                    "re-export the artifact to change the geometry"
                )
        if H != W:
            raise ValueError(
                f"artifact geometry {H}x{W} is not square; the host frame "
                "extractor (extract_frames_interval) resizes square"
            )
        if chunk is None:
            chunk = sv.buckets[-1]

        if sv.device_sampling:
            # Raw contract: the artifact bakes interval selection in, so
            # the host only decodes + resizes; selection + /255 + beam
            # search run inside the executable.
            def caption_chunk(chunk_paths: List[str]):
                raws, lens, kept = _decode_chunk_raw(
                    chunk_paths, sv.raw_len, H, target_frames=T
                )
                if not raws:
                    return [], []
                return sv.caption_raw(np.stack(raws), lens), kept

        else:

            def caption_chunk(chunk_paths: List[str]):
                clips, kept = _decode_chunk(chunk_paths, T, H)
                if not clips:
                    return [], []
                return sv.caption(np.stack(clips)), kept

    else:
        from vct.caption.train import restore_caption_trainer

        height = 224 if height is None else height
        width = 224 if width is None else width
        if height != width:
            raise ValueError(
                f"geometry {height}x{width} is not square; the host frame "
                "extractor (extract_frames_interval) resizes square"
            )
        trainer, state, cfg = restore_caption_trainer(
            model_path, height=height, width=width
        )
        num_frames = cfg.num_frames
        ck_size = height
        if chunk is None:
            chunk = 8

        def caption_chunk(chunk_paths: List[str]):
            clips, kept = _decode_chunk(chunk_paths, num_frames, ck_size)
            if not clips:
                return [], []
            return (
                trainer.caption_videos(
                    state, np.stack(clips), beam_width=beam_width
                ),
                kept,
            )

    results: List[Tuple[str, str]] = []
    for start in range(0, len(paths), chunk):
        word_lists, kept = caption_chunk(paths[start : start + chunk])
        for p, words in zip(kept, word_lists):
            text = " ".join(words)
            print(f"{os.path.basename(p)} Generated Caption: {text}")
            results.append((p, text))
    if not results:
        # Every file was individually skipped: a directory of N corrupt
        # videos must not exit 0 having captioned nothing (the systemic
        # failure the per-file defensive skip exists to distinguish).
        raise RuntimeError(
            f"all {len(paths)} videos in {video_dir} failed to decode"
        )
    return results
