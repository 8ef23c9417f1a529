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


def _decode_chunk(paths: List[str], num_frames: int, size: int):
    """(clips f32 [0,1], kept paths) — unreadable files skip with a print
    (the reference's defensive-skip style, loader_data.py:301-303)."""
    from vct.caption.data import extract_frames_interval

    clips, kept = [], []
    for p in paths:
        try:
            clips.append(extract_frames_interval(p, num_frames, size))
        except Exception as e:
            print(f"Error processing {os.path.basename(p)}: {e}")
            continue
        kept.append(p)
    return clips, kept


def caption_directory(
    model_path: str,
    video_dir: str,
    beam_width: Optional[int] = None,
    video_ext: Optional[str] = None,
    height: int = 224,
    width: int = 224,
    chunk: int = 8,
) -> List[Tuple[str, str]]:
    """Caption every video in ``video_dir``; returns [(path, caption), ...]
    and prints the reference's ``Generated Caption:`` line per video.

    ``model_path`` is a caption checkpoint directory (self-describing
    manifest: config + vocab) or a ``.vctaot`` caption artifact. Artifacts
    bake their geometry and beam width in, so ``height``/``width``/
    ``beam_width`` apply to the checkpoint path only.
    """
    paths = _list_videos(video_dir, video_ext)
    if not paths:
        raise ValueError(
            f"no videos matching {video_ext or VIDEO_EXTS} in {video_dir}"
        )

    if os.path.isfile(model_path):  # a .vctaot caption artifact
        from vct.serve.aot import CaptionAotServable

        sv = CaptionAotServable.load(model_path)
        T, H, W, _ = sv.input_shape
        if H != W:
            raise ValueError(
                f"artifact geometry {H}x{W} is not square; the host frame "
                "extractor (extract_frames_interval) resizes square"
            )

        def decode_words(clips: np.ndarray) -> List[List[str]]:
            return sv.caption(clips)

        num_frames, size = T, H
    else:
        import json

        import jax

        from vct.caption.train import CaptionTrainer
        from vct.caption.vocab import Vocabulary
        from vct.core.config import CaptionConfig

        with open(os.path.join(model_path, "manifest.json")) as f:
            manifest = json.load(f)
        if "config" not in manifest:
            raise ValueError(
                f"{model_path}: caption checkpoint manifest has no 'config' "
                "(saved by an older vct) — re-save with the current trainer"
            )
        import dataclasses

        known = {f.name for f in dataclasses.fields(CaptionConfig)}
        cfg = CaptionConfig(
            **{k: v for k, v in manifest["config"].items() if k in known}
        )
        vocab = Vocabulary.from_dict(manifest["vocab"])
        trainer = CaptionTrainer(cfg, vocab)
        if height != width:
            raise ValueError(
                f"geometry {height}x{width} is not square; the host frame "
                "extractor (extract_frames_interval) resizes square"
            )
        sample_v = np.zeros((1, cfg.num_frames, height, width, 3), np.float32)
        sample_c = np.zeros((1, cfg.max_caption_len), np.int32)
        state = trainer.init_state(jax.random.PRNGKey(0), sample_v, sample_c)
        state, _, _ = trainer.load_checkpoint(model_path, state)

        def decode_words(clips: np.ndarray) -> List[List[str]]:
            return trainer.caption_videos(state, clips, beam_width=beam_width)

        num_frames, size = cfg.num_frames, height

    results: List[Tuple[str, str]] = []
    for start in range(0, len(paths), chunk):
        clips, kept = _decode_chunk(
            paths[start : start + chunk], num_frames, size
        )
        if not clips:
            continue
        for p, words in zip(kept, decode_words(np.stack(clips))):
            text = " ".join(words)
            print(f"{os.path.basename(p)} Generated Caption: {text}")
            results.append((p, text))
    return results
