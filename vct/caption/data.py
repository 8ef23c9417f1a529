"""Caption dataset (C25): annotation parsing + clip/caption batching.

Annotation format: one "video_id caption..." line per pair
(``s2vt/beam_search.py:183-205`` preprocess_annotations). Clips decode to a
fixed ``num_frames`` x 224 x 224 via interval sampling with last-frame padding
(``beam_search.py:143-180`` extract_frames). Captions tokenize, wrap in
<start>/<end>, and pad/truncate to ``max_caption_len``
(``beam_search.py:103-141``)."""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from vct.caption.vocab import Vocabulary, tokenize_caption

__all__ = [
    "preprocess_annotations",
    "encode_caption",
    "extract_frames_interval",
    "load_caption_dataset",
]


def preprocess_annotations(annotation_file: str) -> Tuple[List[Tuple[str, str]], List[str]]:
    """Returns ([(video_file, caption), ...], unique caption list).

    Captions dedupe in first-appearance order (NOT ``list(set(...))`` as in
    ``beam_search.py:183-205``): per-process string-hash salting makes set
    order nondeterministic, which would permute vocab ids between a run and
    its resume process."""
    annotations: List[Tuple[str, str]] = []
    sentences: List[str] = []
    seen = set()
    with open(annotation_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                print("Warning: Empty line encountered.")
                continue
            split_index = line.find(" ")
            if split_index == -1:
                print(f"Warning: Line does not contain a space separator: {line}")
                continue
            caption = line[split_index + 1 :]
            annotations.append((line[:split_index], caption))
            if caption not in seen:
                seen.add(caption)
                sentences.append(caption)
    return annotations, sentences


def encode_caption(caption: str, vocab: Vocabulary, max_len: int) -> np.ndarray:
    ids = [vocab["<start>"]] + vocab.numericalize(tokenize_caption(caption)) + [
        vocab["<end>"]
    ]
    if len(ids) >= max_len:
        ids = ids[:max_len]
    else:
        ids = ids + [vocab["<pad>"]] * (max_len - len(ids))
    return np.asarray(ids, np.int32)


def extract_frames_interval(
    path: str, target_frames: int = 30, size: int = 224
) -> np.ndarray:
    """Interval frame extraction with last-frame padding
    (beam_search.py:143-180). Returns (T, size, size, 3) float32 in [0,1]."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"Could not open video file {path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    interval = max(1, total // target_frames)
    frames, count = [], 0
    while True:
        ret, frame = cap.read()
        if not ret or len(frames) >= target_frames:
            break
        if count % interval == 0:
            frame = cv2.resize(frame, (size, size))
            frames.append(frame.astype(np.float32) / 255.0)
        count += 1
    cap.release()
    if not frames:
        raise ValueError(f"No frames found in {path}")
    while len(frames) < target_frames:
        frames.append(frames[-1])
    return np.stack(frames)


def load_caption_dataset(
    video_dir: str,
    annotation_file: str,
    vocab: Vocabulary,
    num_frames: int = 30,
    max_caption_len: int = 30,
    size: int = 224,
    video_ext: str = ".avi",
    limit: int = 0,
):
    """Returns (clips (N,T,H,W,3) f32, captions (N,L) i32, annotations)."""
    annotations, _ = preprocess_annotations(annotation_file)
    if limit:
        annotations = annotations[:limit]
    clips, caps, kept = [], [], []
    for video_file, caption in annotations:
        path = os.path.join(video_dir, video_file + video_ext)
        try:
            clips.append(extract_frames_interval(path, num_frames, size))
        except Exception as e:
            print(f"Error processing {video_file}: {e}")
            continue
        caps.append(encode_caption(caption, vocab, max_caption_len))
        kept.append((video_file, caption))
    x = np.stack(clips) if clips else np.zeros((0, num_frames, size, size, 3), np.float32)
    y = np.stack(caps) if caps else np.zeros((0, max_caption_len), np.int32)
    return x, y, kept
