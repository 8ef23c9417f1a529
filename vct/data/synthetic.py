"""Synthetic data harness — the reference's own e2e smoke pattern
(``lrcn/mamba.py:440-457`` ``generate_dummy_data``): random clips + random
labels, enough to drive the full train/eval stack without a dataset."""

from __future__ import annotations

import numpy as np

__all__ = ["generate_dummy_data"]


def generate_dummy_data(
    num_samples: int = 32,
    sequence_length: int = 16,
    height: int = 64,
    width: int = 64,
    num_classes: int = 4,
    classif_mode: str = "multiclass",
    seed: int = 0,
):
    rng = np.random.RandomState(seed)
    x = rng.rand(num_samples, sequence_length, height, width, 3).astype(np.float32)
    if classif_mode == "multiclass":
        y = rng.randint(0, num_classes, size=(num_samples,)).astype(np.int64)
    else:
        y = (rng.rand(num_samples, num_classes) > 0.5).astype(np.float32)
    class_names = [f"class_{i}" for i in range(num_classes)]
    return x, y, class_names
