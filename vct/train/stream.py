"""Shared out-of-core train/eval session (the data.stream=true path).

One implementation behind both ``python -m vct.train --data.stream true`` and
streaming sweep trials: ensure the dataset cache exists, split at the index
level, open streaming loaders for each side, train and evaluate through the
loader protocol, and always close the loaders (many trials share one
process).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from vct.core.config import Config
from vct.core.metrics_contract import RunMetrics

__all__ = ["stream_train_eval"]


def stream_train_eval(cfg: Config) -> Tuple[object, RunMetrics]:
    """Train + evaluate streaming from the configured cache.

    Returns (final TrainState, eval RunMetrics). The reference's HDF5-backed
    VideoDataset (loader_data.py:74-125) at scales where in-RAM loading
    breaks."""
    import jax

    from vct.data.ingest import ensure_cache
    from vct.data.loaders import (
        cache_num_examples,
        open_cache_loader,
        split_indices,
    )
    from vct.train.checkpoint import save_checkpoint
    from vct.train.engine import Trainer, compute_class_weights

    ensure_cache(cfg)
    class_names: List[str] = [
        str(c) for c in np.load(cfg.data.classes_file, allow_pickle=True)
    ]
    n = cache_num_examples(cfg)
    train_idx, test_idx = split_indices(
        n, cfg.data.val_fraction, cfg.data.split_seed
    )
    if len(train_idx) == 0:
        raise ValueError(
            f"empty train split: cache {cfg.data.data_file} has {n} clips and "
            f"data.val_fraction={cfg.data.val_fraction} leaves none for "
            "training"
        )
    train_loader = open_cache_loader(cfg, train_idx)
    test_loader = open_cache_loader(cfg, test_idx)
    print(f"Train: {len(train_idx)} clips, Test: {len(test_idx)} clips "
          f"(streaming from {cfg.data.data_file}), classes: {class_names}")
    try:
        weights = None
        if cfg.train.weighted_loss:
            weights = compute_class_weights(
                train_loader.labels, cfg.model.num_classes,
                cfg.model.classif_mode,
            )
            print("class weights:", weights)
        trainer = Trainer(cfg, class_names, class_weights=weights)
        # Sample shape comes from the cache header, NOT from peeking the
        # epoch generator: abandoning a generator is harmless for the mmap/
        # h5 loaders but would leak a prefetch epoch if a threaded loader
        # ever landed here.
        sample_x = np.zeros((1,) + train_loader.clip_shape, np.float32)
        state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), sample_x)
        val = test_loader if (
            cfg.train.lr_plateau_factor or cfg.train.early_stop_patience
        ) else None
        state, run = trainer.fit(state, train_loader, val=val)
        if cfg.train.save_model:
            path = save_checkpoint(
                cfg.train.model_path,
                {
                    "params": jax.device_get(state.params),
                    **jax.device_get(state.extra_vars),
                },
                cfg,
                class_names,
            )
            print(f"Model saved to {path}")
        metrics = trainer.evaluate(state, test_loader, run=run)
        return state, metrics
    finally:
        # Many trials share one process: leaked h5py handles / memmaps on the
        # shared cache would accumulate per trial.
        train_loader.close()
        test_loader.close()
