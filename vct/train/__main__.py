"""Training entry point: ``python -m vct.train [--config file] [--a.b v ...]``.

The counterpart of ``medsos_lrcn/src/main.py:52-171``: load (or synthesize)
the dataset, split, build the model, train with the configured loss, print the
reference-compatible metric block, save the checkpoint.
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from vct.core.config import Config, load_config, parse_cli_overrides
from vct.data.batcher import train_test_split
from vct.data.synthetic import generate_dummy_data
from vct.train.checkpoint import save_checkpoint
from vct.train.engine import Trainer, compute_class_weights


def load_training_data(cfg: Config):
    """Returns (x, y, class_names)."""
    if cfg.data.synthetic:
        return generate_dummy_data(
            num_samples=cfg.data.synthetic_samples,
            sequence_length=cfg.data.sequence_length,
            height=cfg.data.img_height,
            width=cfg.data.img_width,
            num_classes=cfg.model.num_classes,
            classif_mode=cfg.model.classif_mode,
            seed=cfg.train.seed,
        )
    from vct.data.ingest import load_or_build_dataset

    return load_or_build_dataset(cfg)


def _main_stream(cfg: Config) -> int:
    """Out-of-core path (data.stream=true): delegate to the shared session."""
    from vct.train.stream import stream_train_eval

    stream_train_eval(cfg)
    return 0


def main(argv=None) -> int:
    # Cold remote compiles of the production train step cost minutes over a
    # tunneled chip; repeat invocations must hit the persistent cache.
    from vct.utils.compilecache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    config_path = None
    if "--config" in argv:
        i = argv.index("--config")
        if i + 1 >= len(argv):
            raise SystemExit("--config requires a path argument")
        config_path = argv[i + 1]
        del argv[i : i + 2]
    cfg = load_config(config_path, parse_cli_overrides(argv))

    if cfg.data.stream and not cfg.data.synthetic:
        return _main_stream(cfg)

    x, y, class_names = load_training_data(cfg)
    x_train, x_test, y_train, y_test = train_test_split(
        x, y, cfg.data.val_fraction, cfg.data.split_seed
    )
    print(f"Train: {x_train.shape}, Test: {x_test.shape}, classes: {class_names}")

    weights = None
    if cfg.train.weighted_loss:
        weights = compute_class_weights(
            y_train, cfg.model.num_classes, cfg.model.classif_mode
        )
        print("class weights:", weights)

    trainer = Trainer(cfg, class_names, class_weights=weights)
    state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), x_train)
    # The VideoMambaTrainer recipe monitors the held-out loss per epoch for
    # the plateau scheduler / early stop (lrcn/mamba.py:374-420) — pass the
    # held-out split as val when either monitor is configured.
    val = (x_test, y_test) if (
        cfg.train.lr_plateau_factor or cfg.train.early_stop_patience
    ) else None
    state, run = trainer.fit(state, x_train, y_train, val=val)
    if cfg.train.save_model:
        path = save_checkpoint(
            cfg.train.model_path,
            {"params": jax.device_get(state.params), **jax.device_get(state.extra_vars)},
            cfg,
            class_names,
        )
        print(f"Model saved to {path}")
    trainer.evaluate(state, x_test, y_test, run=run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
