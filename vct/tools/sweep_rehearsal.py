"""Sweep-at-scale rehearsal: a >=24-trial TPE sweep on the real chip.

The reference's de-facto sweep benchmark is a 664-entry checkpoint store
grown by many-trial Optuna runs (``dumps/medsos_checkpoint.json``,
``hyperparam.py``). vct's sweeps were proven at toy trial counts; this
script rehearses the full production flow end to end at tens of trials on
real hardware:

  motion dataset -> real ingest (cv2 + HDF5) -> SweepRunner (in-process,
  compiled-step reuse, train.feature_cache) -> TPE (bayesian_optimization,
  JSONL trials journal) -> SweepStore JSONL journal -> explicit compaction
  into the reference-schema canonical JSON -> best .vct checkpoint artifact
  named by its config.

Run:  python -m vct.tools.sweep_rehearsal [--trials 24] [--out DIR]
Numbers from the recorded run live in docs/performance.md ("sweep at
scale").
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--out", default="/tmp/vct_sweep_rehearsal")
    args = ap.parse_args()

    import jax

    from vct.core.config import Config
    from vct.data.ingest import build_dataset_cache, load_dataset_cache
    from vct.data.synthetic import generate_motion_dataset
    from vct.sweep.runner import SweepRunner
    from vct.sweep.store import SweepStore
    from vct.sweep.strategies import bayesian_optimization

    out = args.out
    os.makedirs(out, exist_ok=True)
    root, cache = os.path.join(out, "videos"), os.path.join(out, "cache")

    cfg = Config().replace(**{
        "data.dataset_path": root,
        "data.processed_data_path": cache,
        "data.img_height": "64", "data.img_width": "64",
        "data.sequence_length": "4",
        "data.decode_workers": "0",
        "model.num_classes": "4",
        "model.rnn_input_size": "32",
        "model.mult_factor": "2",
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "lstm",
        "model.rnn_layer": "2",
        "model.rnn_out": "all",
        "model.dropout": "0.0",
        "train.batch_size": "8",
        "train.optimizer": "adam",
        "train.grad_clip": "0",
        "train.epochs": str(args.epochs),
        "train.early_stop_patience": "0",
        "train.feature_cache": "true",
        "train.weighted_loss": "true",
        "train.save_model": "true",
        "train.model_path": os.path.join(out, "trial_model"),
        "sweep.checkpoint_file": os.path.join(out, "checkpoint.json"),
        "sweep.best_model_dir": os.path.join(out, "best_models"),
        "sweep.log_file": os.path.join(out, "sweep.log"),
    })
    if not os.path.exists(root):
        generate_motion_dataset(
            root, clips_per_class=(16, 13, 13, 10), frames=16, size=64, seed=0
        )
    build_dataset_cache(cfg)
    x, y, names = load_dataset_cache(cfg)
    print(f"dataset: {x.shape} on backend={jax.default_backend()} "
          f"devices={jax.devices()}")

    store = SweepStore(cfg.sweep.checkpoint_file)
    runner = SweepRunner(cfg, store=store, data=(x, y, names))
    space = {
        # lr lives in the optimizer STATE (inject_hyperparams), batch size
        # only in input shapes — every trial reuses the same compiled steps.
        "train.learning_rate": {
            "type": "float", "low": 3e-4, "high": 1e-2, "log": True
        },
        "train.batch_size": [8, 16],
    }
    t0 = time.time()
    best = bayesian_optimization(
        runner, space, n_trials=args.trials, n_warmup=8, seed=0,
        trials_path=os.path.join(out, "tpe_trials.json"),
    )
    wall = time.time() - t0
    journal_lines = 0
    if os.path.exists(store.journal_path):
        with open(store.journal_path) as f:
            journal_lines = sum(1 for line in f if line.strip())
    store.compact()  # fold the JSONL journal into the canonical JSON
    canonical = json.load(open(store.path))
    summary = {
        "trials": args.trials,
        "wall_s": round(wall, 1),
        "s_per_trial": round(wall / args.trials, 2),
        "best_f1": best["metrics"]["f1_score"] if best else None,
        "best_model": best.get("best_model_filename") if best else None,
        "store_entries": len(canonical),
        "journal_lines_before_compaction": journal_lines,
        "backend": jax.default_backend(),
    }
    print(json.dumps(summary))
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
