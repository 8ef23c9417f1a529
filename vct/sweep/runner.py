"""Sweep executor (C16).

The reference's runner sed-patches ``all_config.py``, launches ``main.py`` as
a subprocess, and regex-scrapes seven metrics from its stdout
(``runner.py:9-135``). Here the default is **in-process**: overrides apply
immutably to the Config, training runs in the same process (no sed, no config
races — SURVEY.md §5 lists the sed-while-training race as a known hazard),
and metrics come back as structured values. A ``subprocess=True`` mode
launches ``python -m vct.train`` and scrapes stdout with the very same
patterns (``vct.core.metrics_contract.extract_metrics``) for contract parity.

Kept semantics: per-config repeat runs with best-F1 selection
(``runner.py:14,67``), the F1 keep threshold (``runner.py:67``: > 0.71),
best-model files named by their config (``runner.py:69-75``), and JSON
checkpoint appends after every improvement (``runner.py:82-96``).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from typing import Dict, List, Optional, Tuple

from vct.core.config import Config
from vct.core.metrics_contract import RunMetrics, extract_metrics
from vct.sweep.store import SweepStore

__all__ = ["SweepRunner"]


class SweepRunner:
    def __init__(
        self,
        base_cfg: Config,
        store: Optional[SweepStore] = None,
        data: Optional[tuple] = None,
        use_subprocess: bool = False,
    ):
        self.base_cfg = base_cfg
        self.store = store or SweepStore(base_cfg.sweep.checkpoint_file)
        self._data = data  # optional preloaded (x, y, class_names)
        self.use_subprocess = use_subprocess
        self.best_results: List[dict] = self.store.load()
        # Compiled train/eval/val steps shared across trials whose traced
        # computation is identical (see _trace_key): an lr/seed grid then
        # retraces NOTHING between trials. At reference sweep scale (664
        # entries, dumps/medsos_checkpoint.json) per-trial retracing is a
        # real tax; measured on this host: 5.3x faster for a 6-trial lr
        # grid (151.2s -> 28.3s, docs/performance.md).
        self._step_cache: Dict[tuple, tuple] = {}

    # ------------------------------------------------------------------
    def _train_once(self, cfg: Config) -> RunMetrics:
        if self.use_subprocess:
            return self._train_subprocess(cfg)
        return self._train_inprocess(cfg)

    @staticmethod
    def _trace_key(cfg: Config, weights) -> tuple:
        """Everything baked into the jitted step's TRACE.

        learning_rate / weight_decay are NOT here: optax.inject_hyperparams
        puts them in the optimizer STATE (engine._make_optimizer), so trials
        differing only in those reuse the compiled step. Input shapes are
        not here either — a reused jit-wrapped callable retraces per new
        shape under jax's own cache. What IS traced in: the whole model
        section (architecture, dropout, classif mode, finetune labels), the
        sequence length (build_model arg), optimizer kind, the grad-clip
        constant, loss weighting, and mesh donation."""
        import numpy as np

        return (
            tuple(sorted(cfg.to_dict()["model"].items())),
            cfg.data.sequence_length,
            cfg.train.optimizer,
            cfg.train.grad_clip,
            None if weights is None else np.asarray(weights).tobytes(),
            cfg.mesh.donate,
            cfg.train.feature_cache,  # baked into the traced step's apply
        )

    def _share_compiled_steps(self, trainer, key: tuple) -> None:
        """Install cached compiled steps into a fresh Trainer (or register
        this trainer's steps for the next trial with the same key)."""
        # Pre-set the feature-cache mode fit() will decide on, so the steps
        # built (or installed) here are the ones fit actually runs — without
        # this, a feature_cache sweep builds raw-clip steps, fit flips the
        # mode and discards them, and every trial retraces (the 5.3x
        # compiled-step reuse silently vanishes).
        trainer._feature_mode = bool(
            trainer.cfg.train.feature_cache
            and not trainer.cfg.model.finetune
            and getattr(trainer.model, "supports_feature_cache", False)
        )
        cached = self._step_cache.get(key)
        if cached is not None:
            trainer._train_step, trainer._eval_step, trainer._val_step = cached
            return
        if trainer._train_step is None:
            trainer._train_step = trainer._build_train_step()
        if trainer._eval_step is None:
            trainer._eval_step = trainer._build_eval_step()
        if trainer._val_step is None:
            trainer._val_step = trainer._build_val_step()
        self._step_cache[key] = (
            trainer._train_step, trainer._eval_step, trainer._val_step
        )

    def _train_inprocess(self, cfg: Config) -> RunMetrics:
        import jax
        import numpy as np

        from vct.data.batcher import train_test_split
        from vct.train.checkpoint import save_checkpoint
        from vct.train.engine import Trainer, compute_class_weights

        if cfg.data.stream and not cfg.data.synthetic and self._data is None:
            # Out-of-core sweep: every trial streams from the shared cache.
            return self._train_inprocess_stream(cfg)
        if self._data is not None:
            x, y, class_names = self._data
        else:
            from vct.train.__main__ import load_training_data

            x, y, class_names = load_training_data(cfg)
        x_tr, x_te, y_tr, y_te = train_test_split(
            x, y, cfg.data.val_fraction, cfg.data.split_seed
        )
        weights = None
        if cfg.train.weighted_loss:
            weights = compute_class_weights(
                y_tr, cfg.model.num_classes, cfg.model.classif_mode
            )
        trainer = Trainer(cfg, class_names, class_weights=weights)
        self._share_compiled_steps(trainer, self._trace_key(cfg, weights))
        state = trainer.init_state(jax.random.PRNGKey(cfg.train.seed), x_tr)
        val = (x_te, y_te) if (
            cfg.train.lr_plateau_factor or cfg.train.early_stop_patience
        ) else None
        state, run = trainer.fit(state, x_tr, y_tr, val=val)
        if cfg.train.save_model:
            save_checkpoint(
                cfg.train.model_path,
                {
                    "params": jax.device_get(state.params),
                    **jax.device_get(state.extra_vars),
                },
                cfg,
                class_names,
            )
        return trainer.evaluate(state, x_te, y_te, run=run)

    def _train_inprocess_stream(self, cfg: Config) -> RunMetrics:
        """Stream the trial from the dataset cache (shared session in
        vct.train.stream; cache built once, shared by every trial)."""
        from vct.train.stream import stream_train_eval

        _, metrics = stream_train_eval(cfg)
        return metrics

    def _train_subprocess(self, cfg: Config) -> RunMetrics:
        args = [sys.executable, "-m", "vct.train"]
        overrides = _diff_overrides(Config(), cfg)
        for key, value in overrides.items():
            args += [f"--{key}", str(value)]
        proc = subprocess.run(args, capture_output=True, text=True)
        log_path = cfg.sweep.log_file
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        with open(log_path, "a") as f:
            f.write(proc.stdout)
            if proc.stderr:
                f.write(f"Error Output:\n{proc.stderr}\n\n")
        return extract_metrics(proc.stdout)

    # ------------------------------------------------------------------
    def run_training(
        self, config: Dict, test_runs: Optional[int] = None
    ) -> Tuple[float, Optional[str]]:
        """Train ``config`` test_runs times; keep/record the best run.

        config: dotted-override dict, e.g. {"model.rnn_type": "lstm"}.
        Returns (best_f1, best_model_filename).
        """
        sweep = self.base_cfg.sweep
        test_runs = test_runs if test_runs is not None else sweep.test_runs
        best_f1 = -float("inf")
        best_model_filename = None

        for run_idx in range(test_runs):
            cfg = self.base_cfg.replace(**config)
            cfg = cfg.replace(**{"train.seed": str(cfg.train.seed + run_idx)})
            print(f"Applying config:\n{config}")
            try:
                metrics = self._train_once(cfg)
            except Exception as e:  # runner.py:57-64 logs and continues
                print(f"Error extracting metrics: {e}")
                continue
            print(
                f"Metrics: Accuracy={metrics.accuracy}, Precision={metrics.precision}, "
                f"Recall={metrics.recall}, F1={metrics.f1}, "
                f"Train Duration={metrics.training_duration}s, "
                f"Inference Duration={metrics.inference_duration}s"
            )
            if metrics.f1 > best_f1 and metrics.f1 > sweep.f1_threshold:
                best_f1 = metrics.f1
                best_model_filename = cfg.artifact_name("best_model")
                best_path = os.path.join(sweep.best_model_dir, best_model_filename)
                if cfg.train.save_model and os.path.exists(cfg.train.model_path):
                    os.makedirs(sweep.best_model_dir, exist_ok=True)
                    if os.path.exists(best_path):
                        shutil.rmtree(best_path)
                    shutil.copytree(cfg.train.model_path, best_path)
                    print(f"Saving best model: {best_model_filename}")
                entry = {
                    "config": dict(config),
                    "metrics": metrics.to_dict(),
                    "best_model_filename": best_model_filename,
                }
                self.best_results.append(entry)
                # O(1) journaled append (store compacts into the canonical
                # JSON periodically) — not a full-list rewrite per trial.
                self.store.append(entry)
            elif metrics.f1 > best_f1:
                best_f1 = metrics.f1
        return best_f1, best_model_filename

    def objective(self, config: Dict) -> float:
        """Single-run objective for strategy loops; returns F1 (records all)."""
        f1, _ = self.run_training(config, test_runs=1)
        return f1 if f1 != -float("inf") else 0.0


def _diff_overrides(base: Config, cfg: Config) -> Dict[str, str]:
    """Dotted overrides that transform base into cfg."""
    out = {}
    bd, cd = base.to_dict(), cfg.to_dict()
    for section, fields in cd.items():
        for key, value in fields.items():
            if bd[section][key] != value:
                out[f"{section}.{key}"] = value
    return out
