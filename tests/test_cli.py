"""CLI entry points (in-process): train, sweep, caption, and profiling utils.

The stdout metric contract is the reference automation layer's API
(runner.py:108-135); these tests drive the real mains and scrape their output
with the production patterns.
"""

import json
import sys

import numpy as np
import pytest

from vct.core.metrics_contract import extract_metrics


def _train_args(tmp_path, extra=()):
    return [
        "--data.synthetic", "true", "--data.synthetic_samples", "10",
        "--data.sequence_length", "3", "--data.img_height", "8",
        "--data.img_width", "8",
        "--model.cnn_backbone", "resnet18", "--model.rnn_type", "gru",
        "--model.rnn_input_size", "4", "--model.rnn_layer", "1",
        "--model.num_classes", "3",
        "--train.batch_size", "4", "--train.epochs", "1",
        "--train.model_path", str(tmp_path / "m"),
        "--train.save_model", "false",
        *extra,
    ]


@pytest.mark.slow
def test_train_cli_prints_scrapeable_metrics(tmp_path, capsys):
    from vct.train.__main__ import main

    assert main(_train_args(tmp_path)) == 0
    out = capsys.readouterr().out
    metrics = extract_metrics(out)  # raises if any pattern is missing
    assert metrics.training_duration > 0
    assert "Epoch 1/1" in out


@pytest.mark.slow
def test_train_cli_val_monitor(tmp_path, capsys):
    from vct.train.__main__ import main

    rc = main(_train_args(tmp_path, extra=(
        "--train.lr_plateau_factor", "0.1", "--train.epochs", "2",
    )))
    assert rc == 0
    out = capsys.readouterr().out
    assert "Validation Loss:" in out


@pytest.mark.slow
def test_sweep_cli_grid(tmp_path, capsys):
    from vct.sweep.__main__ import main

    space = tmp_path / "space.json"
    space.write_text(json.dumps({"model.rnn_type": ["gru"]}))
    rc = main([
        "--strategy", "grid", "--space", str(space),
        *_train_args(tmp_path),
        "--sweep.checkpoint_file", str(tmp_path / "sweep.json"),
        "--sweep.test_runs", "1", "--sweep.f1_threshold", "0.0",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Applying config" in out


@pytest.mark.slow
def test_caption_cli_synthetic(tmp_path, capsys):
    from vct.caption.__main__ import main

    rc = main([
        "--synthetic", "--backbone", "resnet18", "--cnn_output_size", "8",
        "--hidden_size", "8", "--num_frames", "2", "--max_caption_len", "4",
        "--epochs", "1", "--checkpoint_dir", str(tmp_path / "cap"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Average BLEU score" in out
    assert "Caption:" in out


def test_step_timer_and_history(tmp_path):
    from vct.utils.profiling import StepTimer, write_history

    timer = StepTimer()
    # one span of 2 steps + one span of 1 step -> 3 per-step samples
    timer.start()
    timer.step()
    timer.step()
    timer.sync()
    timer.start()
    timer.step()
    timer.sync()
    summary = timer.summary()
    assert summary["steps"] == 3
    assert summary["mean_ms"] >= 0
    # a span with no sync records nothing (dispatch-only latency is not a
    # step time)
    timer.start()
    timer.step()
    assert timer.summary()["steps"] == 3

    path = tmp_path / "hist.json"
    write_history(str(path), {"train_loss": [1.0, 0.5], "step_times": summary})
    loaded = json.loads(path.read_text())
    assert loaded["train_loss"] == [1.0, 0.5]


def test_persistent_compile_cache_helper(monkeypatch):
    """CLI mains point JAX at the persistent compile cache (cold remote
    compiles cost minutes over a tunneled chip) — but an explicit
    JAX_COMPILATION_CACHE_DIR, or an already-configured cache, wins."""
    import jax

    from vct.utils import compilecache

    # explicit env var -> untouched
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/user_choice")
    assert compilecache.enable_persistent_compile_cache() is None

    # no env var, cache already configured (the suite's conftest sets one
    # via the re-exec env, which jax read at import) -> untouched
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    prior = jax.config.jax_compilation_cache_dir
    if prior:
        assert compilecache.enable_persistent_compile_cache() is None

    # unconfigured -> set to the backend-appropriate persistent dir
    prior_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        path = compilecache.enable_persistent_compile_cache()
        assert path is not None
        assert jax.config.jax_compilation_cache_dir == path
        if jax.default_backend() == "cpu":
            # host-fingerprinted: a cache from another machine's CPU
            # features must be invisible, not SIGILL-fatal
            assert path.startswith(compilecache.CPU_CACHE_DIR)
        else:
            assert path == compilecache.TPU_CACHE_DIR
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prior_min
        )
