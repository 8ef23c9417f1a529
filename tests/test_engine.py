"""Train/eval engine tests: e2e smoke (loss decreases), metric parity with
sklearn, class weights, param counting, checkpoint roundtrip, mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.core.config import Config
from vct.data.synthetic import generate_dummy_data
from vct.train.engine import Trainer, compute_class_weights, count_parameters
from vct.train.metrics import (
    multiclass_confusion,
    multiclass_metrics,
    multilabel_counts,
    multilabel_metrics,
)


def _tiny_cfg(**over):
    base = {
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "lstm",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "data.sequence_length": "4",
        "data.img_height": "32",
        "data.img_width": "32",
        "train.batch_size": "8",
        "train.epochs": "3",
        "train.learning_rate": "0.003",
        "train.save_model": "false",
    }
    base.update(over)
    return Config().replace(**base)


@pytest.mark.slow
def test_e2e_train_loss_decreases(capsys):
    cfg = _tiny_cfg()
    x, y, names = generate_dummy_data(
        num_samples=24, sequence_length=4, height=32, width=32, num_classes=4
    )
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    state, run = tr.fit(state, x, y)
    assert run.epoch_losses[-1] < run.epoch_losses[0]
    m = tr.evaluate(state, x, y, run=run)
    out = capsys.readouterr().out
    # stdout contract intact end-to-end
    from vct.core.metrics_contract import extract_metrics

    scraped = extract_metrics(out)
    assert scraped.trainable_params == run.trainable_params
    assert 0.0 <= m.accuracy <= 1.0


@pytest.mark.slow
def test_e2e_multiple_binary(capsys):
    cfg = _tiny_cfg(**{"model.classif_mode": "multiple_binary"})
    x, y, names = generate_dummy_data(
        num_samples=16, sequence_length=4, height=32, width=32,
        num_classes=3, classif_mode="multiple_binary",
    )
    cfg = cfg.replace(**{"model.num_classes": "3"})  # match the 3-class data
    tr = Trainer(cfg, names[:3])
    state = tr.init_state(jax.random.PRNGKey(0), x)
    state, run = tr.fit(state, x, y)
    m = tr.evaluate(state, x, y, run=run)
    out = capsys.readouterr().out
    assert "Overall F1-Score:" in out
    assert 0.0 <= m.accuracy <= 1.0


def test_multiclass_metrics_match_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    C = 4
    labels = rng.randint(0, C, 50)
    logits = rng.randn(50, C).astype(np.float32)
    conf = multiclass_confusion(jnp.asarray(logits), jnp.asarray(labels), C)
    ours = multiclass_metrics(np.asarray(conf), [str(i) for i in range(C)])
    preds = logits.argmax(-1)
    p, r, f, _ = sklearn_metrics.precision_recall_fscore_support(
        labels, preds, average="macro", zero_division=0
    )
    assert ours.precision == pytest.approx(p, abs=1e-6)
    assert ours.recall == pytest.approx(r, abs=1e-6)
    assert ours.f1 == pytest.approx(f, abs=1e-6)
    assert ours.accuracy == pytest.approx((preds == labels).mean(), abs=1e-6)


def test_multiclass_macro_skips_absent_classes():
    """sklearn (and so the reference's labels-free macro call,
    train_eval.py:112-113) averages over classes present in labels or
    predictions — absent classes must not drag the macro to zero."""
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    C = 6
    labels = rng.randint(0, 4, 40)  # classes 4, 5 absent
    logits = rng.randn(40, C).astype(np.float32)
    logits[:, 4:] = -100.0  # never predicted either
    conf = multiclass_confusion(jnp.asarray(logits), jnp.asarray(labels), C)
    ours = multiclass_metrics(np.asarray(conf), [str(i) for i in range(C)])
    preds = logits.argmax(-1)
    p, r, f, _ = sklearn_metrics.precision_recall_fscore_support(
        labels, preds, average="macro", zero_division=0
    )
    assert ours.f1 == pytest.approx(f, abs=1e-6)
    assert ours.precision == pytest.approx(p, abs=1e-6)


def test_multilabel_metrics_match_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(1)
    C = 3
    labels = (rng.rand(40, C) > 0.5).astype(np.float32)
    logits = rng.randn(40, C).astype(np.float32)
    counts, exact = multilabel_counts(jnp.asarray(logits), jnp.asarray(labels))
    ours = multilabel_metrics(np.asarray(counts), float(exact), 40.0,
                              [str(i) for i in range(C)])
    preds = (1 / (1 + np.exp(-logits)) > 0.5).astype(np.float32)
    p, r, f, _ = sklearn_metrics.precision_recall_fscore_support(
        labels, preds, average="macro", zero_division=0
    )
    assert ours.precision == pytest.approx(p, abs=1e-6)
    assert ours.f1 == pytest.approx(f, abs=1e-6)
    assert ours.accuracy == pytest.approx(
        np.all(preds == labels, axis=1).mean(), abs=1e-6
    )


def test_class_weights():
    y = np.array([0, 0, 0, 1, 2, 2])
    w = compute_class_weights(y, 3, "multiclass")
    # sklearn 'balanced': n / (C * bincount)
    np.testing.assert_allclose(w, [6 / 9, 6 / 3, 6 / 6], rtol=1e-6)
    yb = np.array([[1, 0], [1, 0], [0, 1], [1, 0]], np.float32)
    pw = compute_class_weights(yb, 2, "multiple_binary")
    np.testing.assert_allclose(pw, [1 / 3, 3 / 1], rtol=1e-6)


@pytest.fixture(scope="module")
def resnet_trainer():
    """One shared resnet18 init for the tests that only inspect the frozen
    backbone (init is the expensive part; fit is functional so sharing the
    state is safe — donation is off so fit can't invalidate the buffers)."""
    cfg = _tiny_cfg(**{"train.epochs": "1", "mesh.donate": "false"})
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    return tr, state, x, y


def test_count_parameters_frozen_split(resnet_trainer):
    _, state, _, _ = resnet_trainer
    counts = count_parameters(state.params, finetune=False)
    assert counts["Non-trainable parameters"] > 10_000_000  # resnet18 ~11.2M
    assert counts["Trainable parameters"] > 0
    assert counts["Total parameters"] == (
        counts["Trainable parameters"] + counts["Non-trainable parameters"]
    )
    # finetune=True counts everything trainable
    ft = count_parameters(state.params, finetune=True)
    assert ft["Non-trainable parameters"] == 0


def test_frozen_backbone_unchanged_after_training(resnet_trainer):
    tr, state, x, y = resnet_trainer
    before = jax.device_get(state.params["cnn_backbone"])
    state, _ = tr.fit(state, x, y, log=False)
    after = jax.device_get(state.params["cnn_backbone"])
    for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from vct.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = _tiny_cfg(**{"train.epochs": "1"})
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.extra_vars)}
    path = save_checkpoint(str(tmp_path / "ckpt"), variables, cfg, names,
                           metrics={"f1_score": 0.5})
    loaded, cfg2, names2, manifest = load_checkpoint(path)
    assert names2 == names
    assert cfg2.model.rnn_type == cfg.model.rnn_type
    assert manifest["metrics"]["f1_score"] == 0.5
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loaded variables drive the same model
    from vct.models import build_model

    model = build_model(cfg2.model, cfg2.data.sequence_length)
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, loaded), jnp.asarray(x[:2]))
    assert out.shape == (2, 4)


@pytest.mark.slow
def test_dp_tp_mesh_training_step():
    """8 virtual devices: dp=4 x tp=2 sharded train step runs and matches the
    single-device loss."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from vct.parallel.mesh import make_mesh, shard_batch
    from vct.parallel.shard import shard_state_like_params

    cfg = _tiny_cfg(**{"train.batch_size": "8", "mesh.donate": "false"})
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)

    # single-device-style (mesh over 1 device)
    mesh1 = make_mesh(jax.devices()[:1], data=1, model=1)
    tr1 = Trainer(cfg, names, mesh=mesh1)
    s1 = tr1.init_state(jax.random.PRNGKey(0), x)
    step1 = tr1._build_train_step()
    xb, yb, mb = jnp.asarray(x), jnp.asarray(y), jnp.ones(8, jnp.float32)
    _, loss1, _, _ = step1(s1, xb, yb, mb)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tr = Trainer(cfg, names, mesh=mesh)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    state = shard_state_like_params(state, mesh)
    step = tr._build_train_step()
    sxb, syb, smb = shard_batch((xb, yb, mb), mesh)
    state, loss, c, n = step(state, sxb, syb, smb)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(loss1), rtol=2e-4, atol=2e-4)


def test_auc_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    from vct.train.metrics import macro_auc

    rng = np.random.RandomState(0)
    C = 4
    labels = rng.randint(0, C, 60)
    logits = rng.randn(60, C)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ours = macro_auc(probs, labels, C)
    want = sklearn_metrics.roc_auc_score(labels, probs, multi_class="ovr")
    assert ours == pytest.approx(want, abs=1e-9)


def test_evaluate_with_auc(resnet_trainer, capsys):
    tr, state, x, y = resnet_trainer
    state, run = tr.fit(state, x, y, log=False)
    m = tr.evaluate(state, x, y, run=run, compute_auc=True)
    out = capsys.readouterr().out
    assert "AUC:" in out
    assert 0.0 <= m.per_class["__auc__"]["auc"] <= 1.0


def test_auc_tie_handling_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    from vct.train.metrics import macro_auc

    # saturated probs with many ties
    labels = np.array([0, 0, 1, 1, 1, 0, 1, 0])
    probs = np.array([
        [1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 0.0],
        [0.5, 0.5], [0.5, 0.5], [1.0, 0.0], [0.0, 1.0],
    ])
    ours = macro_auc(probs, labels, 2)
    want = sklearn_metrics.roc_auc_score(labels, probs[:, 1])
    # macro over 2 complementary binary columns == the binary AUC
    assert ours == pytest.approx(want, abs=1e-9)


class TestValPlateau:
    """Per-epoch validation + ReduceLROnPlateau (lrcn/mamba.py:374-420,474-476)."""

    def _cfg(self, tmp_path, **over):
        # The plateau/val logic is model-family-independent; the tiny
        # from-scratch LRCN2 keeps these engine-loop tests off the resnet18
        # init/compile cost (measured ~30 s of fast-lane time).
        base = {
            "model.model_family": "lrcn2",
            "model.hidden_size": "4",
            "model.num_classes": "3",
            "data.sequence_length": "3",
            "data.img_height": "8",
            "data.img_width": "8",
            "train.batch_size": "4",
            "train.save_model": "false",
            "train.model_path": str(tmp_path / "m"),
        }
        base.update(over)
        from vct.core.config import Config

        return Config().replace(**base)

    def _data(self, n=12, seed=0):
        rng = np.random.RandomState(seed)
        x = rng.rand(n, 3, 8, 8, 3).astype(np.float32)
        y = rng.randint(0, 3, n).astype(np.int64)
        return x, y

    def test_val_loss_recorded_and_drives_patience(self, tmp_path):
        x, y = self._data()
        xv, yv = self._data(6, seed=1)
        cfg = self._cfg(tmp_path, **{"train.epochs": "3",
                                     "train.early_stop_patience": "1"})
        tr = Trainer(cfg, ["a", "b", "c"])
        s = tr.init_state(jax.random.PRNGKey(0), x)
        s, run = tr.fit(s, x, y, log=False, val=(xv, yv))
        assert len(run.val_losses) == len(run.epoch_losses)
        assert all(np.isfinite(v) for v in run.val_losses)

    def test_plateau_reduces_learning_rate(self, tmp_path):
        import optax.tree_utils as otu

        x, y = self._data()
        # constant val set + patience 1 on a tiny lr: val loss will plateau.
        # This one test needs the FROZEN-backbone family: lrcn2's train-mode
        # BatchNorm keeps nudging the val loss by > the 1e-6 plateau
        # threshold every epoch, so it never plateaus at tiny lr.
        cfg = self._cfg(tmp_path, **{
            "model.model_family": "lrcn",
            "model.cnn_backbone": "resnet18",
            "model.rnn_type": "gru",
            "model.rnn_input_size": "4",
            "model.rnn_layer": "1",
            "train.epochs": "3",  # epoch 1 sets best, 2 goes bad, 3 observes
            "train.learning_rate": "1e-12",  # no real progress -> plateau
            "train.lr_plateau_factor": "0.1",
            "train.lr_plateau_patience": "1",
        })
        tr = Trainer(cfg, ["a", "b", "c"])
        s = tr.init_state(jax.random.PRNGKey(0), x)
        lr0 = float(otu.tree_get(s.opt_state, "learning_rate"))
        s, run = tr.fit(s, x, y, log=False, val=(x, y))
        lr1 = float(otu.tree_get(s.opt_state, "learning_rate"))
        assert lr1 < lr0  # reduced at least once
        assert lr1 == pytest.approx(lr0 * 0.1, rel=1e-3) or lr1 < lr0 * 0.1

    def test_lr_in_state_trains_identically(self, tmp_path):
        """inject_hyperparams must not change training numerics."""
        x, y = self._data()
        cfg = self._cfg(tmp_path, **{"train.epochs": "2"})
        tr = Trainer(cfg, ["a", "b", "c"])
        s = tr.init_state(jax.random.PRNGKey(0), x)
        s, run = tr.fit(s, x, y, log=False)
        assert run.epoch_losses[1] < run.epoch_losses[0] * 1.5  # sane training


def test_scratch_model_batchnorm_trains():
    """LRCN2's BatchNorm runs on batch statistics during training and its
    running stats update through the train step (the reference trains
    nn.BatchNorm2d in train() mode, backup_ucf50.py:118-141); the frozen
    pretrained backbones keep eval-mode BN."""
    import jax
    import numpy as np

    from vct.core.config import Config

    cfg = Config().replace(**{
        "model.model_family": "lrcn2", "model.num_classes": "3",
        "model.hidden_size": "8", "data.sequence_length": "4",
        "data.img_height": "32", "data.img_width": "32",
        "train.batch_size": "8", "train.epochs": "1",
        "train.save_model": "false",
    })
    x, y, names = generate_dummy_data(16, 4, 32, 32, 3)
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    before = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.extra_vars)
    )
    state, _ = tr.fit(state, x, y, log=False)
    after = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.extra_vars)
    )
    assert any(not np.allclose(a, b) for a, b in zip(after, before))


@pytest.mark.slow
def test_resume_after_early_stop_does_not_train_further(tmp_path):
    """A checkpointed run that early-stopped must stay stopped on re-invoke
    (training more epochs would diverge from the uninterrupted run)."""
    import jax

    from vct.core.config import Config

    x, y, names = generate_dummy_data(8, 4, 32, 32, 3)
    base = {
        "model.cnn_backbone": "resnet18", "model.num_classes": "3",
        "model.rnn_input_size": "4", "model.rnn_layer": "1",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.epochs": "4", "train.save_model": "false",
        "train.resume": "true",
        "train.model_path": str(tmp_path / "ck"),
        "train.early_stop": "1e9",  # any loss triggers the stop
    }
    cfg = Config().replace(**base)
    tr = Trainer(cfg, names)
    s = tr.init_state(jax.random.PRNGKey(0), x)
    _, run1 = tr.fit(s, x, y, log=False)
    assert len(run1.epoch_losses) == 1  # stopped after epoch 1

    tr2 = Trainer(cfg, names)
    s2 = tr2.init_state(jax.random.PRNGKey(0), x)
    _, run2 = tr2.fit(s2, x, y, log=False)
    # history restored, and no further epochs trained
    assert run2.epoch_losses == run1.epoch_losses


def test_feature_cache_identical_loss_trajectory(capsys):
    """train.feature_cache: the cached path (backbone features extracted
    once, head trained from the block) must produce THE SAME per-epoch loss
    trajectory as the raw-clip path — stop_gradient + frozen params + fixed
    batch_stats make the features bit-constant, so this is an equality, not
    an approximation. Also checks val-loss parity (the val loader is
    feature-cached too) and that the params land in the same place."""
    x, y, names = generate_dummy_data(
        num_samples=16, sequence_length=4, height=32, width=32, num_classes=4
    )
    xv, yv = x[:8], y[:8]

    runs = {}
    for flag in ("false", "true"):
        cfg = _tiny_cfg(**{
            "train.feature_cache": flag,
            "train.epochs": "2",
            "model.dropout": "0.0",  # dropout rng draws differ per path
        })
        tr = Trainer(cfg, names)
        state = tr.init_state(jax.random.PRNGKey(0), x)
        state, run = tr.fit(state, x, y, val=(xv, yv))
        runs[flag] = (run, jax.device_get(state.params))

    run_raw, p_raw = runs["false"]
    run_fc, p_fc = runs["true"]
    np.testing.assert_allclose(
        run_fc.epoch_losses, run_raw.epoch_losses, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        run_fc.val_losses, run_raw.val_losses, rtol=1e-5, atol=1e-6
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6),
        p_raw, p_fc,
    )
    out = capsys.readouterr().out
    assert "feature_cache: extracted" in out


def test_feature_cache_ignored_when_finetuning():
    """finetune=True backprops through the conv stack — features are not
    constant, so the cache must not engage. epochs=0 keeps this a test of
    fit()'s feature-mode decision (made before any step runs) without
    paying the finetune backward; test_partial_freeze_training covers the
    finetune backward end to end in this lane."""
    x, y, names = generate_dummy_data(
        num_samples=4, sequence_length=2, height=16, width=16, num_classes=4
    )
    cfg = _tiny_cfg(**{
        "train.feature_cache": "true",
        "train.epochs": "0",
        "train.batch_size": "4",
        "data.sequence_length": "2",
        "data.img_height": "16",
        "data.img_width": "16",
        "model.finetune": "true",  # backprop through the conv stack
    })
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    state, run = tr.fit(state, x, y, log=False)
    assert tr._feature_mode is False
    assert run.epoch_losses == []


@pytest.mark.slow
def test_feature_cache_resume_extracts_from_restored_backbone(tmp_path):
    """Resume + feature_cache: extraction must run AFTER the checkpoint
    restore, so features come from the checkpoint's backbone — a resuming
    process whose fresh init used a different seed would otherwise train
    the heads on features from a backbone they never saw (silent
    divergence; the raw-clip path is immune because it applies the
    restored params every step)."""
    x, y, names = generate_dummy_data(16, 4, 32, 32, 4)
    base = {
        "train.feature_cache": "true",
        "train.resume": "true",
        "model.dropout": "0.0",
    }
    # uninterrupted 2-epoch run (seed-0 init)
    cfg_full = _tiny_cfg(**{**base, "train.epochs": "2",
                            "train.model_path": str(tmp_path / "ref")})
    tr = Trainer(cfg_full, names)
    s = tr.init_state(jax.random.PRNGKey(0), x)
    _, run_full = tr.fit(s, x, y, log=False)

    # the same run crashed after epoch 1 ...
    ck = str(tmp_path / "ck")
    cfg1 = _tiny_cfg(**{**base, "train.epochs": "1",
                        "train.model_path": ck})
    tr1 = Trainer(cfg1, names)
    s1 = tr1.init_state(jax.random.PRNGKey(0), x)
    tr1.fit(s1, x, y, log=False)
    # ... and is resumed by a NEW process whose fresh init drew a DIFFERENT
    # seed: only the restored params may influence epoch 2.
    cfg2 = _tiny_cfg(**{**base, "train.epochs": "2",
                        "train.model_path": ck})
    tr2 = Trainer(cfg2, names)
    s2 = tr2.init_state(jax.random.PRNGKey(123), x)
    _, run_res = tr2.fit(s2, x, y, log=False)
    np.testing.assert_allclose(
        run_res.epoch_losses, run_full.epoch_losses, rtol=1e-5, atol=1e-6
    )
