"""Converged-accuracy benchmark: vct and the torch reconstruction train the
SAME config on the SAME generated video dataset to convergence, and their
held-out macro F1 must agree.

The reference's benchmark record is F1 0.7601 on tikHarm / 0.72 on UCF50
(``dumps/bayesian_medsos_checkpoint.json``, ``lrcn/backup_ucf50.py:1``) —
datasets that aren't on this machine. This stands in: a LEARNABLE video
dataset (``generate_motion_dataset`` — real mp4 files whose classes differ
only in temporal dynamics; "forward" and "reverse" have IDENTICAL per-frame
marginals) flows through the REAL ingest path (cv2 decode, uniform frame
sampling, HDF5 cache — ``ingest.py``), then:

* vct trains through the production engine (``Trainer.fit`` with
  balanced-weight CE from ``compute_class_weights``, feature-cache path) and
  evaluates through the production metrics (``multiclass_metrics``);
* torch trains the reconstruction from the SAME ported initial weights with
  the same lr/batch-size/epochs (its own shuffle stream — this validates
  converged behavior, not step-level parity; test_train_parity.py holds the
  trajectory goldens).

Both must clear a high absolute F1 bar on the held-out split AND land within
a noise band of each other — validating losses, class weighting, the
optimizer, and the metrics stack end to end at convergence. Measured (CPU
lane, seeds 0-2): vct 1.00/1.00/0.94 vs torch 1.00/1.00/0.94, delta 0.00.

Arms in this module:

* multiclass, lstm + mamba (shared-init, eval-BN both sides);
* multiple_binary (per-class BCE pos_weight at convergence — the reference's
  other recorded training mode, ``lrcn/rgb_lrcn.py:403-421``);
* the REFERENCE's train-mode-BN semantics (``train_eval.py:12`` trains with
  ``model.train()`` while freezing only backbone parameters, so the frozen
  backbone's BN layers normalize with batch statistics and keep updating
  running stats) vs vct's deliberate always-eval-BN — the one training-time
  forward divergence, measured here instead of mirrored away. See
  docs/migration.md "Training-semantics deviations".
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # ~60 s each: full lane only

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    T, CLASSES, TRefLRCN, _port_full,
)
from test_train_parity import _torch_loss  # noqa: E402
from vct.core.config import Config  # noqa: E402
from vct.data.ingest import build_dataset_cache, load_dataset_cache  # noqa: E402
from vct.data.loaders import split_indices  # noqa: E402
from vct.data.synthetic import generate_motion_dataset  # noqa: E402
from vct.parallel.mesh import host_to_device  # noqa: E402
from vct.train.engine import Trainer, compute_class_weights  # noqa: E402
from vct.train.metrics import (  # noqa: E402
    multiclass_metrics,
    multilabel_counts,
    multilabel_metrics,
)

# Wider than the parity-matrix constants: the 8-dim adapter bottleneck has a
# chance-level plateau this tiny dataset can stall in (measured — both
# frameworks stall identically); 32/64 converges reliably for every seed.
RNN_INPUT, HIDDEN, LAYERS = 32, 64, 2
EPOCHS, LR, BS = 50, 1e-3, 8
F1_BAR = 0.85  # each framework must clear this on the held-out split
F1_BAND = 0.15  # and agree with the other within this


def _torch_head(m, feats):
    """TRefLRCN.forward minus the (frozen) backbone — the torch counterpart
    of the engine's feature-cache step, so both sides train heads from the
    same precomputed features. Mirrors both temporal families (the mamba
    branch trains the mixer stack end to end, so convergence here validates
    the selective-scan backward at full-training scale, complementing the
    10-step trajectory goldens in test_train_parity.py) and both
    classification heads."""
    b = feats.shape[0]
    x = m.bn1(F.gelu(m.adapt1(feats)))
    x = m.bn2(F.gelu(m.adapt2(x)))
    x = m.bn3(F.gelu(m.adapt3(x)))
    if m.rnn_type == "mamba":
        for norm, mixer in zip(m.norms, m.mixers):
            x = mixer(norm(x)) + x
        rnn_out = x
    else:
        rnn_out, _ = m.rnn(x)
    pooled = rnn_out.reshape(b, -1)
    if m.classif_mode != "multiclass":
        return torch.cat([fc(pooled) for fc in m.fcs], dim=1)
    out = m.bn0(pooled)
    out = m.bna(F.gelu(m.fc(out)))
    out = m.bnb(F.gelu(m.fca(out)))
    return m.fcb(out)


def _motion_setup(tmp_path, rnn_type, classif_mode="multiclass", size=64):
    """Generate the motion dataset, ingest it through the REAL path, split,
    and compute class weights. Returns (cfg, xtr, ytr, xte, yte, names,
    weights). ``size=32`` keeps the conv-heavy finetune arm affordable."""
    root = str(tmp_path / "videos")
    cache = str(tmp_path / "cache")
    # Imbalanced classes: the balanced-weight CE / BCE pos_weight path is
    # actually load-bearing.
    names_gen = generate_motion_dataset(
        root, clips_per_class=(16, 13, 13, 10), frames=16, size=size, seed=0
    )

    cfg = Config().replace(**{
        "data.dataset_path": root,
        "data.processed_data_path": cache,
        "data.img_height": str(size), "data.img_width": str(size),
        "data.sequence_length": str(T),
        "data.decode_workers": "0",
        "model.num_classes": str(CLASSES),
        "model.classif_mode": classif_mode,
        "model.rnn_input_size": str(RNN_INPUT),
        "model.mult_factor": str(HIDDEN // RNN_INPUT),
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": rnn_type,
        "model.rnn_layer": str(LAYERS),
        "model.rnn_out": "all",
        "model.dropout": "0.0",
        "model.scan_impl": "scan",
        "train.batch_size": str(BS),
        "train.learning_rate": str(LR),
        "train.optimizer": "adam",
        "train.grad_clip": "0",
        "train.epochs": str(EPOCHS),
        "train.early_stop_patience": "0",
        "train.feature_cache": "true",
        "train.seed": "11",
    })
    build_dataset_cache(cfg)
    x, y, names = load_dataset_cache(cfg)
    assert names == names_gen and len(x) == 52
    assert x.shape[1:] == (T, size, size, 3)
    tr, te = split_indices(len(x), 0.25, seed=42)
    xtr, ytr, xte, yte = x[tr], y[tr], x[te], y[te]
    if classif_mode == "multiclass":
        assert len(set(yte.tolist())) == CLASSES  # every class held out
    else:
        assert yte.shape[1] == CLASSES and set(np.argmax(yte, 1)) == set(
            range(CLASSES)
        )
    weights = compute_class_weights(ytr, CLASSES, classif_mode)
    return cfg, xtr, ytr, xte, yte, names, weights


def _shared_torch_init(rnn_type, classif_mode):
    """One shared init: the torch model both arms start from. Backbone
    parameters frozen exactly like models.py:144-145."""
    torch.manual_seed(0)
    t_model = TRefLRCN(
        rnn_type, "all", classif_mode,
        rnn_input=RNN_INPUT, hidden=HIDDEN, layers=LAYERS,
    )
    for p in t_model.cnn_backbone.parameters():
        p.requires_grad = False
    return t_model


def _vct_arm(cfg, names, weights, t_init, rnn_type, classif_mode,
             xtr, ytr, xte, yte):
    """vct's production arm: port the shared torch init into the live state,
    train through Trainer.fit, evaluate through Trainer.evaluate."""
    trainer = Trainer(cfg, names, class_weights=weights)
    state = trainer.init_state(jax.random.PRNGKey(0), xtr[:BS])
    variables = {
        "params": jax.device_get(state.params),
        **jax.device_get(state.extra_vars),
    }
    ported = _port_full(t_init, variables, rnn_type, classif_mode, layers=LAYERS)
    params = jax.tree_util.tree_map(jnp.asarray, ported["params"])
    state = host_to_device(
        state.replace(
            params=params,
            extra_vars={"batch_stats": jax.tree_util.tree_map(
                jnp.asarray, ported["batch_stats"]
            )},
            opt_state=trainer._tx.init(params),
        ),
        trainer.mesh,
    )
    state, run = trainer.fit(state, xtr, ytr, log=False)
    metrics = trainer.evaluate(state, xte, yte, log=False)
    return metrics, run


def _torch_feats(t_model, a):
    """Backbone features under the model's CURRENT train/eval mode (the
    reference forwards the flattened B*T frame batch, models.py:190-192)."""
    xt = torch.from_numpy(np.transpose(a, (0, 1, 4, 2, 3)))
    b, t = xt.shape[:2]
    with torch.no_grad():  # frozen: no grads, but train-mode BN still
        return t_model.cnn_backbone(  # updates running stats on forward
            xt.reshape(b * t, 3, xt.shape[-2], xt.shape[-1])
        ).reshape(b, t, -1)


def _train_torch_head(t_model, ftr, ytr, weights, classif_mode):
    """The torch arm's head-training loop: same lr/batch-size/epochs as the
    vct arm, its own shuffle stream."""
    opt = torch.optim.Adam(
        [p for p in t_model.parameters() if p.requires_grad], lr=LR
    )
    shuffle = np.random.RandomState(101)
    ytr_t = torch.from_numpy(ytr)
    for _ in range(EPOCHS):
        order = shuffle.permutation(len(ftr))
        for s in range(0, len(order), BS):
            i = order[s:s + BS]
            opt.zero_grad()
            loss = _torch_loss(
                _torch_head(t_model, ftr[i]), ytr_t[i], classif_mode, weights
            )
            loss.backward()
            opt.step()


@pytest.mark.parametrize("rnn_type", ["lstm", "mamba"])
def test_both_frameworks_converge_to_agreeing_f1(tmp_path, rnn_type):
    cfg, xtr, ytr, xte, yte, names, weights = _motion_setup(tmp_path, rnn_type)
    t_model = _shared_torch_init(rnn_type, "multiclass")
    t_model.eval()  # frozen-backbone BN uses running stats, both sides
    t_init = copy.deepcopy(t_model)

    # --- vct: the production engine end to end -------------------------
    m_vct, run = _vct_arm(
        cfg, names, weights, t_init, rnn_type, "multiclass",
        xtr, ytr, xte, yte,
    )
    # training actually converged, not just classified well by luck
    assert run.epoch_losses[-1] < 0.25 * run.epoch_losses[0]

    # --- torch: same init, same recipe ----------------------------------
    ftr, fte = _torch_feats(t_model, xtr), _torch_feats(t_model, xte)
    _train_torch_head(t_model, ftr, ytr, weights, "multiclass")
    with torch.no_grad():
        preds = _torch_head(t_model, fte).argmax(1).numpy()
    conf = np.zeros((CLASSES, CLASSES), np.int64)
    for yt_, yp in zip(yte, preds):
        conf[yt_, yp] += 1
    m_torch = multiclass_metrics(conf, names)

    assert m_vct.f1 >= F1_BAR, (
        f"vct failed to converge: F1 {m_vct.f1:.4f} < {F1_BAR}"
    )
    assert m_torch.f1 >= F1_BAR, (
        f"torch reconstruction failed to converge: F1 {m_torch.f1:.4f}"
    )
    assert abs(m_vct.f1 - m_torch.f1) <= F1_BAND, (
        f"converged F1 disagree: vct {m_vct.f1:.4f} vs torch {m_torch.f1:.4f}"
    )


def test_multiple_binary_converges_to_agreeing_metrics(tmp_path):
    """The reference's other recorded training mode at convergence: one-hot
    labels, per-class BCEWithLogits(pos_weight=neg/pos) summed over classes
    (``rgb_lrcn.py:403-421``, ``train_eval.py:31-39``). The class imbalance
    (16/13/13/10) makes pos_weight load-bearing: each class is positive for
    ~1/4 of clips, so unweighted BCE's early gradient pushes toward the
    all-negative prediction. Both frameworks train from one shared ported
    init to agreeing held-out macro F1 through the production multilabel
    metrics stack (complements test_train_parity.py's single-step BCE
    gradient goldens with a converged run)."""
    cfg, xtr, ytr, xte, yte, names, weights = _motion_setup(
        tmp_path, "lstm", classif_mode="multiple_binary"
    )
    assert weights.min() > 1.5  # pos_weight actually reweights (neg/pos >> 1)
    t_model = _shared_torch_init("lstm", "multiple_binary")
    t_model.eval()
    t_init = copy.deepcopy(t_model)

    m_vct, run = _vct_arm(
        cfg, names, weights, t_init, "lstm", "multiple_binary",
        xtr, ytr, xte, yte,
    )
    assert run.epoch_losses[-1] < 0.25 * run.epoch_losses[0]

    ftr, fte = _torch_feats(t_model, xtr), _torch_feats(t_model, xte)
    _train_torch_head(t_model, ftr, ytr, weights, "multiple_binary")
    with torch.no_grad():
        logits = _torch_head(t_model, fte).numpy()
    counts, exact = multilabel_counts(jnp.asarray(logits), jnp.asarray(yte))
    m_torch = multilabel_metrics(
        np.asarray(counts), float(exact), float(len(yte)), names
    )
    print(f"\nmultiple_binary arms: vct F1 {m_vct.f1:.4f} vs "
          f"torch F1 {m_torch.f1:.4f}")

    assert m_vct.f1 >= F1_BAR, (
        f"vct multiple_binary failed to converge: F1 {m_vct.f1:.4f}"
    )
    assert m_torch.f1 >= F1_BAR, (
        f"torch multiple_binary failed to converge: F1 {m_torch.f1:.4f}"
    )
    assert abs(m_vct.f1 - m_torch.f1) <= F1_BAND, (
        f"converged F1 disagree: vct {m_vct.f1:.4f} vs torch {m_torch.f1:.4f}"
    )


def test_reference_train_mode_bn_lands_in_same_band(tmp_path):
    """Measure the one known training-semantics deviation instead of
    mirroring it away.

    The reference trains with ``model.train()`` while freezing only backbone
    *parameters* (``medsos_lrcn/src/train_eval.py:12``,
    ``models.py:144-145`` — no ``.eval()`` anywhere in training): its frozen
    backbone's BatchNorm layers normalize every training batch with BATCH
    statistics and keep updating running stats, then switch to running stats
    at eval (``train_eval.py:57``). vct deliberately hardcodes eval-mode BN
    (``vct/models/backbones/resnet.py`` ``use_running_average=True``) — the
    backbone is frozen, so its features should not depend on batch
    composition (and bit-constant features are what make train.feature_cache
    exact).

    This arm trains the torch reconstruction under the REFERENCE's exact
    semantics — backbone forwarded per batch in train mode, running stats
    drifting all run — and requires its converged held-out F1 to land in the
    same band as vct's eval-BN production run. Measured (CPU lane, seed 0):
    vct eval-BN F1 1.00 vs reference train-BN F1 0.90 — the deviation costs
    nothing (eval-BN measured equal-or-better); see docs/migration.md
    "Training-semantics deviations"."""
    cfg, xtr, ytr, xte, yte, names, weights = _motion_setup(tmp_path, "lstm")
    t_model = _shared_torch_init("lstm", "multiclass")
    t_init = copy.deepcopy(t_model)

    # --- vct: production engine, always-eval-BN -------------------------
    m_vct, run = _vct_arm(
        cfg, names, weights, t_init, "lstm", "multiclass",
        xtr, ytr, xte, yte,
    )
    assert run.epoch_losses[-1] < 0.25 * run.epoch_losses[0]

    # --- torch: the reference's train-mode-BN semantics ------------------
    t_model.train()  # train_eval.py:12 — BN in batch-stats mode
    bn1 = t_model.cnn_backbone.bn1
    init_mean = bn1.running_mean.clone()
    opt = torch.optim.Adam(
        [p for p in t_model.parameters() if p.requires_grad], lr=LR
    )
    shuffle = np.random.RandomState(101)
    ytr_t = torch.from_numpy(ytr)
    for _ in range(EPOCHS):
        order = shuffle.permutation(len(xtr))
        for s in range(0, len(order), BS):
            i = order[s:s + BS]
            # Backbone forwarded PER BATCH in train mode: features depend on
            # batch composition, running stats update every step (momentum
            # 0.1) — no feature cache is possible under these semantics.
            feats = _torch_feats(t_model, xtr[i])
            opt.zero_grad()
            loss = F.cross_entropy(
                _torch_head(t_model, feats), ytr_t[i],
                weight=torch.from_numpy(weights),
            )
            loss.backward()
            opt.step()
    # The deviation was actually exercised: running stats drifted from init.
    assert not torch.allclose(bn1.running_mean, init_mean), (
        "train-mode BN arm did not update running stats — the reference "
        "semantics were not exercised"
    )
    t_model.eval()  # train_eval.py:57 — eval switches to running stats
    with torch.no_grad():
        preds = _torch_head(t_model, _torch_feats(t_model, xte)).argmax(1).numpy()
    conf = np.zeros((CLASSES, CLASSES), np.int64)
    for yt_, yp in zip(yte, preds):
        conf[yt_, yp] += 1
    m_ref = multiclass_metrics(conf, names)
    print(f"\nBN-semantics arms: vct(eval-BN) F1 {m_vct.f1:.4f} vs "
          f"reference(train-BN) F1 {m_ref.f1:.4f}")

    assert m_ref.f1 >= F1_BAR, (
        f"reference-semantics arm failed to converge: F1 {m_ref.f1:.4f}"
    )
    assert abs(m_vct.f1 - m_ref.f1) <= F1_BAND, (
        f"train-mode-BN converged F1 outside vct's band: "
        f"vct(eval-BN) {m_vct.f1:.4f} vs reference(train-BN) {m_ref.f1:.4f}"
    )


# ----------------------------------------------------------------------
# Caption convergence: the S2VT analog of the classifier benchmark above.


def test_captioner_converges_and_decodes_held_out_clips(tmp_path):
    """Train the FULL caption stack (frozen resnet18 -> fc -> GRU encoder ->
    Luong decoder) on pattern-distinct clips, then require the jitted beam
    search to decode HELD-OUT clips (fresh noise instances of each pattern)
    into exactly the right sentences — converged generalization with the
    decode path in the loop, not loss descent or memorization.

    The reference persists no caption accuracy record (SURVEY §6) — its
    training loop just prints loss (``s2vt/beam_search.py:260-294``) — so
    the bar here is absolute: BLEU 1.0 on the held-out split. Complements
    ``test_caption_torch_parity.py`` (step-level gradient/trajectory
    goldens) the same way the classifier convergence test complements
    ``test_train_parity.py``."""
    if jax.default_backend() != "cpu":
        pytest.skip(
            "exact-sentence decode goldens assume the CPU lane's f32 "
            "numerics; bf16 matmul drift on TPU could flip a token"
        )
    from vct.caption.data import encode_caption
    from vct.caption.train import CaptionTrainer
    from vct.caption.vocab import Vocabulary
    from vct.core.config import CaptionConfig

    sentences = [
        "a man is cooking",
        "a dog runs fast",
        "a cat sleeps now",
        "a bird flies away",
    ]
    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary(sentences)
    max_len = 6  # <start> + 4 words + <end>

    # Per class: a distinct smooth color pattern; every clip is that pattern
    # plus fresh gaussian noise. Train never sees the held-out noise draws.
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 31.0
    bases = np.stack([
        np.stack([yy, xx, 1.0 - yy], -1),
        np.stack([1.0 - xx, yy * xx, xx], -1),
        np.stack([0.5 + 0.5 * yy, 1.0 - yy * xx, yy], -1),
        np.stack([xx * xx, 1.0 - xx, 0.5 * (yy + xx)], -1),
    ])  # (4, 32, 32, 3) in [0, 1]

    def clips(n_per_class):
        vids, caps = [], []
        for c, sent in enumerate(sentences):
            for _ in range(n_per_class):
                clip = bases[c][None].repeat(3, axis=0)  # (T=3, 32, 32, 3)
                clip = clip + rng.normal(0, 0.08, clip.shape)
                vids.append(np.clip(clip, 0.0, 1.0).astype(np.float32))
                caps.append(encode_caption(sent, vocab, max_len))
        return np.stack(vids), np.stack(caps)

    train_x, train_y = clips(4)
    held_x, _ = clips(1)  # fresh noise draws, one per class

    cfg = CaptionConfig(
        cnn_backbone="resnet18", cnn_output_size=32, hidden_size=32,
        num_frames=3, max_caption_len=max_len, epochs=150, beam_width=3,
        learning_rate=3e-3, dropout=0.0, checkpoint_dir="",
        feature_cache=True,  # frozen backbone: identical trajectory, ~free epochs
    )
    trainer = CaptionTrainer(cfg, vocab)
    state = trainer.init_state(
        jax.random.PRNGKey(0), train_x[:2], train_y[:2]
    )
    state, losses = trainer.fit(state, train_x, train_y, batch_size=8, log=False)
    assert losses[-1] < 0.1, f"caption training failed to converge: {losses[-1]:.4f}"

    hyps = trainer.caption_videos(state, held_x)  # beam_width=3 via cfg
    for sent, hyp in zip(sentences, hyps):
        assert " ".join(hyp) == sent, (
            f"held-out decode wrong: {hyp!r} vs {sent!r}"
        )
    refs = [[s.split()] for s in sentences]
    bleu = trainer.evaluate_bleu(state, held_x, refs, log=False)
    # The exact-sentence asserts above make identical token lists, so the
    # enforced bar really is BLEU 1.0 (matching the README's claim).
    assert bleu == pytest.approx(1.0, abs=1e-9), f"held-out BLEU {bleu:.6f}"
