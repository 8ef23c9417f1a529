"""Finetune-path training parity vs torch: the conv backward, proven.

The reference fine-tunes upper conv layers (``lrcn/rgb_lrcn.py:208-245``
``freeze_until_layer``; the ``FINETUNE`` knob, ``all_config.py:30``). vct's
counterpart is ``model.finetune=true`` (+ optional ``model.freeze_until``
backbone-prefix freezing, optimizer-level via ``optax.multi_transform`` —
``vct/train/engine.py:78-100``). Until round 5 this was the one training
mode with zero torch parity evidence ("grads flow / loss decreases" only).
This module closes it:

* **Gradient goldens** — ``jax.grad`` of the production loss through the
  FULL model INCLUDING the resnet18 conv stack (finetune=True drops the
  ``stop_gradient``, ``vct/models/lrcn.py:128-129``) vs ``loss.backward()``
  through the torch reconstruction, per parameter tensor — conv kernels, BN
  scale/bias, downsample convs, everything.
* **Trajectory goldens** — 10 Adam steps through the REAL compiled train
  step with (a) full finetune and (b) ``freeze_until`` partial freezing
  (conv1..layer3 frozen, layer4 training), vs a torch loop fine-tuning the
  same parameter subset: per-step losses must track.
* **Convergence arm** — both frameworks fine-tune end to end on the motion
  dataset from one shared ported init to agreeing held-out F1.

BN semantics under finetune are vct's declared deviation (eval-mode BN with
fixed running stats — docs/migration.md "Training-semantics deviations"),
so the torch side runs ``.eval()`` throughout; the train-mode-BN delta is
measured separately in test_convergence.py.
"""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # torch-golden matrix: full lane only

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    B, T, H, W, RNN_INPUT, HIDDEN, LAYERS, CLASSES,
    TRefLRCN, _port_full, _randomize_bn_stats,
)
from test_train_parity import (  # noqa: E402
    _compare_trees, _grads_as_params, _loss_shim, _make_batch, _torch_loss,
)
from vct.models.lrcn import LRCN  # noqa: E402
from vct.train.engine import Trainer, count_parameters  # noqa: E402

# vct freeze_until prefixes <-> torch backbone submodules (flax param keys
# are conv1, bn1, layer{1..4}_{0,1} — prefix "layer1" covers both blocks).
FREEZE_PREFIXES = "conv1,bn1,layer1,layer2,layer3"
TORCH_FROZEN_MODULES = ("conv1", "bn1", "layer1", "layer2", "layer3")


def _torch_finetune_model(rnn_type, classif_mode, freeze_until=False):
    """The reconstruction with the backbone TRAINING (requires_grad=True),
    optionally with the reference's freeze-lower-layers pattern
    (rgb_lrcn.py:208-245). Eval mode: BN on running stats, like vct."""
    torch.manual_seed(0)
    t_model = TRefLRCN(rnn_type, "all", classif_mode)
    with torch.no_grad():
        _randomize_bn_stats(t_model)
    t_model.eval()
    if freeze_until:
        for name in TORCH_FROZEN_MODULES:
            for p in getattr(t_model.cnn_backbone, name).parameters():
                p.requires_grad = False
    return t_model


def _init_flax_finetune(rnn_type, classif_mode, x):
    model = LRCN(
        num_classes=CLASSES, sequence_length=T, hidden_size=HIDDEN,
        rnn_input_size=RNN_INPUT, cnn_backbone="resnet18", rnn_type=rnn_type,
        rnn_layer=LAYERS, rnn_out="all", classif_mode=classif_mode,
        dropout=0.0, scan_impl="scan", finetune=True,
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    return model, variables


# ---------------------------------------------------------------------------
# Gradient goldens through the conv backward
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rnn_type,classif_mode", [
    ("lstm", "multiclass"),
    ("mamba", "multiple_binary"),
])
def test_finetune_grads_match_torch_through_conv_backward(
    rnn_type, classif_mode
):
    """Every parameter gradient — INCLUDING the full resnet18 stack (conv
    kernels, BN scale/bias, strided downsample convs) — vs torch autograd.
    The backbone comparison is the new evidence; the head comparison guards
    against the finetune flag perturbing the already-proven path."""
    t_model = _torch_finetune_model(rnn_type, classif_mode)

    x, y, weights = _make_batch(classif_mode)
    loss = _torch_loss(
        t_model(torch.from_numpy(x)), torch.from_numpy(y),
        classif_mode, weights,
    )
    loss.backward()

    model, variables = _init_flax_finetune(rnn_type, classif_mode, x)
    want_grads = _port_full(
        _grads_as_params(t_model), variables, rnn_type, classif_mode
    )["params"]
    ported = _port_full(t_model, variables, rnn_type, classif_mode)
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    shim = _loss_shim(classif_mode, weights)

    def loss_of(params):
        lg = model.apply(
            {"params": params, "batch_stats": ported["batch_stats"]}, xj
        )
        val, _ = shim._loss_fn(
            lg, jnp.asarray(y), jnp.ones((B,), jnp.float32)
        )
        return val

    jloss, grads = jax.value_and_grad(loss_of)(ported["params"])
    np.testing.assert_allclose(
        float(jloss), float(loss.detach()), atol=2e-5, rtol=0
    )
    # The conv backward is actually in the graph: backbone grads nonzero.
    bb_max = max(
        float(jnp.abs(l).max())
        for l in jax.tree_util.tree_leaves(grads["cnn_backbone"])
    )
    assert bb_max > 0.0, "finetune=True but no gradient reached the backbone"
    for key in grads:
        _compare_trees(
            jax.tree_util.tree_map(np.asarray, grads[key]),
            jax.tree_util.tree_map(np.asarray, want_grads[key]),
            key,
        )


# ---------------------------------------------------------------------------
# Trajectory goldens: the real compiled step, full and partial finetune
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("freeze_until", ["", FREEZE_PREFIXES])
def test_finetune_adam_trajectory_tracks_torch(freeze_until):
    """10 Adam steps through the REAL compiled train step with
    model.finetune=true — full backbone training (freeze_until="") and the
    reference's freeze-lower-layers pattern (conv1..layer3 frozen via
    optax.multi_transform set_to_zero; torch freezes the same submodules by
    requires_grad). Per-step losses must track; a mis-labeled parameter
    subtree (training what torch froze, or vice versa) diverges the
    trajectories within a few steps."""
    from vct.core.config import Config
    from vct.parallel.mesh import batch_sharding, host_to_device

    LR, STEPS, BS = 1e-3, 10, B

    t_model = _torch_finetune_model(
        "lstm", "multiclass", freeze_until=bool(freeze_until)
    )

    rng = np.random.RandomState(7)
    xs = [rng.rand(BS, T, 3, H, W).astype(np.float32) for _ in range(2)]
    ys = [rng.randint(0, CLASSES, BS).astype(np.int64) for _ in range(2)]
    all_y = np.concatenate(ys)
    counts = np.bincount(all_y, minlength=CLASSES).astype(np.float64)
    weights = (len(all_y) / np.maximum(CLASSES * counts, 1.0)).astype(
        np.float32
    )

    t_init = copy.deepcopy(t_model)
    opt = torch.optim.Adam(
        [p for p in t_model.parameters() if p.requires_grad], lr=LR
    )
    torch_losses = []
    for step in range(STEPS):
        xb, yb = xs[step % 2], ys[step % 2]
        opt.zero_grad()
        loss = _torch_loss(
            t_model(torch.from_numpy(xb)), torch.from_numpy(yb),
            "multiclass", weights,
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    cfg = Config().replace(**{
        "model.num_classes": str(CLASSES),
        "model.rnn_input_size": str(RNN_INPUT),
        "model.mult_factor": str(HIDDEN // RNN_INPUT),
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "lstm",
        "model.rnn_layer": str(LAYERS),
        "model.rnn_out": "all",
        "model.dropout": "0.0",
        "model.scan_impl": "scan",
        "model.finetune": "true",
        "model.freeze_until": freeze_until,
        "data.sequence_length": str(T),
        "data.img_height": str(H),
        "data.img_width": str(W),
        "train.batch_size": str(BS),
        "train.learning_rate": str(LR),
        "train.optimizer": "adam",
        "train.grad_clip": "0",
    })
    trainer = Trainer(
        cfg, [f"c{i}" for i in range(CLASSES)], class_weights=weights
    )
    x0j = np.transpose(xs[0], (0, 1, 3, 4, 2))
    state = trainer.init_state(jax.random.PRNGKey(0), x0j)
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.extra_vars)}
    ported = _port_full(t_init, variables, "lstm", "multiclass")
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
    # count_parameters agrees with torch's requires_grad split — the param
    # lines the reference prints (train_eval.py:121-129).
    cts = count_parameters(params, finetune=True, freeze_until=freeze_until)
    want_trainable = sum(
        p.numel() for p in t_init.parameters() if p.requires_grad
    )
    assert cts["Trainable parameters"] == want_trainable

    step_fn = trainer._build_train_step()
    shard = batch_sharding(trainer.mesh)
    frozen_before = jax.device_get(
        state.params["cnn_backbone"]["conv1"]
    ) if freeze_until else None
    jax_losses = []
    for step in range(STEPS):
        xb = np.transpose(xs[step % 2], (0, 1, 3, 4, 2))
        yb = ys[step % 2]
        xb, yb, mask = trainer._pad_batch(xb, yb, np.ones(BS, np.float32))
        xd, yd, md = trainer._put_batch(xb, yb, mask, shard)
        state, loss, _, _ = step_fn(state, xd, yd, md)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=2e-3, atol=2e-4,
        err_msg=f"finetune Adam trajectories diverged "
                f"(freeze_until={freeze_until!r}):\n jax  {jax_losses}\n "
                f"torch {torch_losses}",
    )
    params_after = jax.device_get(state.params["cnn_backbone"])
    if freeze_until:
        # Frozen prefixes stayed bit-identical; the open suffix trained.
        np.testing.assert_array_equal(
            jax.tree_util.tree_leaves(params_after["conv1"])[0],
            jax.tree_util.tree_leaves(frozen_before)[0],
        )
        moved = max(
            float(np.abs(l).max())
            for l in jax.tree_util.tree_leaves(params_after["layer4_0"])
        )
        assert moved > 0.0
    assert jax_losses[8] < jax_losses[0]


# ---------------------------------------------------------------------------
# Convergence arm: end-to-end finetune on the motion dataset
# ---------------------------------------------------------------------------


def test_finetune_converges_to_agreeing_f1(tmp_path):
    """Finetune at convergence, the way finetune is actually used: train
    heads over the frozen backbone first, then open the conv stack and
    fine-tune END TO END at a gentler lr (the reference fine-tunes a
    *pretrained* backbone — ``rgb_lrcn.py:208-245`` — never a random one;
    measured here: end-to-end training of a RANDOM resnet18 on 39 clips
    stalls at chance for 64 epochs on either framework, so a from-scratch
    finetune arm would test plateau luck, not parity). Both frameworks run
    both phases from one shared ported init; held-out F1 must clear the bar
    and agree, and the conv weights must actually have moved in phase 2.
    Measured (CPU lane, seed 0): vct 1.00 vs torch 1.00."""
    from test_convergence import (
        BS, F1_BAND, F1_BAR, LR, _motion_setup, _shared_torch_init,
        _torch_feats, _torch_head, _train_torch_head,
    )
    from test_full_model_parity import _port_full
    from vct.parallel.mesh import host_to_device
    from vct.train.metrics import multiclass_metrics

    FT_EPOCHS, FT_LR = 8, 1e-4  # phase 2: finetune the conv stack
    cfg, xtr, ytr, xte, yte, names, weights = _motion_setup(
        tmp_path, "lstm", size=32  # 32x32 keeps phase 2 conv-bound but cheap
    )
    t_model = _shared_torch_init("lstm", "multiclass")
    t_model.eval()  # declared BN semantics (docs/migration.md)
    t_init = copy.deepcopy(t_model)

    # --- vct phase 1: head-only (production feature-cache path) ---------
    trainer1 = Trainer(cfg, names, class_weights=weights)
    state = trainer1.init_state(jax.random.PRNGKey(0), xtr[:BS])
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.extra_vars)}
    ported = _port_full(t_init, variables, "lstm", "multiclass",
                        layers=LAYERS)
    params = jax.tree_util.tree_map(jnp.asarray, ported["params"])
    extra = {"batch_stats": jax.tree_util.tree_map(
        jnp.asarray, ported["batch_stats"]
    )}
    state = host_to_device(
        state.replace(params=params, extra_vars=extra,
                      opt_state=trainer1._tx.init(params)),
        trainer1.mesh,
    )
    state, run1 = trainer1.fit(state, xtr, ytr, log=False)
    assert run1.epoch_losses[-1] < 0.25 * run1.epoch_losses[0]

    # --- vct phase 2: open the conv stack (model.finetune=true) ---------
    cfg2 = cfg.replace(**{
        "model.finetune": "true",
        "train.epochs": str(FT_EPOCHS),
        "train.learning_rate": str(FT_LR),
        # feature_cache is in the base motion cfg; the engine auto-disables
        # it under finetune (fit: feature_mode requires not finetune), so
        # phase 2 really trains the conv stack every step.
    })
    trainer2 = Trainer(cfg2, names, class_weights=weights)
    params1 = jax.tree_util.tree_map(
        jnp.asarray, jax.device_get(state.params)
    )
    # Re-fetch batch_stats from the POST-fit state: the phase-1 step donates
    # its input buffers, so the pre-fit `extra` leaves no longer exist.
    extra1 = jax.tree_util.tree_map(
        jnp.asarray, jax.device_get(state.extra_vars)
    )
    conv1_before = np.asarray(params1["cnn_backbone"]["conv1"]["kernel"])
    state2 = trainer2.init_state(jax.random.PRNGKey(1), xtr[:BS])
    state2 = host_to_device(
        state2.replace(params=params1, extra_vars=extra1,
                       opt_state=trainer2._tx.init(params1)),
        trainer2.mesh,
    )
    state2, _ = trainer2.fit(state2, xtr, ytr, log=False)
    conv1_after = np.asarray(
        jax.device_get(state2.params)["cnn_backbone"]["conv1"]["kernel"]
    )
    assert np.abs(conv1_after - conv1_before).max() > 0, (
        "finetune phase did not move the conv stack"
    )
    m_vct = trainer2.evaluate(state2, xte, yte, log=False)

    # --- torch: same two phases from the same init ----------------------
    ftr = _torch_feats(t_model, xtr)
    _train_torch_head(t_model, ftr, ytr, weights, "multiclass")  # phase 1
    for p in t_model.cnn_backbone.parameters():
        p.requires_grad = True
    t_conv_before = t_model.cnn_backbone.conv1.weight.detach().clone()
    opt = torch.optim.Adam(t_model.parameters(), lr=FT_LR)
    shuffle = np.random.RandomState(202)
    ytr_t = torch.from_numpy(ytr)
    wt = torch.from_numpy(weights)
    for _ in range(FT_EPOCHS):  # phase 2
        order = shuffle.permutation(len(xtr))
        for s in range(0, len(order), BS):
            i = order[s:s + BS]
            xt = torch.from_numpy(np.transpose(xtr[i], (0, 1, 4, 2, 3)))
            opt.zero_grad()
            loss = F.cross_entropy(t_model(xt), ytr_t[i], weight=wt)
            loss.backward()
            opt.step()
    assert not torch.equal(
        t_model.cnn_backbone.conv1.weight.detach(), t_conv_before
    )
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(xte, (0, 1, 4, 2, 3)))
        preds = t_model(xt).argmax(1).numpy()
    conf = np.zeros((CLASSES, CLASSES), np.int64)
    for yt_, yp in zip(yte, preds):
        conf[yt_, yp] += 1
    m_torch = multiclass_metrics(conf, names)
    print(f"\nfinetune arms: vct F1 {m_vct.f1:.4f} vs torch F1 "
          f"{m_torch.f1:.4f}")

    assert m_vct.f1 >= F1_BAR, (
        f"vct finetune failed to converge: F1 {m_vct.f1:.4f}"
    )
    assert m_torch.f1 >= F1_BAR, (
        f"torch finetune failed to converge: F1 {m_torch.f1:.4f}"
    )
    assert abs(m_vct.f1 - m_torch.f1) <= F1_BAND, (
        f"finetune converged F1 disagree: vct {m_vct.f1:.4f} vs torch "
        f"{m_torch.f1:.4f}"
    )
