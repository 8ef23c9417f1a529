"""Training parity vs torch: gradient goldens and Adam-trajectory goldens.

Round-3 review finding: every parity claim was forward-only — the Pallas
custom_vjp backwards were checked only against their own lax references, and
the weighted-CE / per-class BCE-pos_weight loss gradients
(``medsos_lrcn/src/train_eval.py:25-39``, criterion construction
``lrcn/ucf50-lrcn.py:591-602``) were never compared against torch autograd.
This module closes that hole:

* **Gradient goldens** — ported weights, identical batch: ``jax.grad`` of
  the ENGINE's loss (``Trainer._loss_fn``) through the full LRCN /
  VideoMamba forward vs ``loss.backward()`` through the torch
  reconstruction, per parameter tensor. The matrix covers every loss mode
  and every custom_vjp backward: the Pallas selective scan
  (``vct/ops/selective_scan_pallas.py:102-105``) and the fused LSTM/GRU
  stack kernels (``vct/ops/lstm_pallas.py:324-331``), which interpret-mode
  execute on the CPU lane.
* **Trajectory goldens** — 10 Adam steps through the REAL compiled train
  step (``Trainer._build_train_step``: pad/put/donate/multi_transform
  freezing) vs a torch loop with the same data order and lr: per-step
  losses must track.

Torch reconstructions are shared with test_full_model_parity.py. Both
frameworks run the frozen backbone with eval-mode BN (vct bakes
``use_running_average=True`` into the ported backbones; the torch side
mirrors with ``.eval()``), and dropout is 0 so gradients are deterministic.
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
    TRefLRCN, TRefVideoMamba, _np, _port_full, _port_mixer, _dense,
    _randomize_bn_stats,
)
from vct.models.lrcn import LRCN  # noqa: E402
from vct.train.engine import Trainer  # noqa: E402


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _loss_shim(classif_mode, weights):
    """A Trainer carrying only what _loss_fn reads — the gradient goldens
    differentiate the PRODUCTION loss, not a test reimplementation."""
    shim = Trainer.__new__(Trainer)
    shim.classif_mode = classif_mode
    shim.num_classes = CLASSES
    shim.class_weights = jnp.asarray(weights)
    return shim


def _torch_loss(logits, y, classif_mode, weights):
    """The reference's criteria: CrossEntropyLoss(weight=...) /
    per-class BCEWithLogitsLoss(pos_weight=...) summed
    (train_eval.py:25-39, ucf50-lrcn.py:591-602)."""
    if classif_mode == "multiclass":
        return F.cross_entropy(logits, y, weight=torch.from_numpy(weights))
    losses = [
        F.binary_cross_entropy_with_logits(
            logits[:, i], y[:, i].float(),
            pos_weight=torch.from_numpy(weights[i : i + 1]),
        )
        for i in range(logits.shape[1])
    ]
    return sum(losses)


def _grads_as_params(t_model):
    """Clone the torch model with every parameter REPLACED by its gradient
    (zeros where frozen/None) — so the same porting functions map the torch
    gradient tree into the flax layout."""
    clone = copy.deepcopy(t_model)
    src = dict(t_model.named_parameters())
    for name, p in clone.named_parameters():
        g = src[name].grad
        p.data = torch.zeros_like(p.data) if g is None else g.detach().clone()
    return clone


def _assert_grad_close(got, want, label):
    got, want = np.asarray(got), np.asarray(want)
    scale = float(np.abs(want).max()) if want.size else 0.0
    np.testing.assert_allclose(
        got, want, atol=max(1e-7, 3e-4 * scale), rtol=0,
        err_msg=f"gradient mismatch: {label}",
    )


def _compare_trees(got, want, prefix=""):
    """Recursively compare two {str: array|dict} trees."""
    assert set(got.keys()) == set(want.keys()), (
        f"{prefix}: keys {sorted(got)} vs {sorted(want)}"
    )
    for k in got:
        path = f"{prefix}/{k}"
        if isinstance(got[k], dict):
            _compare_trees(got[k], want[k], path)
        else:
            _assert_grad_close(got[k], want[k], path)


def _make_batch(classif_mode, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.rand(B, T, 3, H, W).astype(np.float32)
    if classif_mode == "multiclass":
        y = rng.randint(0, CLASSES, B).astype(np.int64)
        counts = np.bincount(y, minlength=CLASSES).astype(np.float64)
        weights = (len(y) / np.maximum(CLASSES * counts, 1.0)).astype(np.float32)
    else:
        y = rng.randint(0, 2, (B, CLASSES)).astype(np.float32)
        pos = y.sum(axis=0)
        weights = ((len(y) - pos) / np.maximum(pos, 1.0)).astype(np.float32)
    return x, y, weights


# ---------------------------------------------------------------------------
# Gradient goldens
# ---------------------------------------------------------------------------

# Every loss mode x every temporal-kernel backward:
#   scan        = lax.scan LSTM/GRU backward
#   pallas(rnn) = fused LSTM/GRU STACK kernel custom_vjp (lstm_pallas.py)
#   associative = log-depth associative-scan SSM backward
#   pallas(ssm) = selective-scan kernel custom_vjp (selective_scan_pallas.py)
GRAD_CASES = [
    ("lstm", "multiclass", "scan"),
    ("lstm", "multiple_binary", "pallas"),
    ("gru", "multiclass", "pallas"),
    ("gru", "multiple_binary", "scan"),
    ("mamba", "multiclass", "associative"),
    ("mamba", "multiclass", "pallas"),
    ("mamba", "multiple_binary", "pallas"),
]


@pytest.mark.parametrize("rnn_type,classif_mode,scan_impl", GRAD_CASES)
def test_lrcn_grads_match_torch(rnn_type, classif_mode, scan_impl):
    torch.manual_seed(0)
    t_model = TRefLRCN(rnn_type, "all", classif_mode)
    with torch.no_grad():
        _randomize_bn_stats(t_model)
    t_model.eval()  # BN running stats + no dropout, like the flax side
    for p in t_model.cnn_backbone.parameters():
        p.requires_grad = False  # models.py:144-145 freeze

    x, y, weights = _make_batch(classif_mode)
    logits = t_model(torch.from_numpy(x))
    loss = _torch_loss(
        logits, torch.from_numpy(y), classif_mode, weights
    )
    loss.backward()

    model, variables = _init_flax(rnn_type, classif_mode, scan_impl, x)
    want_grads = _port_full(
        _grads_as_params(t_model), variables, rnn_type, classif_mode
    )["params"]
    ported = _port_full(t_model, variables, rnn_type, classif_mode)
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    yj = jnp.asarray(y)
    mask = jnp.ones((B,), jnp.float32)
    shim = _loss_shim(classif_mode, weights)

    def loss_of(params):
        lg = model.apply(
            {"params": params, "batch_stats": ported["batch_stats"]}, xj
        )
        val, _ = shim._loss_fn(lg, yj, mask)
        return val

    jloss, grads = jax.value_and_grad(loss_of)(ported["params"])
    np.testing.assert_allclose(float(jloss), float(loss.detach()), atol=2e-5, rtol=0)

    for key in grads:
        if key == "cnn_backbone":
            # stop_gradient: backprop never traverses the conv stack
            leaves = jax.tree_util.tree_leaves(grads[key])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)
            continue
        _compare_trees(grads[key], want_grads[key], key)


def _init_flax(rnn_type, classif_mode, scan_impl, x):
    model = LRCN(
        num_classes=CLASSES, sequence_length=T, hidden_size=HIDDEN,
        rnn_input_size=RNN_INPUT, cnn_backbone="resnet18", rnn_type=rnn_type,
        rnn_layer=LAYERS, rnn_out="all", classif_mode=classif_mode,
        dropout=0.0, scan_impl=scan_impl,
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    return model, variables


def test_videomamba_grads_match_torch():
    from vct.models.videomamba import VideoMamba

    torch.manual_seed(0)
    t_model = TRefVideoMamba("mean", "multiclass")
    with torch.no_grad():
        _randomize_bn_stats(t_model)
    t_model.eval()
    for p in t_model.cnn_backbone.parameters():
        p.requires_grad = False

    x, y, weights = _make_batch("multiclass")
    loss = _torch_loss(
        t_model(torch.from_numpy(x)), torch.from_numpy(y), "multiclass", weights
    )
    loss.backward()
    g_clone = _grads_as_params(t_model)

    model = VideoMamba(
        num_classes=CLASSES, cnn_backbone="resnet18", n_layer=2, d_model=12,
        d_inner=24, n_state=4, dt_rank=4, num_frames=T,
        temporal_mode="mean", classification_mode="multiclass",
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    from vct.models.backbones.port import load_torch_backbone

    bb = load_torch_backbone(
        "resnet18",
        {"params": variables["params"]["cnn_backbone"],
         "batch_stats": variables["batch_stats"]["cnn_backbone"]},
        t_model.cnn_backbone.state_dict(),
    )

    def vm_port(t):
        params = dict(variables["params"])
        params["adapt"] = _dense(t.adapt)
        for i in range(2):
            params[f"layer_{i}"] = {
                "norm": {"weight": _np(t.norms[i].weight)},
                "mixer": _port_mixer(t.mixers[i]),
            }
        params["norm_f"] = {"weight": _np(t.norm_f.weight)}
        params["classifier"] = _dense(t.classifier)
        return params

    ported = {
        "params": jax.tree_util.tree_map(jnp.asarray, {
            **vm_port(t_model), "cnn_backbone": bb["params"],
        }),
        "batch_stats": {"cnn_backbone": jax.tree_util.tree_map(
            jnp.asarray, bb["batch_stats"]
        )},
    }
    shim = _loss_shim("multiclass", weights)

    def loss_of(params):
        lg = model.apply(
            {"params": params, "batch_stats": ported["batch_stats"]}, xj
        )
        val, _ = shim._loss_fn(lg, jnp.asarray(y), jnp.ones((B,), jnp.float32))
        return val

    jloss, grads = jax.value_and_grad(loss_of)(ported["params"])
    np.testing.assert_allclose(float(jloss), float(loss.detach()), atol=2e-5, rtol=0)
    want = vm_port(g_clone)
    for key in grads:
        if key == "cnn_backbone":
            leaves = jax.tree_util.tree_leaves(grads[key])
            assert all(float(jnp.abs(l).max()) == 0.0 for l in leaves)
            continue
        _compare_trees(
            jax.tree_util.tree_map(np.asarray, grads[key]), want[key], key
        )


# ---------------------------------------------------------------------------
# Trajectory goldens: 10 Adam steps, same data order and lr
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rnn_type,scan_impl", [
    ("lstm", "scan"),
    ("mamba", "pallas"),
])
def test_adam_trajectory_tracks_torch(rnn_type, scan_impl):
    """The REAL compiled train step (donated state, multi_transform freeze,
    weighted CE) for 10 Adam steps vs torch Adam on the reconstruction —
    per-step losses must track. A subtly wrong backward or optimizer wiring
    diverges within a few steps while single-step tests stay green."""
    from vct.core.config import Config
    from vct.parallel.mesh import batch_sharding, host_to_device

    LR, STEPS, BS = 1e-3, 10, B

    torch.manual_seed(0)
    t_model = TRefLRCN(rnn_type, "all", "multiclass")
    with torch.no_grad():
        _randomize_bn_stats(t_model)
    t_model.eval()
    for p in t_model.cnn_backbone.parameters():
        p.requires_grad = False

    # Two fixed batches, alternating — identical order on both sides.
    rng = np.random.RandomState(7)
    xs = [rng.rand(BS, T, 3, H, W).astype(np.float32) for _ in range(2)]
    ys = [rng.randint(0, CLASSES, BS).astype(np.int64) for _ in range(2)]
    all_y = np.concatenate(ys)
    counts = np.bincount(all_y, minlength=CLASSES).astype(np.float64)
    weights = (len(all_y) / np.maximum(CLASSES * counts, 1.0)).astype(np.float32)

    # Snapshot the shared init NOW — the torch loop below mutates t_model.
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
        "model.rnn_type": rnn_type,
        "model.rnn_layer": str(LAYERS),
        "model.rnn_out": "all",
        "model.dropout": "0.0",
        "model.scan_impl": scan_impl,
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
    # Port the torch init INTO the live state (same shapes -> opt_state
    # from init_state is structurally valid zeros; re-init to be explicit).
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.extra_vars)}
    ported = _port_full(t_init, variables, rnn_type, "multiclass")
    params = ported["params"]
    extra = {"batch_stats": ported["batch_stats"]}
    state = host_to_device(
        state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, params),
            extra_vars=jax.tree_util.tree_map(jnp.asarray, extra),
            opt_state=trainer._tx.init(
                jax.tree_util.tree_map(jnp.asarray, params)
            ),
        ),
        trainer.mesh,
    )

    step_fn = trainer._build_train_step()
    shard = batch_sharding(trainer.mesh)
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
        err_msg=f"Adam trajectories diverged:\n jax  {jax_losses}\n "
                f"torch {torch_losses}",
    )
    # and training actually went somewhere (same batch: step 8 vs step 0)
    assert jax_losses[8] < jax_losses[0]
