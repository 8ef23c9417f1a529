"""End-to-end golden parity: full LRCN logits vs the torch reference.

Reconstructs the reference LRCN (``medsos_lrcn/src/models.py:121-234``) in
torch — including a torchvision-layout ResNet-18 backbone written here from
the published architecture — ports every weight into our flax LRCN with the
production porting machinery, and asserts logits within 1e-3 across
{lstm, gru, mamba} x {all, last} x {multiclass, multiple_binary}. This turns
BASELINE.md's north-star "logits within 1e-3 of the PyTorch reference" into a
checked invariant. Also covers the S2VT encoder (beam_search.py:229-294).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # torch-golden matrix: full lane only

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vct.models.backbones.port import load_torch_backbone  # noqa: E402
from vct.models.lrcn import LRCN  # noqa: E402

B, T, H, W = 2, 4, 64, 64
RNN_INPUT, HIDDEN, LAYERS, CLASSES = 8, 16, 2, 4


# ---------------------------------------------------------------------------
# Torch reference modules (independent reconstruction, eval-mode)
# ---------------------------------------------------------------------------


class TBasicBlock(torch.nn.Module):
    def __init__(self, in_ch, ch, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, ch, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(ch)
        self.conv2 = torch.nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(ch)
        self.downsample = None
        if stride != 1 or in_ch != ch:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(in_ch, ch, 1, stride, bias=False),
                torch.nn.BatchNorm2d(ch),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idt)


class TResNet18(torch.nn.Module):
    """torchvision-layout resnet18 feature extractor (state_dict keys match
    torchvision's, so load_torch_resnet ports it directly)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        chans = (64, 128, 256, 512)
        in_ch = 64
        for stage, ch in enumerate(chans, start=1):
            blocks = []
            for b in range(2):
                stride = 2 if (stage > 1 and b == 0) else 1
                blocks.append(TBasicBlock(in_ch if b == 0 else ch, ch, stride))
            self.add_module(f"layer{stage}", torch.nn.Sequential(*blocks))
            in_ch = ch

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for stage in (1, 2, 3, 4):
            x = getattr(self, f"layer{stage}")(x)
        return torch.flatten(F.adaptive_avg_pool2d(x, 1), 1)


class TRMSNorm(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.ones(d))

    def forward(self, x):
        return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-5) * self.weight


class TMambaMixer(torch.nn.Module):
    """ParallelMamba per models.py:20-106 (sequential scan)."""

    def __init__(self, d_model, d_inner, n_state, dt_rank, k=3):
        super().__init__()
        self.d_inner, self.n_state, self.dt_rank = d_inner, n_state, dt_rank
        self.A_log = torch.nn.Parameter(torch.randn(d_inner, n_state))
        self.in_proj = torch.nn.Linear(d_model, 2 * d_inner)
        self.conv = torch.nn.Conv1d(d_inner, d_inner, k, groups=d_inner, padding=k - 1)
        self.x_proj = torch.nn.Linear(d_inner, dt_rank + 2 * n_state, bias=False)
        self.dt_proj = torch.nn.Linear(dt_rank, d_inner)
        self.out_proj = torch.nn.Linear(d_inner, d_model)

    def forward(self, x):
        L = x.shape[1]
        u, res = self.in_proj(x).split(self.d_inner, dim=-1)
        u = self.conv(u.permute(0, 2, 1))[:, :, :L].permute(0, 2, 1)
        u = F.silu(u)
        dt, Bm, C = self.x_proj(u).split(
            [self.dt_rank, self.n_state, self.n_state], dim=-1
        )
        delta = F.softplus(self.dt_proj(dt))
        A = -torch.exp(self.A_log)
        dA = torch.exp(delta.unsqueeze(-1) * A)
        dBu = delta.unsqueeze(-1) * Bm.unsqueeze(2) * u.unsqueeze(-1)
        h = torch.zeros(u.shape[0], u.shape[2], A.shape[1])
        ys = []
        for t in range(L):
            h = dA[:, t] * h + dBu[:, t]
            ys.append(torch.einsum("bdn,bn->bd", h, C[:, t]))
        y = torch.stack(ys, dim=1)
        return self.out_proj(y * F.silu(res))


class TRefLRCN(torch.nn.Module):
    """models.py:121-234 verbatim-in-behavior (dropouts inert in eval).

    Dims default to the module constants the parity matrix uses; the
    convergence benchmark (test_convergence.py) passes wider ones."""

    def __init__(self, rnn_type, rnn_out, classif_mode,
                 rnn_input=None, hidden=None, layers=None, t=None,
                 classes=None):
        super().__init__()
        rnn_input = RNN_INPUT if rnn_input is None else rnn_input
        hidden = HIDDEN if hidden is None else hidden
        layers = LAYERS if layers is None else layers
        t = T if t is None else t
        classes = CLASSES if classes is None else classes
        self.rnn_type, self.rnn_out, self.classif_mode = rnn_type, rnn_out, classif_mode
        self.cnn_backbone = TResNet18()
        f = 512
        self.adapt1 = torch.nn.Linear(f, f // 2)
        self.bn1 = torch.nn.LayerNorm(f // 2)
        self.adapt2 = torch.nn.Linear(f // 2, f // 4)
        self.bn2 = torch.nn.LayerNorm(f // 4)
        self.adapt3 = torch.nn.Linear(f // 4, rnn_input)
        self.bn3 = torch.nn.LayerNorm(rnn_input)

        if rnn_type == "lstm":
            self.rnn = torch.nn.LSTM(rnn_input, hidden, num_layers=layers,
                                     batch_first=True)
            out_size = hidden
        elif rnn_type == "gru":
            self.rnn = torch.nn.GRU(rnn_input, hidden, num_layers=layers,
                                    batch_first=True)
            out_size = hidden
        else:
            self.norms = torch.nn.ModuleList([TRMSNorm(rnn_input) for _ in range(layers)])
            self.mixers = torch.nn.ModuleList([
                TMambaMixer(rnn_input, rnn_input * 2, hidden, hidden)
                for _ in range(layers)
            ])
            out_size = rnn_input

        fc_in = out_size * (t if rnn_out == "all" else 1)
        if classif_mode == "multiclass":
            self.bn0 = torch.nn.LayerNorm(fc_in)
            self.fc = torch.nn.Linear(fc_in, fc_in // 2)
            self.bna = torch.nn.LayerNorm(fc_in // 2)
            self.fca = torch.nn.Linear(fc_in // 2, fc_in // 4)
            self.bnb = torch.nn.LayerNorm(fc_in // 4)
            self.fcb = torch.nn.Linear(fc_in // 4, classes)
        else:
            self.fcs = torch.nn.ModuleList(
                [torch.nn.Linear(fc_in, 1) for _ in range(classes)]
            )

    def forward(self, x):  # (B, T, 3, H, W)
        b, t = x.shape[:2]
        x = self.cnn_backbone(x.reshape(b * t, *x.shape[2:])).reshape(b, t, -1)
        x = self.bn1(F.gelu(self.adapt1(x)))
        x = self.bn2(F.gelu(self.adapt2(x)))
        x = self.bn3(F.gelu(self.adapt3(x)))
        if self.rnn_type == "mamba":
            for norm, mixer in zip(self.norms, self.mixers):
                x = mixer(norm(x)) + x
            rnn_out = x
        else:
            rnn_out, _ = self.rnn(x)
        pooled = rnn_out.reshape(b, -1) if self.rnn_out == "all" else rnn_out[:, -1]
        if self.classif_mode == "multiclass":
            out = self.bn0(pooled)
            out = self.bna(F.gelu(self.fc(out)))
            out = self.bnb(F.gelu(self.fca(out)))
            return self.fcb(out)
        return torch.cat([fc(pooled) for fc in self.fcs], dim=1)


# ---------------------------------------------------------------------------
# Weight porting: torch reference -> our flax tree
# ---------------------------------------------------------------------------


def _np(t):
    return t.detach().numpy()


def _dense(lin):
    return {"kernel": _np(lin.weight).T, "bias": _np(lin.bias)}


def _ln(ln):
    return {"scale": _np(ln.weight), "bias": _np(ln.bias)}


def _port_rnn_stack(t_rnn, num_layers):
    params = {}
    for layer in range(num_layers):
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            v = _np(getattr(t_rnn, f"{kind}_l{layer}"))
            params[f"{kind}_l{layer}"] = v.T if kind.startswith("weight") else v
    return params


def _port_mixer(m):
    return {
        "A_log": _np(m.A_log),
        "D": np.zeros(m.d_inner, np.float32),
        "in_proj": _dense(m.in_proj),
        "conv_kernel": _np(m.conv.weight)[:, 0, :].T,
        "conv_bias": _np(m.conv.bias),
        "x_proj": {"kernel": _np(m.x_proj.weight).T},
        "dt_proj": _dense(m.dt_proj),
        "out_proj": _dense(m.out_proj),
    }


def _port_full(t_model, flax_variables, rnn_type, classif_mode, layers=None):
    layers = LAYERS if layers is None else layers
    bb_vars = {
        "params": flax_variables["params"]["cnn_backbone"],
        "batch_stats": flax_variables["batch_stats"]["cnn_backbone"],
    }
    bb = load_torch_backbone("resnet18", bb_vars, t_model.cnn_backbone.state_dict())
    params = dict(flax_variables["params"])
    params["cnn_backbone"] = bb["params"]
    params["adapt"] = {
        "adapt1": _dense(t_model.adapt1), "bn1": _ln(t_model.bn1),
        "adapt2": _dense(t_model.adapt2), "bn2": _ln(t_model.bn2),
        "adapt3": _dense(t_model.adapt3), "bn3": _ln(t_model.bn3),
    }
    if rnn_type == "mamba":
        for i in range(layers):
            params[f"mamba_{i}"] = {
                "norm": {"weight": _np(t_model.norms[i].weight)},
                "mixer": _port_mixer(t_model.mixers[i]),
            }
    elif rnn_type != "none":  # "none": caller ports the temporal head itself
        params["rnn"] = {rnn_type: _port_rnn_stack(t_model.rnn, layers)}
    if classif_mode == "multiclass":
        params["head"] = {
            "bn0": _ln(t_model.bn0), "fc": _dense(t_model.fc),
            "bna": _ln(t_model.bna), "fca": _dense(t_model.fca),
            "bnb": _ln(t_model.bnb), "fcb": _dense(t_model.fcb),
        }
    else:
        params["head"] = {"binary_heads": {
            "kernel": np.concatenate([_np(fc.weight) for fc in t_model.fcs]).T,
            "bias": np.concatenate([_np(fc.bias) for fc in t_model.fcs]),
        }}
    out = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    out["batch_stats"] = dict(flax_variables["batch_stats"])
    out["batch_stats"]["cnn_backbone"] = jax.tree_util.tree_map(
        jnp.asarray, bb["batch_stats"]
    )
    return out


def _randomize_bn_stats(t_model, seed=7):
    """Give the torch BN layers non-trivial running stats so eval-mode BN is
    actually exercised (fresh init is mean 0 / var 1 = a no-op)."""
    rng = np.random.RandomState(seed)
    for mod in t_model.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(
                torch.from_numpy(rng.randn(mod.num_features).astype(np.float32) * 0.1)
            )
            mod.running_var.copy_(
                torch.from_numpy(
                    (np.abs(rng.randn(mod.num_features)) + 0.5).astype(np.float32)
                )
            )


@pytest.mark.parametrize("classif_mode", ["multiclass", "multiple_binary"])
@pytest.mark.parametrize("rnn_out", ["all", "last"])
@pytest.mark.parametrize("rnn_type", ["lstm", "gru", "mamba"])
def test_lrcn_logits_match_torch(rnn_type, rnn_out, classif_mode):
    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TRefLRCN(rnn_type, rnn_out, classif_mode)
        _randomize_bn_stats(t_model)
        t_model.eval()
        x = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        want = t_model(torch.from_numpy(x)).numpy()

    model = LRCN(
        num_classes=CLASSES, sequence_length=T, hidden_size=HIDDEN,
        rnn_input_size=RNN_INPUT, cnn_backbone="resnet18", rnn_type=rnn_type,
        rnn_layer=LAYERS, rnn_out=rnn_out, classif_mode=classif_mode,
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))  # NCHW -> NHWC frames
    variables = model.init(jax.random.PRNGKey(0), xj)
    ported = _port_full(t_model, variables, rnn_type, classif_mode)
    got = np.asarray(model.apply(ported, xj))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
    # and well within: the north-star tolerance should not be at the edge
    assert float(np.max(np.abs(got - want))) < 5e-4


def test_s2vt_encoder_matches_torch():
    """PretrainedCNN(+fc) -> EncoderRNN parity (beam_search.py:229-294)."""
    from vct.caption.models import EncoderRNN, FrameEncoderCNN

    OUT, HID = 12, 10
    torch.manual_seed(0)
    with torch.no_grad():
        t_cnn = TResNet18()
        _randomize_bn_stats(t_cnn)
        t_cnn.eval()
        t_fc = torch.nn.Linear(512, OUT)
        t_emb = torch.nn.Linear(OUT, HID)
        t_gru = torch.nn.GRU(HID, HID, batch_first=True)
        frames = np.random.RandomState(1).rand(B * T, 3, H, W).astype(np.float32)
        feats = t_fc(t_cnn(torch.from_numpy(frames)))
        emb = t_emb(feats.reshape(B, T, OUT))
        t_out, t_hidden = t_gru(emb)

    f_cnn = FrameEncoderCNN(backbone="resnet18", output_size=OUT)
    fx = jnp.asarray(np.transpose(frames, (0, 2, 3, 1)))
    v = f_cnn.init(jax.random.PRNGKey(0), fx)
    bb_vars = {"params": v["params"]["cnn"], "batch_stats": v["batch_stats"]["cnn"]}
    bb = load_torch_backbone("resnet18", bb_vars, t_cnn.state_dict())
    ported = {
        "params": jax.tree_util.tree_map(jnp.asarray, {
            "cnn": bb["params"],
            "fc": {"kernel": _np(t_fc.weight).T, "bias": _np(t_fc.bias)},
        }),
        "batch_stats": {"cnn": jax.tree_util.tree_map(jnp.asarray, bb["batch_stats"])},
    }
    f_feats = f_cnn.apply(ported, fx)
    np.testing.assert_allclose(np.asarray(f_feats), feats.numpy(), atol=1e-3, rtol=0)

    enc = EncoderRNN(hidden_size=HID)
    enc_params = {"params": jax.tree_util.tree_map(jnp.asarray, {
        "embedding": {"kernel": _np(t_emb.weight).T, "bias": _np(t_emb.bias)},
        "gru": {
            "weight_ih_l0": _np(t_gru.weight_ih_l0).T,
            "weight_hh_l0": _np(t_gru.weight_hh_l0).T,
            "bias_ih_l0": _np(t_gru.bias_ih_l0),
            "bias_hh_l0": _np(t_gru.bias_hh_l0),
        },
    })}
    outs, hidden = enc.apply(enc_params, jnp.asarray(feats.numpy().reshape(B, T, OUT)))
    np.testing.assert_allclose(np.asarray(outs), t_out.numpy(), atol=1e-3, rtol=0)
    np.testing.assert_allclose(
        np.asarray(hidden), t_hidden[0].numpy(), atol=1e-3, rtol=0
    )


class TRefVideoMamba(torch.nn.Module):
    """lrcn/videomamba.py:332-434 (frozen CNN + Linear adapt + mamba stack +
    RMSNorm + temporal pool + heads), eval-mode."""

    def __init__(self, temporal_mode, classif_mode, n_layer=2, d_model=12,
                 d_inner=24, n_state=4, dt_rank=4):
        super().__init__()
        self.temporal_mode, self.classif_mode = temporal_mode, classif_mode
        self.cnn_backbone = TResNet18()
        self.adapt = torch.nn.Linear(512, d_model)
        self.norms = torch.nn.ModuleList([TRMSNorm(d_model) for _ in range(n_layer)])
        self.mixers = torch.nn.ModuleList([
            TMambaMixer(d_model, d_inner, n_state, dt_rank) for _ in range(n_layer)
        ])
        self.norm_f = TRMSNorm(d_model)
        head_in = d_model * T if temporal_mode == "all" else d_model
        if classif_mode == "multiclass":
            self.classifier = torch.nn.Linear(head_in, CLASSES)
        else:
            self.fcs = torch.nn.ModuleList(
                [torch.nn.Linear(head_in, 1) for _ in range(CLASSES)]
            )

    def forward(self, x):
        b, t = x.shape[:2]
        x = self.cnn_backbone(x.reshape(b * t, *x.shape[2:]))
        x = self.adapt(x).reshape(b, t, -1)
        for norm, mixer in zip(self.norms, self.mixers):
            x = mixer(norm(x)) + x
        x = self.norm_f(x)
        if self.temporal_mode == "mean":
            x = x.mean(dim=1)
        elif self.temporal_mode == "max":
            x = x.max(dim=1)[0]
        elif self.temporal_mode == "last":
            x = x[:, -1]
        else:
            x = x.reshape(b, -1)
        if self.classif_mode == "multiclass":
            return self.classifier(x)
        return torch.cat([fc(x) for fc in self.fcs], dim=1)


@pytest.mark.parametrize("temporal_mode,classif_mode", [
    ("mean", "multiclass"), ("max", "multiclass"), ("last", "multiple_binary"),
    ("all", "multiclass"),
])
def test_videomamba_logits_match_torch(temporal_mode, classif_mode):
    from vct.models.videomamba import VideoMamba

    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TRefVideoMamba(temporal_mode, classif_mode)
        _randomize_bn_stats(t_model)
        t_model.eval()
        x = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        want = t_model(torch.from_numpy(x)).numpy()

    model = VideoMamba(
        num_classes=CLASSES, cnn_backbone="resnet18", n_layer=2, d_model=12,
        d_inner=24, n_state=4, dt_rank=4, num_frames=T,
        temporal_mode=temporal_mode, classification_mode=classif_mode,
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    bb_vars = {
        "params": variables["params"]["cnn_backbone"],
        "batch_stats": variables["batch_stats"]["cnn_backbone"],
    }
    bb = load_torch_backbone("resnet18", bb_vars, t_model.cnn_backbone.state_dict())
    params = dict(variables["params"])
    params["cnn_backbone"] = bb["params"]
    params["adapt"] = _dense(t_model.adapt)
    for i in range(2):
        params[f"layer_{i}"] = {
            "norm": {"weight": _np(t_model.norms[i].weight)},
            "mixer": _port_mixer(t_model.mixers[i]),
        }
    params["norm_f"] = {"weight": _np(t_model.norm_f.weight)}
    if classif_mode == "multiclass":
        params["classifier"] = _dense(t_model.classifier)
    else:
        params["classifier"] = {
            "kernel": np.concatenate([_np(fc.weight) for fc in t_model.fcs]).T,
            "bias": np.concatenate([_np(fc.bias) for fc in t_model.fcs]),
        }
    ported = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": {"cnn_backbone": jax.tree_util.tree_map(
            jnp.asarray, bb["batch_stats"]
        )},
    }
    got = np.asarray(model.apply(ported, xj))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
    assert float(np.max(np.abs(got - want))) < 5e-4


class TBidirMixer(TMambaMixer):
    """ParallelMamba bidirectional variant (models.py:47-103: backward
    flip-scan, concat, res duplicated, out_proj on 2*d_inner)."""

    def __init__(self, d_model, d_inner, n_state, dt_rank, k=3):
        super().__init__(d_model, d_inner, n_state, dt_rank, k)
        self.out_proj = torch.nn.Linear(2 * d_inner, d_model)

    def forward(self, x):
        L = x.shape[1]
        u, res = self.in_proj(x).split(self.d_inner, dim=-1)
        u = self.conv(u.permute(0, 2, 1))[:, :, :L].permute(0, 2, 1)
        u = F.silu(u)
        dt, Bm, C = self.x_proj(u).split(
            [self.dt_rank, self.n_state, self.n_state], dim=-1
        )
        delta = F.softplus(self.dt_proj(dt))
        A = -torch.exp(self.A_log)

        def scan(u_, delta_, Bm_, C_):
            dA = torch.exp(delta_.unsqueeze(-1) * A)
            dBu = delta_.unsqueeze(-1) * Bm_.unsqueeze(2) * u_.unsqueeze(-1)
            h = torch.zeros(u_.shape[0], u_.shape[2], A.shape[1])
            ys = []
            for t in range(u_.shape[1]):
                h = dA[:, t] * h + dBu[:, t]
                ys.append(torch.einsum("bdn,bn->bd", h, C_[:, t]))
            return torch.stack(ys, dim=1)

        fwd = scan(u, delta, Bm, C)
        idx = torch.arange(L - 1, -1, -1)
        # The reference's backward direction flips ONLY u and delta
        # (models.py:51-53); B and C stay in forward time order. This mirror
        # must model the reference, not a "corrected" backward scan.
        bwd = scan(u[:, idx], delta[:, idx], Bm, C)[:, idx]
        y = torch.cat([fwd, bwd], dim=-1)
        res = torch.cat([res, res], dim=-1)
        return self.out_proj(y * F.silu(res))


class TRefLRCNBidir(TRefLRCN):
    def __init__(self, rnn_type, rnn_out, classif_mode):
        torch.nn.Module.__init__(self)
        self.rnn_type, self.rnn_out, self.classif_mode = rnn_type, rnn_out, classif_mode
        self.cnn_backbone = TResNet18()
        f = 512
        self.adapt1 = torch.nn.Linear(f, f // 2)
        self.bn1 = torch.nn.LayerNorm(f // 2)
        self.adapt2 = torch.nn.Linear(f // 2, f // 4)
        self.bn2 = torch.nn.LayerNorm(f // 4)
        self.adapt3 = torch.nn.Linear(f // 4, RNN_INPUT)
        self.bn3 = torch.nn.LayerNorm(RNN_INPUT)
        if rnn_type == "mamba":
            self.norms = torch.nn.ModuleList([TRMSNorm(RNN_INPUT) for _ in range(LAYERS)])
            self.mixers = torch.nn.ModuleList([
                TBidirMixer(RNN_INPUT, RNN_INPUT * 2, HIDDEN, HIDDEN)
                for _ in range(LAYERS)
            ])
            out_size = RNN_INPUT
        else:
            cls = torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU
            self.rnn = cls(RNN_INPUT, HIDDEN, num_layers=LAYERS,
                           bidirectional=True, batch_first=True)
            out_size = HIDDEN * 2
        fc_in = out_size * (T if rnn_out == "all" else 1)
        self.bn0 = torch.nn.LayerNorm(fc_in)
        self.fc = torch.nn.Linear(fc_in, fc_in // 2)
        self.bna = torch.nn.LayerNorm(fc_in // 2)
        self.fca = torch.nn.Linear(fc_in // 2, fc_in // 4)
        self.bnb = torch.nn.LayerNorm(fc_in // 4)
        self.fcb = torch.nn.Linear(fc_in // 4, CLASSES)


def _port_rnn_stack_bidir(t_rnn, num_layers):
    params = {}
    for layer in range(num_layers):
        for suffix in ("", "_reverse"):
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                v = _np(getattr(t_rnn, f"{kind}_l{layer}{suffix}"))
                params[f"{kind}_l{layer}{suffix}"] = (
                    v.T if kind.startswith("weight") else v
                )
    return params


@pytest.mark.parametrize("rnn_type", ["lstm", "mamba"])
def test_lrcn_bidirectional_logits_match_torch(rnn_type):
    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TRefLRCNBidir(rnn_type, "all", "multiclass")
        _randomize_bn_stats(t_model)
        t_model.eval()
        x = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        want = t_model(torch.from_numpy(x)).numpy()

    model = LRCN(
        num_classes=CLASSES, sequence_length=T, hidden_size=HIDDEN,
        rnn_input_size=RNN_INPUT, cnn_backbone="resnet18", rnn_type=rnn_type,
        rnn_layer=LAYERS, rnn_out="all", classif_mode="multiclass",
        bidirectional=True,
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    ported = _port_full(t_model, variables, "none", "multiclass")
    params = dict(ported["params"])
    if rnn_type == "mamba":
        for i in range(LAYERS):
            params[f"mamba_{i}"] = jax.tree_util.tree_map(jnp.asarray, {
                "norm": {"weight": _np(t_model.norms[i].weight)},
                "mixer": _port_mixer(t_model.mixers[i]),
            })
    else:
        params["rnn"] = jax.tree_util.tree_map(
            jnp.asarray, {"lstm": _port_rnn_stack_bidir(t_model.rnn, LAYERS)}
        )
    ported["params"] = params
    got = np.asarray(model.apply(ported, xj))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
    assert float(np.max(np.abs(got - want))) < 5e-4
