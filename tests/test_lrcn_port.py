"""Production reference-LRCN porter (vct.models.lrcn_port + the CLI).

Builds torch models with the reference's EXACT attribute layout
(``medsos_lrcn/src/models.py:121-186``: ``rnn.{i}.norm/mixer``, mixer attr
``conv1d``, per-class head list ``fc.{i}``), ports the state_dict through the
production entry points, and checks end-to-end logits against torch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vct.core.config import Config  # noqa: E402
from vct.models import build_model  # noqa: E402
from vct.models.lrcn_port import port_reference_lrcn  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    TMambaMixer,
    TResNet18,
    TRMSNorm,
    _randomize_bn_stats,
)

B, T, H, W = 2, 4, 64, 64
RNN_INPUT, HIDDEN, LAYERS, CLASSES = 8, 16, 2, 4


class TRefMixerExact(TMambaMixer):
    """TMambaMixer with the reference's parameter names (conv1d, D)."""

    def __init__(self, d_model, d_inner, n_state, dt_rank):
        super().__init__(d_model, d_inner, n_state, dt_rank)
        # register the conv under the reference's name ONLY (no duplicate
        # state_dict entries); forward() resolves self.conv through _modules
        self._modules["conv1d"] = self._modules.pop("conv")
        self.D = torch.nn.Parameter(torch.randn(d_inner))

    @property
    def conv(self):
        return self._modules["conv1d"]


class TRefBlockExact(torch.nn.Module):
    def __init__(self, d_model, d_inner, n_state, dt_rank):
        super().__init__()
        self.mixer = TRefMixerExact(d_model, d_inner, n_state, dt_rank)
        self.norm = TRMSNorm(d_model)

    def forward(self, x):
        return self.mixer(self.norm(x)) + x


class TRefLRCNExact(torch.nn.Module):
    """models.py:121-186 with the real parameter key names."""

    def __init__(self, rnn_type, rnn_out, classif_mode):
        super().__init__()
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
            self.rnn = torch.nn.ModuleList([
                TRefBlockExact(RNN_INPUT, RNN_INPUT * 2, HIDDEN, HIDDEN)
                for _ in range(LAYERS)
            ])
            out_size = RNN_INPUT
        else:
            cls = torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU
            self.rnn = cls(RNN_INPUT, HIDDEN, num_layers=LAYERS, batch_first=True)
            out_size = HIDDEN
        fc_in = out_size * (T if rnn_out == "all" else 1)
        if classif_mode == "multiclass":
            self.bn0 = torch.nn.LayerNorm(fc_in)
            self.fc = torch.nn.Linear(fc_in, fc_in // 2)
            self.bna = torch.nn.LayerNorm(fc_in // 2)
            self.fca = torch.nn.Linear(fc_in // 2, fc_in // 4)
            self.bnb = torch.nn.LayerNorm(fc_in // 4)
            self.fcb = torch.nn.Linear(fc_in // 4, CLASSES)
        else:
            self.fc = torch.nn.ModuleList(
                [torch.nn.Linear(fc_in, 1) for _ in range(CLASSES)]
            )

    def forward(self, x):
        b, t = x.shape[:2]
        x = self.cnn_backbone(x.reshape(b * t, *x.shape[2:])).reshape(b, t, -1)
        x = self.bn1(F.gelu(self.adapt1(x)))
        x = self.bn2(F.gelu(self.adapt2(x)))
        x = self.bn3(F.gelu(self.adapt3(x)))
        if self.rnn_type == "mamba":
            for layer in self.rnn:
                x = layer(x)
            rnn_out = x
        else:
            rnn_out, _ = self.rnn(x)
        pooled = rnn_out.reshape(b, -1) if self.rnn_out == "all" else rnn_out[:, -1]
        if self.classif_mode == "multiclass":
            out = self.bn0(pooled)
            out = self.bna(F.gelu(self.fc(out)))
            out = self.bnb(F.gelu(self.fca(out)))
            return self.fcb(out)
        return torch.cat([fc(pooled) for fc in self.fc], dim=1)


def _cfg(rnn_type, rnn_out, classif_mode):
    return Config().replace(**{
        "model.num_classes": str(CLASSES),
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": rnn_type,
        "model.rnn_input_size": str(RNN_INPUT),
        "model.rnn_layer": str(LAYERS),
        "model.hidden_size": str(HIDDEN),
        "model.rnn_out": rnn_out,
        "model.classif_mode": classif_mode,
        "data.sequence_length": str(T),
        "data.img_height": str(H),
        "data.img_width": str(W),
    })


@pytest.mark.parametrize("rnn_type,rnn_out,classif_mode", [
    ("lstm", "all", "multiclass"),
    ("gru", "last", "multiclass"),
    ("mamba", "all", "multiple_binary"),
])
def test_port_reference_lrcn_logits(rnn_type, rnn_out, classif_mode):
    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TRefLRCNExact(rnn_type, rnn_out, classif_mode)
        _randomize_bn_stats(t_model)
        t_model.eval()
        x = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        want = t_model(torch.from_numpy(x)).numpy()

    cfg = _cfg(rnn_type, rnn_out, classif_mode)
    model = build_model(cfg.model, T)
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    ported = port_reference_lrcn(variables, t_model.state_dict(), cfg.model)
    got = np.asarray(model.apply(ported, xj))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
    assert float(np.max(np.abs(got - want))) < 5e-4


def test_port_rejects_undescribed_weights():
    """A bidirectional checkpoint ported with bidirectional=False must raise
    (not silently drop the *_reverse half of the temporal head)."""
    torch.manual_seed(0)
    t_model = TRefLRCNExact("lstm", "all", "multiclass")
    sd = dict(t_model.state_dict())
    # graft reverse-direction weights as a bidirectional export would have
    for kind in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
        sd[f"rnn.{kind}_reverse"] = sd[f"rnn.{kind}"].clone()
    cfg = _cfg("lstm", "all", "multiclass")
    model = build_model(cfg.model, T)
    x = np.random.RandomState(1).rand(B, T, H, W, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    with pytest.raises(ValueError, match="Unconsumed"):
        port_reference_lrcn(variables, sd, cfg.model)


@pytest.mark.slow
def test_port_reference_cli_roundtrip(tmp_path):
    """state_dict .pth -> CLI -> vct checkpoint -> serving load -> same logits."""
    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TRefLRCNExact("gru", "all", "multiclass")
        _randomize_bn_stats(t_model)
        t_model.eval()
        x = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        want = t_model(torch.from_numpy(x)).numpy()
    sd_path = str(tmp_path / "ref_lrcn.pth")
    torch.save(t_model.state_dict(), sd_path)

    from vct.tools.port_reference import main as port_main

    out = str(tmp_path / "ported")
    rc = port_main([
        "--state_dict", sd_path, "--out", out,
        "--num_classes", str(CLASSES), "--sequence_length", str(T),
        "--cnn_backbone", "resnet18", "--rnn_type", "gru",
        "--rnn_input_size", str(RNN_INPUT), "--rnn_layer", str(LAYERS),
        "--hidden_size", str(HIDDEN), "--rnn_out", "all",
        "--img_height", str(H), "--img_width", str(W),
        "--classes", "a,b,c,d",
    ])
    assert rc == 0

    from vct.serve.deployment import load_model

    model, variables, class_names, _ = load_model(out)
    assert class_names == ["a", "b", "c", "d"]
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    got = np.asarray(model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables), xj
    ))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)


@pytest.mark.slow  # error path of the porter the logits tests fast-cover
def test_port_reference_shape_mismatch_raises():
    cfg = _cfg("gru", "all", "multiclass")
    model = build_model(cfg.model, T)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, 3), jnp.float32)
    )
    torch.manual_seed(0)
    wrong = TRefLRCNExact("gru", "last", "multiclass")  # head sized for "last"
    with pytest.raises((ValueError, KeyError)):
        port_reference_lrcn(variables, wrong.state_dict(), cfg.model)


def test_port_reference_extra_key_raises():
    cfg = _cfg("gru", "all", "multiclass")
    model = build_model(cfg.model, T)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, 3), jnp.float32)
    )
    torch.manual_seed(0)
    t_model = TRefLRCNExact("gru", "all", "multiclass")
    sd = dict(t_model.state_dict())
    sd["mystery.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="Unconsumed"):
        port_reference_lrcn(variables, sd, cfg.model)


def test_port_reference_videomamba_logits():
    from test_full_model_parity import TRefVideoMamba
    from vct.models.lrcn_port import port_reference_videomamba
    from vct.models.videomamba import VideoMamba

    class TRefVMExact(TRefVideoMamba):
        """Reference key names: layers.{i}.norm/mixer, classifier."""

        def __init__(self):
            super().__init__("mean", "multiclass")
            blocks = []
            for norm, mixer in zip(self.norms, self.mixers):
                blk = torch.nn.Module()
                blk.norm, blk.mixer = norm, mixer
                # reference's mixer param names
                blk.mixer._modules["conv1d"] = blk.mixer._modules.pop("conv")
                blk.mixer.D = torch.nn.Parameter(torch.randn(blk.mixer.d_inner))
                blocks.append(blk)
            self.layers = torch.nn.ModuleList(blocks)
            del self.norms, self.mixers

        def forward(self, x):
            b, t = x.shape[:2]
            x = self.cnn_backbone(x.reshape(b * t, *x.shape[2:]))
            x = self.adapt(x).reshape(b, t, -1)
            for blk in self.layers:
                u = blk.norm(x)
                # call the mixer with its conv re-exposed
                blk.mixer.conv = blk.mixer._modules["conv1d"]
                x = blk.mixer(u) + x
                del blk.mixer.conv
            x = self.norm_f(x)
            return self.classifier(x.mean(dim=1))

    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TRefVMExact()
        _randomize_bn_stats(t_model)
        t_model.eval()
        x = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        want = t_model(torch.from_numpy(x)).numpy()

    cfg = Config().replace(**{
        "model.model_family": "videomamba",
        "model.num_classes": str(CLASSES),
        "model.cnn_backbone": "resnet18",
        "model.vm_d_model": "12", "model.vm_d_inner": "24",
        "model.vm_n_state": "4", "model.vm_dt_rank": "4",
        "model.vm_n_layer": "2", "model.vm_temporal_mode": "mean",
        "data.sequence_length": str(T),
    })
    model = VideoMamba(
        num_classes=CLASSES, cnn_backbone="resnet18", n_layer=2, d_model=12,
        d_inner=24, n_state=4, dt_rank=4, num_frames=T, temporal_mode="mean",
    )
    xj = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = model.init(jax.random.PRNGKey(0), xj)
    ported = port_reference_videomamba(variables, t_model.state_dict(), cfg.model)
    got = np.asarray(model.apply(ported, xj))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)


def test_port_reference_s2vt_logits():
    """VideoAnalysisModel (beam_search.py:362-382) -> vct S2VTModel."""
    from vct.caption.models import S2VTModel
    from vct.models.lrcn_port import port_reference_s2vt

    OUT, HID, VOCAB, MAXLEN = 12, 10, 9, 5

    class TResNet18WithFC(TResNet18):
        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(512, 1000)  # discarded, like torchvision

    class TPretrainedCNN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = TResNet18WithFC()
            # the reference registers the SAME children twice
            # (beam_search.py:265-267); duplicates must be tolerated
            self.feature_extractor = torch.nn.Sequential(
                *list(self.model.children())[:-1]
            )
            self.fc = torch.nn.Linear(512, OUT)

        def forward(self, x):
            return self.fc(self.model(x))  # TResNet18.forward skips its fc

    class TVideoAnalysisModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.cnn = TPretrainedCNN()
            enc = torch.nn.Module()
            enc.embedding = torch.nn.Linear(OUT, HID)
            enc.gru = torch.nn.GRU(HID, HID, batch_first=True)
            self.encoder = enc
            dec = torch.nn.Module()
            dec.embedding = torch.nn.Embedding(VOCAB, HID)
            attn = torch.nn.Module()
            attn.attn = torch.nn.Linear(HID, HID)
            dec.attention = attn
            dec.gru = torch.nn.GRU(2 * HID, HID, batch_first=True)
            dec.out = torch.nn.Linear(HID, VOCAB)
            self.decoder = dec

        def forward(self, video, targets):
            b, t = video.shape[:2]
            feats = self.cnn(video.reshape(b * t, *video.shape[2:]))
            feats = feats.reshape(b, t, -1)
            enc_out, hidden = self.encoder.gru(self.encoder.embedding(feats))
            token = torch.full((b,), 1, dtype=torch.long)  # <start>
            logps = []
            for i in range(targets.shape[1]):
                emb = self.decoder.embedding(token)
                # Luong general attention, query = current hidden
                q = self.decoder.attention.attn(hidden.permute(1, 0, 2))
                scores = torch.bmm(q, enc_out.permute(0, 2, 1))
                w = torch.softmax(scores, dim=-1)
                ctx = torch.bmm(w, enc_out)[:, 0]
                gru_in = torch.cat([emb, ctx], dim=-1)[:, None, :]
                out, hidden = self.decoder.gru(gru_in, hidden)
                logits = self.decoder.out(out[:, 0])
                logps.append(torch.log_softmax(logits, dim=-1))
                token = targets[:, i]
            return torch.stack(logps, dim=1)

    torch.manual_seed(0)
    with torch.no_grad():
        t_model = TVideoAnalysisModel()
        _randomize_bn_stats(t_model)
        t_model.eval()
        video = np.random.RandomState(1).rand(B, T, 3, H, W).astype(np.float32)
        caps = np.random.RandomState(2).randint(0, VOCAB, (B, MAXLEN))
        want = t_model(torch.from_numpy(video), torch.from_numpy(caps)).numpy()

    model = S2VTModel(
        vocab_size=VOCAB, cnn_backbone="resnet18", cnn_output_size=OUT,
        hidden_size=HID, max_len=MAXLEN,
    )
    vj = jnp.asarray(np.transpose(video, (0, 1, 3, 4, 2)))
    cj = jnp.asarray(caps)
    variables = model.init(jax.random.PRNGKey(0), vj, cj)
    ported = port_reference_s2vt(variables, t_model.state_dict())
    got = np.asarray(model.apply(ported, vj, cj))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)
    assert float(np.max(np.abs(got - want))) < 5e-4
