"""V1 stepwise RNN captioner (main_configurable.py:192-313 LSTM/GRU option)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.caption.v1_rnn import V1RNNCaptioner

torch = pytest.importorskip("torch")

B, T, HW = 2, 3, 32
VOCAB, E, H = 11, 8, 8
LAYERS, HEADS, MAXLEN = 2, 2, 5


def _model(rnn_type):
    return V1RNNCaptioner(
        vocab_size=VOCAB, cnn_backbone="resnet18", embed_size=E, hidden_size=H,
        rnn_type=rnn_type, dec_layers=LAYERS, num_heads=HEADS, max_len=MAXLEN,
    )


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_v1_forward_and_greedy_shapes(rnn_type):
    model = _model(rnn_type)
    video = jnp.asarray(np.random.RandomState(0).rand(B, T, HW, HW, 3), jnp.float32)
    caps = jnp.asarray(np.random.RandomState(1).randint(0, VOCAB, (B, MAXLEN)))
    variables = model.init(jax.random.PRNGKey(0), video, caps)
    logp = model.apply(variables, video, caps)
    assert logp.shape == (B, MAXLEN, VOCAB)
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(-1), np.ones((B, MAXLEN)), atol=1e-4
    )
    toks = model.apply(variables, video, method="greedy_caption")
    assert toks.shape == (B, MAXLEN)
    assert toks.dtype == jnp.int32


def test_v1_trainer_dispatch():
    from vct.caption.train import build_captioner
    from vct.caption.transformer import TransformerCaptioner
    from vct.caption.models import S2VTModel
    from vct.core.config import CaptionConfig

    assert isinstance(build_captioner(CaptionConfig(), 10), S2VTModel)
    assert isinstance(
        build_captioner(CaptionConfig(model_kind="transformer"), 10),
        TransformerCaptioner,
    )
    v1 = build_captioner(CaptionConfig(model_kind="v1_lstm"), 10)
    assert v1.rnn_type == "lstm"
    assert build_captioner(CaptionConfig(model_kind="v1_gru"), 10).rnn_type == "gru"
    with pytest.raises(KeyError, match="model_kind"):
        build_captioner(CaptionConfig(model_kind="nope"), 10)


# ---------------------------------------------------------------------------
# Torch parity: decoder (embed -> stacked RNN -> cross-MHA -> fc)
# ---------------------------------------------------------------------------


def _port_mha(t_mha, heads):
    e = t_mha.embed_dim
    hd = e // heads
    w = t_mha.in_proj_weight.detach().numpy()
    b = t_mha.in_proj_bias.detach().numpy()
    out_w = t_mha.out_proj.weight.detach().numpy()
    out_b = t_mha.out_proj.bias.detach().numpy()

    def qkv(i):
        return {
            "kernel": w[i * e : (i + 1) * e].T.reshape(e, heads, hd),
            "bias": b[i * e : (i + 1) * e].reshape(heads, hd),
        }

    return {
        "query": qkv(0), "key": qkv(1), "value": qkv(2),
        "out": {"kernel": out_w.T.reshape(heads, hd, e), "bias": out_b},
    }


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_v1_decoder_matches_torch(rnn_type):
    torch.manual_seed(0)
    t_embed = torch.nn.Embedding(VOCAB, E)
    t_rnn = (torch.nn.LSTM if rnn_type == "lstm" else torch.nn.GRU)(
        E, H, LAYERS, batch_first=True
    )
    t_mha = torch.nn.MultiheadAttention(H, HEADS, batch_first=True)
    t_fc = torch.nn.Linear(H, VOCAB)

    rng = np.random.RandomState(2)
    caps = rng.randint(0, VOCAB, (B, MAXLEN))
    enc = rng.randn(B, T, H).astype(np.float32)

    with torch.no_grad():
        emb = t_embed(torch.from_numpy(caps))
        rnn_out, _ = t_rnn(emb)
        attn, _ = t_mha(rnn_out, torch.from_numpy(enc), torch.from_numpy(enc))
        want = t_fc(attn).numpy()

    model = _model(rnn_type)
    video = jnp.zeros((B, T, HW, HW, 3), jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), video, jnp.asarray(caps)
    )
    params = dict(variables["params"])
    params["embed"] = {"embedding": t_embed.weight.detach().numpy()}
    cell = {}
    for layer in range(LAYERS):
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            v = getattr(t_rnn, f"{kind}_l{layer}").detach().numpy()
            cell[f"{kind}_l{layer}"] = v.T if kind.startswith("weight") else v
    params["dec_cell"] = cell
    params["cross_attn"] = _port_mha(t_mha, HEADS)
    params["fc"] = {
        "kernel": t_fc.weight.detach().numpy().T,
        "bias": t_fc.bias.detach().numpy(),
    }
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        **{k: v for k, v in variables.items() if k != "params"},
    }

    from flax import linen as nn

    def decode_only(mdl, enc_arr, caps_arr):
        emb = mdl.embed(caps_arr)
        rnn_out = mdl._dec_rnn_seq(emb)
        return mdl.fc(mdl.cross_attn(rnn_out, enc_arr, enc_arr))

    got = nn.apply(decode_only, model)(
        variables, jnp.asarray(enc), jnp.asarray(caps)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Beam search across captioner families
# ---------------------------------------------------------------------------


def _first_end(tokens, end=2):
    out = []
    for t in tokens:
        if int(t) == end:
            break
        out.append(int(t))
    return out


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_v1_beam_width1_equals_greedy(rnn_type):
    from vct.caption.beam import beam_search

    model = _model(rnn_type)
    video = jnp.asarray(np.random.RandomState(3).rand(B, T, HW, HW, 3), jnp.float32)
    caps = jnp.zeros((B, MAXLEN), jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), video, caps)

    greedy = np.asarray(model.apply(variables, video, method="greedy_caption"))
    toks, scores = beam_search(model, variables, video, beam_width=1,
                               max_len=MAXLEN)
    toks = np.asarray(toks)
    assert toks.shape == (B, MAXLEN + 1)
    assert np.all(np.isfinite(np.asarray(scores)))
    for b in range(B):
        # beam row leads with <start>; compare up to the first <end>
        assert _first_end(toks[b, 1:]) == _first_end(greedy[b])


def test_v1_beam_width3_scores_at_least_greedy():
    from vct.caption.beam import beam_search

    model = _model("gru")
    video = jnp.asarray(np.random.RandomState(4).rand(B, T, HW, HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), video,
                           jnp.zeros((B, MAXLEN), jnp.int32))
    _, s1 = beam_search(model, variables, video, beam_width=1, max_len=MAXLEN)
    _, s3 = beam_search(model, variables, video, beam_width=3, max_len=MAXLEN)
    assert np.all(np.asarray(s3) >= np.asarray(s1) - 1e-5)


def test_transformer_beam_width1_equals_greedy():
    from vct.caption.beam import beam_search
    from vct.caption.transformer import TransformerCaptioner

    model = TransformerCaptioner(
        vocab_size=VOCAB, cnn_backbone="resnet18", cnn_output_size=E,
        hidden_size=E, num_heads=2, num_layers=1, max_len=MAXLEN,
    )
    video = jnp.asarray(np.random.RandomState(5).rand(B, T, HW, HW, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), video,
                           jnp.zeros((B, MAXLEN), jnp.int32))
    greedy = np.asarray(model.apply(variables, video, method="greedy_caption"))
    toks, _ = beam_search(model, variables, video, beam_width=1, max_len=MAXLEN)
    toks = np.asarray(toks)
    for b in range(B):
        # transformer greedy buffer leads with <start> and holds max_len-1
        # generated tokens; compare that common window (up to the first end)
        assert _first_end(toks[b, 1:MAXLEN]) == _first_end(greedy[b, 1:MAXLEN])
