"""Caption decoder torch goldens + beam-search golden.

Closes the v2-decoder half of the parity story (the encoder was already
golden-tested in test_full_model_parity.py): reconstructs the reference's
``DecoderAttention`` (``s2vt/beam_search.py:311-352``) and the 1s2vt
4-layer variant (``s2vt/1s2vt_models.py:296-341``: 4-layer encoder/decoder
GRUs, attention query = last layer's hidden) in torch, ports the weights,
and asserts step logits / hiddens / attention weights and the full
teacher-forced log-prob sequence match within 1e-4.

Also the beam-search golden: an INDEPENDENT host-python beam implementation
(correct semantics — not the reference's O(max_len^2) quirk) over shared
weights, asserted token-for-token and score-for-score against the jitted
on-device ``vct.caption.beam.beam_search`` for K in {1, 2, 3}, including
early-finished beams.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # torch-golden matrix: full lane only

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vct.caption.models import AttnDecoderStep, EncoderRNN  # noqa: E402

B, T, FEAT, HID, V, MAXLEN = 2, 5, 7, 12, 20, 6


# ---------------------------------------------------------------------------
# Torch reference modules (independent reconstruction, eval-mode)
# ---------------------------------------------------------------------------


class TLuongAttention(torch.nn.Module):
    """beam_search.py:297-308 (identical in 1s2vt_models.py:281-292)."""

    def __init__(self, hidden_size):
        super().__init__()
        self.attn = torch.nn.Linear(hidden_size, hidden_size)

    def forward(self, query, keys):
        query = self.attn(query)
        scores = torch.bmm(query, keys.permute(0, 2, 1))
        attn_weights = F.softmax(scores, dim=-1)
        context = torch.bmm(attn_weights, keys)
        return context, attn_weights


class TEncoderRNN(torch.nn.Module):
    """beam_search.py:229-243 (num_layers=1) / 1s2vt_models.py:227-240
    (num_layers=4). Dropout inert in eval mode."""

    def __init__(self, input_size, hidden_size, num_layers):
        super().__init__()
        self.embedding = torch.nn.Linear(input_size, hidden_size)
        self.gru = torch.nn.GRU(
            hidden_size, hidden_size, num_layers=num_layers, batch_first=True
        )

    def forward(self, x):
        return self.gru(self.embedding(x))


class TDecoderAttention(torch.nn.Module):
    """beam_search.py:311-352 / 1s2vt_models.py:296-341. For num_layers=1
    the v2 query ``hidden.permute(1,0,2)`` equals the 1s2vt query
    ``hidden[-1].unsqueeze(1)``, so one reconstruction covers both."""

    def __init__(self, hidden_size, output_size, num_layers, max_len):
        super().__init__()
        self.embedding = torch.nn.Embedding(output_size, hidden_size)
        self.attention = TLuongAttention(hidden_size)
        self.gru = torch.nn.GRU(
            2 * hidden_size, hidden_size, num_layers=num_layers,
            batch_first=True,
        )
        self.out = torch.nn.Linear(hidden_size, output_size)
        self.max_len = max_len

    def forward_step(self, inp, hidden, encoder_outputs):
        embedded = self.embedding(inp)  # (B, 1, H)
        query = hidden[-1].unsqueeze(1)
        context, attn_weights = self.attention(query, encoder_outputs)
        gru_in = torch.cat((embedded, context), dim=2)
        output, hidden = self.gru(gru_in, hidden)
        return self.out(output), hidden, attn_weights

    def forward(self, encoder_outputs, encoder_hidden, target_tensor,
                start_token=1):
        bsz = encoder_outputs.size(0)
        decoder_input = torch.full((bsz, 1), start_token, dtype=torch.long)
        decoder_hidden = encoder_hidden
        outs = []
        for i in range(self.max_len):
            step_out, decoder_hidden, _ = self.forward_step(
                decoder_input, decoder_hidden, encoder_outputs
            )
            outs.append(step_out)
            decoder_input = target_tensor[:, i].unsqueeze(1)  # teacher forcing
        return F.log_softmax(torch.cat(outs, dim=1), dim=-1)


# ---------------------------------------------------------------------------
# Weight porting
# ---------------------------------------------------------------------------


def _np(t):
    return t.detach().numpy()


def _dense(lin):
    return {"kernel": _np(lin.weight).T, "bias": _np(lin.bias)}


def _port_encoder(t_enc, num_layers):
    gru = {}
    for layer in range(num_layers):
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            v = _np(getattr(t_enc.gru, f"{kind}_l{layer}"))
            gru[f"{kind}_l{layer}"] = v.T if kind.startswith("weight") else v
    return {"embedding": _dense(t_enc.embedding), "gru": gru}


def _port_decoder(t_dec, num_layers):
    p = {
        "embedding": {"embedding": _np(t_dec.embedding.weight)},
        "attention": {"attn": _dense(t_dec.attention.attn)},
        "out": _dense(t_dec.out),
    }
    for layer in range(num_layers):
        sfx = "" if layer == 0 else f"_l{layer}"
        p[f"gru_w_ih{sfx}"] = _np(getattr(t_dec.gru, f"weight_ih_l{layer}")).T
        p[f"gru_w_hh{sfx}"] = _np(getattr(t_dec.gru, f"weight_hh_l{layer}")).T
        p[f"gru_b_ih{sfx}"] = _np(getattr(t_dec.gru, f"bias_ih_l{layer}"))
        p[f"gru_b_hh{sfx}"] = _np(getattr(t_dec.gru, f"bias_hh_l{layer}"))
    return p


def _as_jax(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_layers", [1, 4])
def test_decoder_step_matches_torch(num_layers):
    """One forward_step: logits, every layer's new hidden, attn weights.
    num_layers=1 is the v2 decoder (beam_search.py:344-352), 4 is 1s2vt's
    (1s2vt_models.py:331-341, last-layer attention query)."""
    torch.manual_seed(0)
    rng = np.random.RandomState(1)
    with torch.no_grad():
        t_dec = TDecoderAttention(HID, V, num_layers, MAXLEN).eval()
        enc_outs = rng.randn(B, T, HID).astype(np.float32)
        hidden0 = rng.randn(num_layers, B, HID).astype(np.float32)
        tokens = rng.randint(0, V, (B,))
        want_logits, want_hidden, want_w = t_dec.forward_step(
            torch.from_numpy(tokens[:, None]),
            torch.from_numpy(hidden0),
            torch.from_numpy(enc_outs),
        )

    dec = AttnDecoderStep(hidden_size=HID, vocab_size=V, num_layers=num_layers)
    params = _as_jax(_port_decoder(t_dec, num_layers))
    h0 = (
        jnp.asarray(hidden0[0])
        if num_layers == 1
        else jnp.asarray(np.transpose(hidden0, (1, 0, 2)))  # (B, L, H)
    )
    logits, new_hidden, w = dec.apply(
        {"params": params}, jnp.asarray(tokens), h0, jnp.asarray(enc_outs)
    )
    np.testing.assert_allclose(
        np.asarray(logits), want_logits[:, 0].numpy(), atol=1e-4, rtol=0
    )
    got_hidden = (
        np.asarray(new_hidden)[None]
        if num_layers == 1
        else np.transpose(np.asarray(new_hidden), (1, 0, 2))
    )
    np.testing.assert_allclose(got_hidden, want_hidden.numpy(), atol=1e-4, rtol=0)
    np.testing.assert_allclose(
        np.asarray(w), want_w[:, 0].numpy(), atol=1e-5, rtol=0
    )


@pytest.mark.parametrize("num_layers", [1, 4])
def test_teacher_forced_decode_matches_torch(num_layers):
    """Full encoder -> teacher-forced decode: per-step log-probs track torch
    across all MAXLEN steps (the missing half of the v2 parity story, and
    the whole 1s2vt variant: 4-layer encoder hidden seeding the 4-layer
    decoder, 1s2vt_models.py:313)."""
    torch.manual_seed(0)
    rng = np.random.RandomState(2)
    feats = rng.randn(B, T, FEAT).astype(np.float32)
    targets = rng.randint(0, V, (B, MAXLEN))
    with torch.no_grad():
        t_enc = TEncoderRNN(FEAT, HID, num_layers).eval()
        t_dec = TDecoderAttention(HID, V, num_layers, MAXLEN).eval()
        enc_outs, enc_hidden = t_enc(torch.from_numpy(feats))
        want = t_dec(
            enc_outs, enc_hidden, torch.from_numpy(targets)
        ).numpy()  # (B, MAXLEN, V) log-probs

    enc = EncoderRNN(hidden_size=HID, num_layers=num_layers)
    enc_params = _as_jax(_port_encoder(t_enc, num_layers))
    outs, hidden = enc.apply({"params": enc_params}, jnp.asarray(feats))
    np.testing.assert_allclose(
        np.asarray(outs), enc_outs.numpy(), atol=1e-4, rtol=0
    )
    want_h = (
        enc_hidden[0].numpy()
        if num_layers == 1
        else np.transpose(enc_hidden.numpy(), (1, 0, 2))
    )
    np.testing.assert_allclose(np.asarray(hidden), want_h, atol=1e-4, rtol=0)

    dec = AttnDecoderStep(hidden_size=HID, vocab_size=V, num_layers=num_layers)
    dec_params = _as_jax(_port_decoder(t_dec, num_layers))
    token = jnp.ones((B,), jnp.int32)  # <start> = 1
    got = []
    for i in range(MAXLEN):
        logits, hidden, _ = dec.apply({"params": dec_params}, token, hidden, outs)
        got.append(jax.nn.log_softmax(logits, axis=-1))
        token = jnp.asarray(targets[:, i], jnp.int32)  # teacher forcing
    got = np.asarray(jnp.stack(got, axis=1))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


# ---------------------------------------------------------------------------
# Beam-search golden: independent host beam vs the jitted device beam
# ---------------------------------------------------------------------------


def _host_beam_search(step_fn, state0, bsz, beam_width, max_len,
                      start_token=1, end_token=2, pad_token=0):
    """Reference beam search, written independently of vct.caption.beam:
    per-batch-element Python lists of (score, tokens, state, done), exact
    log-softmax expansion, finished beams propose only a zero-cost <pad>
    continuation. Deliberately correct semantics (no O(max_len^2) decoder
    re-runs, beam_search.py:330-341), which is exactly why it can serve as
    the golden for the device implementation."""
    results = []
    for b in range(bsz):
        beams = [(0.0, [start_token], jax.tree_util.tree_map(
            lambda x: x[b : b + 1], state0), False)]
        for _ in range(max_len):
            cands = []
            for score, toks, st, done in beams:
                if done:
                    cands.append((score, toks + [pad_token], st, True))
                    continue
                logits, new_st = step_fn(np.asarray([toks[-1]]), st)
                logp = np.asarray(jax.nn.log_softmax(logits[0]))
                for tok in range(len(logp)):
                    cands.append((
                        score + float(logp[tok]), toks + [tok], new_st,
                        tok == end_token,
                    ))
            cands.sort(key=lambda c: -c[0])
            beams = cands[:beam_width]
        best = max(beams, key=lambda c: c[0])
        results.append((best[1], best[0]))
    return results


@pytest.mark.parametrize("beam_width", [1, 2, 3])
def test_beam_search_matches_independent_host_beam(beam_width):
    from vct.caption.beam import beam_search
    from vct.caption.models import S2VTModel

    VOCAB, H, TT, LEN = 12, 8, 2, 7
    model = S2VTModel(
        vocab_size=VOCAB, cnn_backbone="resnet18", cnn_output_size=6,
        hidden_size=H, max_len=LEN,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(B, TT, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # Bias the output layer toward <end>=2 so some beams finish early —
    # the early-finish masking path must agree too.
    params = jax.tree_util.tree_map(
        lambda a: np.array(a, copy=True), variables["params"]
    )
    params["decoder"]["out"]["bias"][2] += 2.0
    variables = {**variables, "params": _as_jax(params)}

    got_tokens, got_scores = beam_search(
        model, variables, x, beam_width=beam_width, max_len=LEN
    )

    enc_out, hidden0 = model.apply(variables, x, method=model.encode)

    want = []
    for b in range(B):
        enc_b = enc_out[b : b + 1]

        def step_fn(tok, h):
            logits, new_h, _ = model.apply(
                variables, jnp.asarray(tok, jnp.int32), h, enc_b,
                method=lambda mdl, t, hh, e: mdl.decoder_step(t, hh, e),
            )
            return logits, new_h

        res = _host_beam_search(
            step_fn, hidden0[b : b + 1], 1, beam_width, LEN
        )
        want.append(res[0])

    # early-finish coverage: at least one sequence contains <end>
    all_tokens = np.asarray(got_tokens)
    assert (all_tokens == 2).any(), "no beam finished early; weak fixture"
    for b in range(B):
        want_toks, want_score = want[b]
        np.testing.assert_allclose(
            float(got_scores[b]), want_score, atol=1e-4, rtol=0
        )
        assert list(map(int, all_tokens[b])) == list(map(int, want_toks)), (
            f"batch {b}: beams disagree"
        )


# ---------------------------------------------------------------------------
# Gradient golden: the trainer's token-masked NLL through fc+encoder+decoder
# ---------------------------------------------------------------------------


def _grads_as_params_t(module):
    """Clone ``module`` with every parameter replaced by its gradient, so the
    same porting functions map the torch gradient tree into the flax layout
    (the test_train_parity.py pattern)."""
    import copy

    clone = copy.deepcopy(module)
    src = dict(module.named_parameters())
    for name, p in clone.named_parameters():
        g = src[name].grad
        p.data = torch.zeros_like(p.data) if g is None else g.detach().clone()
    return clone


def _compare_grad_trees(got, want, prefix=""):
    assert set(got.keys()) == set(want.keys()), (
        f"{prefix}: keys {sorted(got)} vs {sorted(want)}"
    )
    for k in got:
        path = f"{prefix}/{k}"
        if isinstance(got[k], dict):
            _compare_grad_trees(got[k], want[k], path)
        else:
            g, w = np.asarray(got[k]), np.asarray(want[k])
            scale = float(np.abs(w).max()) if w.size else 0.0
            np.testing.assert_allclose(
                g, w, atol=max(1e-7, 3e-4 * scale), rtol=0,
                err_msg=f"gradient mismatch: {path}",
            )


@pytest.mark.parametrize("num_layers", [1, 4])
def test_caption_loss_grads_match_torch(num_layers):
    """jax.grad of the TRAINER's token-masked NLL (CE with pad tokens
    excluded, ``beam_search.py:260-294`` trains fc+encoder+decoder under
    CrossEntropyLoss(ignore_index=pad)) through the feature-fed S2VT graph
    vs torch autograd on ported weights — the caption half of the
    gradient-parity story (classifier half: test_train_parity.py)."""
    from vct.caption.models import S2VTModel
    from vct.caption.train import CaptionTrainer

    OUT = 9  # cnn fc projection width (distinct from FEAT/HID on purpose)
    torch.manual_seed(3)
    rng = np.random.RandomState(4)
    feats = rng.randn(B, T, FEAT).astype(np.float32)
    targets = rng.randint(0, V, (B, MAXLEN))
    targets[0, -2:] = 0  # pad tail: the ignore_index mask is load-bearing
    row_mask = np.ones((B,), np.float32)

    t_fc = torch.nn.Linear(FEAT, OUT)
    t_enc = TEncoderRNN(OUT, HID, num_layers)
    t_dec = TDecoderAttention(HID, V, num_layers, MAXLEN)
    tt = torch.from_numpy(targets)
    enc_outs, enc_hidden = t_enc(t_fc(torch.from_numpy(feats)))
    logp = t_dec(enc_outs, enc_hidden, tt)  # (B, MAXLEN, V) log-probs
    tok = (tt != 0).float()
    nll = -logp.gather(-1, tt.unsqueeze(-1)).squeeze(-1)
    t_loss = (nll * tok).sum() / tok.sum()
    t_loss.backward()

    model = S2VTModel(
        vocab_size=V, cnn_output_size=OUT, hidden_size=HID,
        max_len=MAXLEN, dropout=0.0, rnn_layers=num_layers,
    )
    params = {
        "cnn": {"fc": _dense(t_fc)},
        "encoder": _port_encoder(t_enc, num_layers),
        "decoder": _port_decoder(t_dec, num_layers),
    }
    params = _as_jax(params)

    def loss_of(p):
        lp = model.apply(
            {"params": p}, jnp.asarray(feats), jnp.asarray(targets),
            deterministic=True, from_features=True,
        )
        return CaptionTrainer._token_nll(
            lp, jnp.asarray(targets), jnp.asarray(row_mask)
        )[0]

    jloss, grads = jax.value_and_grad(loss_of)(params)
    np.testing.assert_allclose(float(jloss), float(t_loss), atol=1e-5, rtol=0)

    want = {
        "cnn": {"fc": _dense(_grads_as_params_t(t_fc))},
        "encoder": _port_encoder(_grads_as_params_t(t_enc), num_layers),
        "decoder": _port_decoder(_grads_as_params_t(t_dec), num_layers),
    }
    _compare_grad_trees(
        jax.tree_util.tree_map(np.asarray, grads), want
    )


def test_caption_adam_trajectory_tracks_torch():
    """10 Adam steps through the REAL compiled caption train step (donated
    state, multi_transform freeze partition, global-norm clip, token-masked
    NLL) vs a torch loop with the same data order/lr/clip: per-step losses
    track. Complements the classifier trajectory goldens in
    test_train_parity.py."""
    from vct.caption.train import CaptionState, CaptionTrainer
    from vct.caption.vocab import Vocabulary
    from vct.core.config import CaptionConfig

    OUT, LR, CLIP, BS, STEPS = 9, 3e-3, 1.0, 4, 10
    N = 8
    torch.manual_seed(5)
    rng = np.random.RandomState(6)
    feats = rng.randn(N, T, FEAT).astype(np.float32)
    targets = rng.randint(3, V, (N, MAXLEN))
    targets[:, -1] = 0  # pad tails: the ignore mask stays load-bearing
    targets[0, -3:] = 0

    v = Vocabulary(1)
    v.build_vocabulary([" ".join(f"w{i}" for i in range(V - 4))])
    assert len(v) == V
    cfg = CaptionConfig(
        cnn_backbone="resnet18", cnn_output_size=OUT, hidden_size=HID,
        num_frames=T, max_caption_len=MAXLEN, learning_rate=LR,
        grad_clip=CLIP, dropout=0.0,
    )
    trainer = CaptionTrainer(cfg, v)

    t_fc = torch.nn.Linear(FEAT, OUT)
    t_enc = TEncoderRNN(OUT, HID, 1)
    t_dec = TDecoderAttention(HID, V, 1, MAXLEN)

    params = _as_jax({
        "cnn": {"fc": _dense(t_fc)},
        "encoder": _port_encoder(t_enc, 1),
        "decoder": _port_decoder(t_dec, 1),
    })
    state = CaptionState(
        step=jnp.zeros((), jnp.int32), params=params, extra_vars={},
        opt_state=trainer._tx.init(params), rng=jax.random.PRNGKey(0),
    )
    trainer._feature_mode = True  # feature-fed, the cached-training graph
    step_fn = trainer._build_train_step()

    # fixed shared batch order, several passes over the 2 batches
    order = [rng.permutation(N) for _ in range(STEPS * BS // N + 1)]
    batches = []
    for ep in order:
        for s in range(0, N, BS):
            batches.append(ep[s:s + BS])
    batches = batches[:STEPS]

    j_losses = []
    mask = jnp.ones((BS,), jnp.float32)
    for idx in batches:
        state, loss, _ = step_fn(
            state, jnp.asarray(feats[idx]), jnp.asarray(targets[idx]), mask
        )
        j_losses.append(float(loss))

    t_params = (
        list(t_fc.parameters()) + list(t_enc.parameters())
        + list(t_dec.parameters())
    )
    opt = torch.optim.Adam(t_params, lr=LR)
    t_losses = []
    for idx in batches:
        opt.zero_grad()
        tt = torch.from_numpy(targets[idx])
        enc_outs, enc_hidden = t_enc(t_fc(torch.from_numpy(feats[idx])))
        logp = t_dec(enc_outs, enc_hidden, tt)
        tok = (tt != 0).float()
        nll = -logp.gather(-1, tt.unsqueeze(-1)).squeeze(-1)
        loss = (nll * tok).sum() / tok.sum()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(t_params, CLIP)
        opt.step()
        t_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=1e-5)
    assert j_losses[-1] < j_losses[0]  # actually training, not frozen
