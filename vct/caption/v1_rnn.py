"""V1 stepwise RNN captioner — the LSTM/GRU option of the configurable S2VT
(``s2vt/main_configurable.py:136-313``).

The reference's v1 captioner offers three decoder types; the transformer one
lives in ``vct.caption.transformer`` and this module adds the other two:

  * encoder (``main_configurable.py:136-189``): per-frame CNN + GAP + Linear
    to embed_size, then {LSTM, GRU} + self-MultiheadAttention over time
  * decoder (``main_configurable.py:192-258``): token embedding, stepwise
    {LSTM, GRU} stack, cross-MultiheadAttention from the RNN output onto the
    encoder sequence, Linear to vocab

TPU-shaped differences, on purpose:
  * teacher forcing runs the decoder RNN as ONE ``lax.scan`` over the caption
    and the cross-attention as ONE batched MHA over all steps (numerically
    identical to the reference's per-step python loop, which re-enters
    attention once per token — ``main_configurable.py:234-249``);
  * greedy decode is a single jitted ``lax.scan`` carrying the hidden state
    and the fed-back argmax token — fixed shapes, no host round-trips;
  * greedy attends to the WHOLE encoder sequence each step. The reference's
    ``generate_caption`` attends only to frame t at step t
    (``main_configurable.py:298-299``), which silently breaks past
    t >= num_frames — a quirk SURVEY.md §7 flags to fix, not copy.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vct.caption.models import FrameEncoderCNN
from vct.models.recurrent import GRU, LSTM

__all__ = ["StackedRNNCell", "V1RNNCaptioner"]


class StackedRNNCell(nn.Module):
    """Multi-layer torch-semantics LSTM/GRU *step* cell (one timestep).

    Weight layout matches ``vct.models.recurrent`` (torch layout, gate orders
    [i,f,g,o] / [r,z,n], two bias vectors) so torch state_dicts port 1:1.
    """

    input_size: int
    hidden_size: int
    num_layers: int
    rnn_type: str  # lstm | gru

    def setup(self):
        H = self.hidden_size
        G = 4 if self.rnn_type == "lstm" else 3
        k = float(H) ** -0.5

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else H
            w_ih.append(self.param(f"weight_ih_l{layer}", init, (in_size, G * H)))
            w_hh.append(self.param(f"weight_hh_l{layer}", init, (H, G * H)))
            b_ih.append(self.param(f"bias_ih_l{layer}", init, (G * H,)))
            b_hh.append(self.param(f"bias_hh_l{layer}", init, (G * H,)))
        self.w_ih, self.w_hh = w_ih, w_hh
        self.b_ih, self.b_hh = b_ih, b_hh

    def init_state(self, batch: int, dtype=jnp.float32):
        shape = (self.num_layers, batch, self.hidden_size)
        if self.rnn_type == "lstm":
            return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)
        return jnp.zeros(shape, dtype)

    def __call__(self, x, state):
        """x (B, input_size); returns (top-layer h (B, H), new state)."""
        H = self.hidden_size
        if self.rnn_type == "lstm":
            hs, cs = state
            new_h, new_c = [], []
            for layer in range(self.num_layers):
                gates = (
                    x @ self.w_ih[layer] + self.b_ih[layer]
                    + hs[layer] @ self.w_hh[layer] + self.b_hh[layer]
                )
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * cs[layer] + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                new_h.append(h)
                new_c.append(c)
                x = h
            return x, (jnp.stack(new_h), jnp.stack(new_c))
        hs = state
        new_h = []
        for layer in range(self.num_layers):
            xp = x @ self.w_ih[layer] + self.b_ih[layer]
            hp = hs[layer] @ self.w_hh[layer] + self.b_hh[layer]
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * hs[layer]
            new_h.append(h)
            x = h
        del H
        return x, jnp.stack(new_h)


class V1RNNCaptioner(nn.Module):
    vocab_size: int
    cnn_backbone: str = "resnet50"
    embed_size: int = 512
    hidden_size: int = 512
    rnn_type: str = "gru"  # lstm | gru
    enc_layers: int = 1
    dec_layers: int = 3  # reference Decoder default num_layers=3
    num_heads: int = 8
    max_len: int = 20
    start_token: int = 1
    end_token: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.cnn = FrameEncoderCNN(
            backbone=self.cnn_backbone, output_size=self.embed_size,
            dtype=self.dtype, name="cnn",
        )
        rnn_cls = LSTM if self.rnn_type == "lstm" else GRU
        self.enc_rnn = rnn_cls(
            hidden_size=self.hidden_size, num_layers=self.enc_layers, name="enc_rnn"
        )
        self.enc_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=0.0, name="enc_attn"
        )
        self.embed = nn.Embed(self.vocab_size, self.embed_size, name="embed")
        self.dec_cell = StackedRNNCell(
            input_size=self.embed_size, hidden_size=self.hidden_size,
            num_layers=self.dec_layers, rnn_type=self.rnn_type, name="dec_cell",
        )
        self.cross_attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=0.0, name="cross_attn"
        )
        self.fc = nn.Dense(self.vocab_size, name="fc")

    def encode(self, video):
        """(B, T, H, W, 3) -> encoder sequence (B, T, hidden)."""
        b, t = video.shape[0], video.shape[1]
        frames = video.reshape((b * t,) + video.shape[2:])
        feats = self.cnn(frames).reshape(b, t, -1)  # CNN+GAP+proj to embed
        rnn_out = self.enc_rnn(feats)
        return self.enc_attn(rnn_out, rnn_out, rnn_out)

    def _dec_rnn_seq(self, emb):
        """Run the decoder RNN stack over a whole (B, L, E) sequence."""
        state0 = self.dec_cell.init_state(emb.shape[0], emb.dtype)

        def step(state, e_t):
            out, state = self.dec_cell(e_t, state)
            return state, out

        _, outs = jax.lax.scan(step, state0, jnp.moveaxis(emb, 1, 0))
        return jnp.moveaxis(outs, 0, 1)  # (B, L, H)

    def __call__(self, video, targets=None, deterministic: bool = True):
        """Teacher-forced log-probs (B, max_len, V); decoder input at step i
        is <start> then targets[:, :-1] (same schedule as the other
        captioners). With targets=None, free-runs greedily."""
        del deterministic  # the v1 reference decoder applies no dropout
        enc = self.encode(video)  # one CNN+RNN encode serves both paths
        b = video.shape[0]
        start = jnp.full((b, 1), self.start_token, jnp.int32)
        if targets is None:
            toks = self._greedy_tokens(enc)
            inputs = jnp.concatenate([start, toks[:, : self.max_len - 1]], axis=1)
        else:
            inputs = jnp.concatenate(
                [start, targets[:, : self.max_len - 1].astype(jnp.int32)], axis=1
            )
        emb = self.embed(inputs)
        rnn_out = self._dec_rnn_seq(emb)
        # Per-step query onto the encoder sequence, all steps in one MHA
        # (numerically identical to the reference's per-token attention loop).
        attn = self.cross_attn(rnn_out, enc, enc)
        return jax.nn.log_softmax(self.fc(attn), axis=-1)

    def _greedy_tokens(self, enc):
        """Free-running argmax over a given encoder sequence; one scan."""
        b = enc.shape[0]
        state0 = self.dec_cell.init_state(b, enc.dtype)
        tok0 = jnp.full((b,), self.start_token, jnp.int32)

        def step(carry, _):
            state, tok = carry
            out, state = self.dec_cell(self.embed(tok), state)
            attn = self.cross_attn(out[:, None, :], enc, enc)[:, 0]
            nxt = jnp.argmax(self.fc(attn), axis=-1).astype(jnp.int32)
            return (state, nxt), nxt

        (_, _), toks = jax.lax.scan(
            step, (state0, tok0), None, length=self.max_len
        )
        return jnp.moveaxis(toks, 0, 1)  # (B, max_len)

    def greedy_caption(self, video):
        """Token ids (B, max_len), free-running argmax; one jitted scan."""
        return self._greedy_tokens(self.encode(video))
