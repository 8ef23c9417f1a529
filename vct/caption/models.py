"""S2VT captioning models (C26-C28).

The v2 ("beam") stack of the reference, rebuilt TPU-first:

  * ``FrameEncoderCNN`` — frozen backbone + Linear projection to
    ``cnn_output_size`` (``s2vt/beam_search.py:260-294`` PretrainedCNN; the
    reference loops the CNN per frame at ``beam_search.py:369-374`` — here all
    B·T frames go through in one batch, same math, one conv stack launch)
  * ``EncoderRNN`` — Linear embed + GRU (``beam_search.py:230-243``)
  * ``LuongAttention`` — general attention: score = (W q) K^T
    (``beam_search.py:297-308``)
  * ``AttnDecoderStep`` — one decode step: embed token, attend with the
    GRU hidden as query, GRU over [embed; context], vocab projection
    (``beam_search.py:311-352`` forward_step)
  * ``S2VTModel`` — teacher-forced training forward via ``lax.scan`` over the
    target tokens (``beam_search.py:354-381``); the per-token Python loop of
    the reference (``beam_search.py:330-341``) becomes a compiled scan.

Decoding lives in ``vct.caption.beam`` (on-device beam/greedy search).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vct.models.backbones import build_backbone
from vct.models.recurrent import GRU

__all__ = ["FrameEncoderCNN", "EncoderRNN", "LuongAttention", "AttnDecoderStep", "S2VTModel"]


class FrameEncoderCNN(nn.Module):
    backbone: str = "resnet50"
    output_size: int = 512
    finetune: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames):  # (N, H, W, 3)
        bb, _ = build_backbone(self.backbone, dtype=self.dtype, module_name="cnn")
        feats = bb(frames)
        if not self.finetune:
            feats = jax.lax.stop_gradient(feats)
        return nn.Dense(self.output_size, name="fc")(feats)


class EncoderRNN(nn.Module):
    hidden_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (B, T, F)
        x = nn.Dense(self.hidden_size, name="embedding")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        y = GRU(hidden_size=self.hidden_size, num_layers=1, name="gru")(x)
        return y, y[:, -1, :]  # outputs, final hidden


class LuongAttention(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, query, keys):
        """query (B, H); keys (B, T, H) -> (context (B, H), weights (B, T))."""
        q = nn.Dense(self.hidden_size, name="attn")(query)
        scores = jnp.einsum("bh,bth->bt", q, keys)
        weights = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bt,bth->bh", weights, keys)
        return context, weights


class AttnDecoderStep(nn.Module):
    """One decoder step. Parameters are shared across steps, so the same
    module drives teacher forcing, greedy, and beam decode."""

    hidden_size: int
    vocab_size: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, token, hidden, encoder_outputs, deterministic: bool = True):
        """token (B,) int32; hidden (B, H); encoder_outputs (B, T, H).

        Returns (logits (B, V), new_hidden (B, H), attn_weights (B, T)).
        """
        emb = nn.Embed(self.vocab_size, self.hidden_size, name="embedding")(token)
        emb = nn.Dropout(self.dropout, deterministic=deterministic)(emb)
        context, weights = LuongAttention(self.hidden_size, name="attention")(
            hidden, encoder_outputs
        )
        x = jnp.concatenate([emb, context], axis=-1)  # (B, 2H)

        # Single fused GRU cell over the 2H input (torch GRU(2H -> H) step,
        # beam_search.py:322 gru). Gate order [r, z, n] as everywhere else.
        H = self.hidden_size
        k = float(H) ** -0.5  # torch init: U(-1/sqrt(H), 1/sqrt(H))

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("gru_w_ih", init, (2 * H, 3 * H))
        w_hh = self.param("gru_w_hh", init, (H, 3 * H))
        b_ih = self.param("gru_b_ih", init, (3 * H,))
        b_hh = self.param("gru_b_hh", init, (3 * H,))
        xp = x @ w_ih + b_ih
        hp = hidden @ w_hh + b_hh
        r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
        z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
        nq = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
        new_hidden = (1.0 - z) * nq + z * hidden

        logits = nn.Dense(self.vocab_size, name="out")(new_hidden)
        return logits, new_hidden, weights


class S2VTModel(nn.Module):
    """Full encoder-decoder with teacher-forced forward."""

    vocab_size: int
    cnn_backbone: str = "resnet50"
    cnn_output_size: int = 512
    hidden_size: int = 512
    max_len: int = 30
    start_token: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.cnn = FrameEncoderCNN(
            backbone=self.cnn_backbone,
            output_size=self.cnn_output_size,
            dtype=self.dtype,
            name="cnn",
        )
        self.encoder = EncoderRNN(self.hidden_size, self.dropout, name="encoder")
        self.decoder_step = AttnDecoderStep(
            self.hidden_size, self.vocab_size, self.dropout, name="decoder"
        )

    def encode(self, video, deterministic: bool = True) -> Tuple[jax.Array, jax.Array]:
        b, t = video.shape[0], video.shape[1]
        frames = video.reshape((b * t,) + video.shape[2:])
        feats = self.cnn(frames).reshape(b, t, -1)
        return self.encoder(feats, deterministic=deterministic)

    def __call__(self, video, targets=None, deterministic: bool = True):
        """Teacher-forced (or free-running) decode.

        The decoder input at step i is targets[:, i] under teacher forcing
        (matching the reference's schedule, beam_search.py:330-341, after the
        initial <start>), else the argmax of the previous step. Compiled as
        one ``nn.scan`` over max_len steps — the reference's per-token Python
        loop becomes a single fused while-loop on device.

        Returns log-probs (B, max_len, V).
        """
        enc_out, hidden = self.encode(video, deterministic=deterministic)
        b = video.shape[0]
        start = jnp.full((b,), self.start_token, jnp.int32)
        teacher = targets is not None
        xs = (
            jnp.moveaxis(targets.astype(jnp.int32), 1, 0)
            if teacher
            else jnp.zeros((self.max_len, b), jnp.int32)
        )

        def body(mdl, carry, teacher_token):
            hidden, token, enc = carry
            logits, hidden, _ = mdl.decoder_step(
                token, hidden, enc, deterministic=deterministic
            )
            next_token = (
                teacher_token
                if teacher
                else jnp.argmax(logits, axis=-1).astype(jnp.int32)
            )
            return (hidden, next_token, enc), logits

        scanned = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=self.max_len,
        )
        _, logits = scanned(self, (hidden, start, enc_out), xs)
        return jax.nn.log_softmax(jnp.moveaxis(logits, 0, 1), axis=-1)
