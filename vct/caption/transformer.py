"""Transformer captioner — the S2VT v1 variant (C26/C27).

The reference's configurable captioner offers LSTM/GRU+attention OR
TransformerEncoder/TransformerDecoder with learned positional encodings
(``s2vt/main_configurable.py:138-313``, encoder 155-189 / decoder 192-313).
This is that transformer option, TPU-shaped:

  * encoder: frozen CNN frame features -> Dense -> +learned positions ->
    N pre-LN self-attention blocks
  * decoder: token embeddings + learned positions -> N pre-LN blocks of
    causal self-attention, cross-attention over frames, MLP -> vocab logits
  * teacher forcing runs the WHOLE caption in parallel under a causal mask
    (one fused attention pass — no per-token loop at all, unlike the v1
    reference which re-runs the decoder per step inside its forward,
    ``main_configurable.py:330-341``)
  * greedy decode re-scores the fixed-length buffer per step inside one
    ``lax.fori_loop`` (L=30 re-passes of a tiny decoder; still one jit)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vct.caption.models import FrameEncoderCNN

__all__ = ["TransformerCaptioner"]


class _Block(nn.Module):
    hidden: int
    heads: int
    dropout: float
    cross: bool = False

    @nn.compact
    def __call__(self, x, enc=None, mask=None, deterministic=True):
        y = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dropout_rate=self.dropout, name="self_attn"
        )(y, y, mask=mask, deterministic=deterministic)
        x = x + y
        if self.cross:
            y = nn.LayerNorm(epsilon=1e-5, name="ln_cross")(x)
            y = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dropout_rate=self.dropout, name="cross_attn"
            )(y, enc, deterministic=deterministic)
            x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        y = nn.Dense(self.hidden * 4, name="mlp_in")(y)
        y = nn.Dense(self.hidden, name="mlp_out")(nn.gelu(y))
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return x + y


class TransformerCaptioner(nn.Module):
    vocab_size: int
    cnn_backbone: str = "resnet50"
    cnn_output_size: int = 512
    hidden_size: int = 512
    num_heads: int = 8
    num_layers: int = 2
    max_len: int = 30
    start_token: int = 1
    dropout: float = 0.1
    dtype: Any = jnp.float32

    def setup(self):
        self.cnn = FrameEncoderCNN(
            backbone=self.cnn_backbone, output_size=self.cnn_output_size,
            dtype=self.dtype, name="cnn",
        )
        self.enc_proj = nn.Dense(self.hidden_size, name="enc_proj")
        self.enc_pos = nn.Embed(512, self.hidden_size, name="enc_pos")
        self.enc_blocks = [
            _Block(self.hidden_size, self.num_heads, self.dropout,
                   name=f"enc_{i}")
            for i in range(self.num_layers)
        ]
        self.tok_emb = nn.Embed(self.vocab_size, self.hidden_size, name="tok_emb")
        self.dec_pos = nn.Embed(self.max_len, self.hidden_size, name="dec_pos")
        self.dec_blocks = [
            _Block(self.hidden_size, self.num_heads, self.dropout, cross=True,
                   name=f"dec_{i}")
            for i in range(self.num_layers)
        ]
        self.out_ln = nn.LayerNorm(epsilon=1e-5, name="out_ln")
        self.out = nn.Dense(self.vocab_size, name="out")

    def encode(self, video, deterministic: bool = True):
        b, t = video.shape[0], video.shape[1]
        frames = video.reshape((b * t,) + video.shape[2:])
        feats = self.cnn(frames).reshape(b, t, -1)
        x = self.enc_proj(feats) + self.enc_pos(jnp.arange(t))
        for block in self.enc_blocks:
            x = block(x, deterministic=deterministic)
        return x

    def decode_logits(self, enc, tokens, deterministic: bool = True):
        """tokens (B, L) decoder inputs -> logits (B, L, V), causal."""
        L = tokens.shape[1]
        x = self.tok_emb(tokens) + self.dec_pos(jnp.arange(L))
        causal = nn.make_causal_mask(tokens)
        for block in self.dec_blocks:
            x = block(x, enc=enc, mask=causal, deterministic=deterministic)
        return self.out(self.out_ln(x))

    def __call__(self, video, targets=None, deterministic: bool = True):
        """Teacher-forced log-probs (B, max_len, V); decoder input at step i
        is <start> then targets[:, :-1] (the v1 schedule)."""
        enc = self.encode(video, deterministic=deterministic)
        b = video.shape[0]
        start = jnp.full((b, 1), self.start_token, jnp.int32)
        if targets is not None:
            inputs = jnp.concatenate(
                [start, targets[:, : self.max_len - 1].astype(jnp.int32)], axis=1
            )
            logits = self.decode_logits(enc, inputs, deterministic=deterministic)
            return jax.nn.log_softmax(logits, axis=-1)
        # free-running greedy inside one fori_loop over the fixed buffer
        buf = jnp.full((b, self.max_len), 0, jnp.int32)
        buf = jnp.concatenate([start, buf[:, 1:]], axis=1)

        def step(i, buf):
            logits = self.decode_logits(enc, buf, deterministic=True)
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            return jax.lax.cond(
                i + 1 < self.max_len,
                lambda bf: bf.at[:, i + 1].set(nxt),
                lambda bf: bf,
                buf,
            )

        buf = jax.lax.fori_loop(0, self.max_len - 1, step, buf)
        logits = self.decode_logits(enc, buf, deterministic=True)
        return jax.nn.log_softmax(logits, axis=-1)

    def greedy_caption(self, video):
        """Token ids (B, max_len) greedily decoded (ends included)."""
        enc = self.encode(video, deterministic=True)
        b = video.shape[0]
        buf = jnp.zeros((b, self.max_len), jnp.int32)
        buf = buf.at[:, 0].set(self.start_token)

        def step(i, buf):
            logits = self.decode_logits(enc, buf, deterministic=True)
            nxt = jnp.argmax(logits[:, i], axis=-1).astype(jnp.int32)
            return jax.lax.cond(
                i + 1 < self.max_len,
                lambda bf: bf.at[:, i + 1].set(nxt),
                lambda bf: bf,
                buf,
            )

        return jax.lax.fori_loop(0, self.max_len - 1, step, buf)
