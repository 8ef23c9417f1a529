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
    """Frozen backbone + trainable projection (beam_search.py:260-294 — only
    the feature extractor sits under no_grad, :290-291; the fc trains).

    ``features_only`` returns the raw frozen-backbone features (the
    bit-constant, cacheable part); ``from_features`` consumes such features
    and applies just the trainable fc — caption.feature_cache plumbing."""

    backbone: str = "resnet50"
    output_size: int = 512
    finetune: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames, *, from_features: bool = False,
                 features_only: bool = False):  # (N, H, W, 3) | (N, F)
        if from_features:
            feats = frames
        else:
            bb, _ = build_backbone(
                self.backbone, dtype=self.dtype, module_name="cnn"
            )
            feats = bb(frames)
            if not self.finetune:
                feats = jax.lax.stop_gradient(feats)
            if features_only:
                return feats
        return nn.Dense(self.output_size, name="fc")(feats)


class EncoderRNN(nn.Module):
    """Linear embed + (multi-layer) GRU.

    v2 uses one layer (``beam_search.py:230-243``); the 1s2vt variant stacks
    four (``s2vt/1s2vt_models.py:233`` — ``nn.GRU(..., num_layers=4)``).
    With ``num_layers == 1`` the final hidden is (B, H); with more layers it
    is the per-layer stack (B, num_layers, H) — torch's ``h_n`` with the
    layer axis behind batch — which seeds the equally-deep decoder GRU."""

    hidden_size: int
    dropout: float = 0.1
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):  # (B, T, F)
        x = nn.Dense(self.hidden_size, name="embedding")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        gru = GRU(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            name="gru",
        )
        if self.num_layers == 1:
            y = gru(x)
            return y, y[:, -1, :]  # outputs, final hidden
        return gru(x, return_final=True)  # outputs, (B, L, H)


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
    module drives teacher forcing, greedy, and beam decode.

    ``num_layers == 1`` is the v2 decoder (``beam_search.py:311-352``);
    ``num_layers > 1`` is the 1s2vt variant (``s2vt/1s2vt_models.py:
    296-341``): a stacked GRU whose layer 0 sees [embed; context] (2H) and
    whose attention QUERY is the last layer's hidden only
    (``1s2vt_models.py:333-336`` — ``hidden[-1]``)."""

    hidden_size: int
    vocab_size: int
    dropout: float = 0.1
    num_layers: int = 1

    @nn.compact
    def __call__(self, token, hidden, encoder_outputs, deterministic: bool = True):
        """token (B,) int32; hidden (B, H) for num_layers == 1 else
        (B, num_layers, H); encoder_outputs (B, T, H).

        Returns (logits (B, V), new_hidden (same shape as hidden),
        attn_weights (B, T)).
        """
        emb = nn.Embed(self.vocab_size, self.hidden_size, name="embedding")(token)
        emb = nn.Dropout(self.dropout, deterministic=deterministic)(emb)
        query = hidden if self.num_layers == 1 else hidden[:, -1]
        context, weights = LuongAttention(self.hidden_size, name="attention")(
            query, encoder_outputs
        )
        x = jnp.concatenate([emb, context], axis=-1)  # (B, 2H)

        # Fused GRU cells over the stacked layers (torch GRU(2H -> H,
        # num_layers=L) single step, beam_search.py:322 / 1s2vt:301).
        # Gate order [r, z, n] as everywhere else. Layer-0 params keep the
        # unsuffixed v2 names so single-layer checkpoints stay loadable.
        H = self.hidden_size
        k = float(H) ** -0.5  # torch init: U(-1/sqrt(H), 1/sqrt(H))

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        def gru_cell(x_in, h, layer):
            sfx = "" if layer == 0 else f"_l{layer}"
            w_ih = self.param(f"gru_w_ih{sfx}", init, (x_in.shape[-1], 3 * H))
            w_hh = self.param(f"gru_w_hh{sfx}", init, (H, 3 * H))
            b_ih = self.param(f"gru_b_ih{sfx}", init, (3 * H,))
            b_hh = self.param(f"gru_b_hh{sfx}", init, (3 * H,))
            xp = x_in @ w_ih + b_ih
            hp = h @ w_hh + b_hh
            r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
            z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
            nq = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
            return (1.0 - z) * nq + z * h

        if self.num_layers == 1:
            new_hidden = gru_cell(x, hidden, 0)
            top = new_hidden
        else:
            layer_in, states = x, []
            for i in range(self.num_layers):
                layer_in = gru_cell(layer_in, hidden[:, i], i)
                states.append(layer_in)
            new_hidden = jnp.stack(states, axis=1)  # (B, L, H)
            top = layer_in

        logits = nn.Dense(self.vocab_size, name="out")(top)
        return logits, new_hidden, weights


class S2VTModel(nn.Module):
    """Full encoder-decoder with teacher-forced forward.

    ``rnn_layers`` selects the variant: 1 = the v2 model
    (``beam_search.py:229-382``), 4 = the 1s2vt model
    (``s2vt/1s2vt_models.py:227-378``: 4-layer encoder GRU whose per-layer
    final hiddens seed the 4-layer decoder GRU, attention queried by the
    last layer's hidden only). Encoder and decoder share the depth because
    the encoder hidden initializes the decoder hidden directly
    (``1s2vt_models.py:313`` decoder_hidden = encoder_hidden)."""

    vocab_size: int
    cnn_backbone: str = "resnet50"
    cnn_output_size: int = 512
    hidden_size: int = 512
    max_len: int = 30
    start_token: int = 1
    dropout: float = 0.1
    rnn_layers: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.cnn = FrameEncoderCNN(
            backbone=self.cnn_backbone,
            output_size=self.cnn_output_size,
            dtype=self.dtype,
            name="cnn",
        )
        self.encoder = EncoderRNN(
            self.hidden_size, self.dropout, self.rnn_layers, name="encoder"
        )
        self.decoder_step = AttnDecoderStep(
            self.hidden_size, self.vocab_size, self.dropout, self.rnn_layers,
            name="decoder",
        )

    # caption.feature_cache: the frozen backbone's output (98.5% of caption
    # step time, docs/performance.md) is bit-constant across epochs — the
    # trainer extracts it once and trains fc/encoder/decoder from the block.
    supports_feature_cache = True

    def encode(
        self, video, deterministic: bool = True, from_features: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        b, t = video.shape[0], video.shape[1]
        frames = video.reshape((b * t,) + video.shape[2:])
        feats = self.cnn(frames, from_features=from_features).reshape(b, t, -1)
        return self.encoder(feats, deterministic=deterministic)

    def extract_features(self, video):
        """(B, T, H, W, 3) -> frozen-backbone features (B, T, F)."""
        b, t = video.shape[0], video.shape[1]
        frames = video.reshape((b * t,) + video.shape[2:])
        return self.cnn(frames, features_only=True).reshape(b, t, -1)

    def __call__(self, video, targets=None, deterministic: bool = True,
                 from_features: bool = False):
        """Teacher-forced (or free-running) decode.

        The decoder input at step i is targets[:, i] under teacher forcing
        (matching the reference's schedule, beam_search.py:330-341, after the
        initial <start>), else the argmax of the previous step. Compiled as
        one ``nn.scan`` over max_len steps — the reference's per-token Python
        loop becomes a single fused while-loop on device.

        Returns log-probs (B, max_len, V).
        """
        enc_out, hidden = self.encode(
            video, deterministic=deterministic, from_features=from_features
        )
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
