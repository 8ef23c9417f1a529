"""LRCN — frozen CNN backbone + adapter MLP + {LSTM, GRU, Mamba} temporal head.

The flagship classifier family, matching ``medsos_lrcn/src/models.py:121-234``:

    (B, T, H, W, 3) ──flatten B·T──► backbone ──► (B, T, F)
      ──► adapter (canonical 3-stage or Adapt DSL)
      ──► rnn_type ∈ {lstm, gru} stack   |  mamba residual blocks
      ──► rnn_out "all" (flatten T·D) | "last" ([:, -1])
      ──► multiclass MLP head | per-class binary head

TPU-first design decisions vs the reference:
  * channels-last (B, T, H, W, 3) layout — the native TPU conv layout;
  * the backbone runs on the flattened B·T frame batch in one conv stack
    (same B·T trick as models.py:190-192 — it is the right call on TPU too,
    it keeps the MXU fed with one large batch);
  * the backbone output is wrapped in ``stop_gradient`` (reference freezes
    backbone params, models.py:144-145) so backprop never traverses the conv
    stack at all;
  * the Mamba scan is log-depth ``associative_scan`` / a Pallas kernel rather
    than a per-timestep Python loop (models.py:58-66).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vct.core.config import ModelConfig
from vct.models.backbones import build_backbone
from vct.models.layers import (
    AdaptDSL,
    CanonicalAdapter,
    MultiBinaryHead,
    MulticlassHead,
)
from vct.models.recurrent import RNNStack
from vct.models.ssm import MambaResidualBlock

__all__ = ["LRCN", "build_lrcn"]


class LRCN(nn.Module):
    num_classes: int
    sequence_length: int
    hidden_size: int
    rnn_input_size: int
    cnn_backbone: str = "resnet50"
    rnn_type: str = "mamba"  # lstm | gru | mamba
    rnn_layer: int = 3
    rnn_out: str = "all"  # all | last
    bidirectional: bool = False
    classif_mode: str = "multiclass"  # multiclass | multiple_binary
    dropout: float = 0.25
    adapt_mode: str = ""  # "" -> canonical hardcoded adapter (models.py:147-153)
    finetune: bool = False  # reference always freezes the backbone
    remat_backbone: bool = False  # jax.checkpoint the conv stack (finetune)
    # Sequence parallelism: frames are independent through the conv stack, so
    # the B*T frame batch shards over BOTH mesh axes (data AND model) for the
    # backbone, then reshards to data-only for the temporal scan (XLA inserts
    # the all-to-alls). Requires calls to run inside a `with mesh:` context —
    # the Trainer does this.
    seq_shard: bool = False
    scan_impl: str = "associative"
    dtype: Any = jnp.float32

    # Frozen-backbone feature caching (train.feature_cache): the backbone
    # output is stop_gradient-wrapped and its params frozen, so per-clip
    # features are bit-constant across epochs — the engine can extract them
    # once (features_only=True) and train the adapter/RNN/head from the
    # cached (B, T, F) block (from_features=True) with identical semantics.
    supports_feature_cache = True

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        *,
        from_features: bool = False,
        features_only: bool = False,
    ):
        if from_features:
            return self._head(x, deterministic)
        feats = self._backbone_features(x)
        if features_only:
            return feats
        return self._head(feats, deterministic)

    def _backbone_features(self, x):
        b, t = x.shape[0], x.shape[1]
        frames = x.reshape((b * t,) + x.shape[2:])
        seq_shard_on = False
        if self.seq_shard:
            from vct.parallel.mesh import ambient_mesh

            mesh = ambient_mesh()
            seq_shard_on = (
                mesh is not None
                and {"data", "model"} <= set(mesh.axis_names)
                and (b * t) % (mesh.shape["data"] * mesh.shape["model"]) == 0
                and b % mesh.shape["data"] == 0
            )
        if seq_shard_on:
            from jax.sharding import PartitionSpec as P

            frames = jax.lax.with_sharding_constraint(
                frames, P(("data", "model"), None, None, None)
            )

        if self.remat_backbone and self.finetune:
            from vct.models.backbones import BACKBONES

            proto = BACKBONES.get(self.cnn_backbone)(dtype=self.dtype)
            fields = {
                f: getattr(proto, f)
                for f in proto.__dataclass_fields__
                if f not in ("parent", "name")
            }
            backbone = nn.remat(type(proto))(**fields, name="cnn_backbone")
        else:
            backbone, _ = build_backbone(
                self.cnn_backbone, dtype=self.dtype, module_name="cnn_backbone"
            )
        feats = backbone(frames)
        if not self.finetune:
            feats = jax.lax.stop_gradient(feats)
        feats = feats.reshape(b, t, -1)
        if seq_shard_on:
            from jax.sharding import PartitionSpec as P

            feats = jax.lax.with_sharding_constraint(feats, P("data", None, None))
        return feats

    def _head(self, feats, deterministic):
        """Adapter -> temporal stack -> pool -> classifier over (B, T, F)."""
        b = feats.shape[0]
        if self.adapt_mode:
            feats = AdaptDSL(
                out_size=self.rnn_input_size,
                mode=self.adapt_mode,
                dropout=self.dropout,
                name="adapt",
            )(feats, deterministic=deterministic)
        else:
            feats = CanonicalAdapter(
                out_size=self.rnn_input_size, dropout=self.dropout, name="adapt"
            )(feats, deterministic=deterministic)

        if self.rnn_type == "mamba":
            h = feats
            for i in range(self.rnn_layer):
                # models.py:160-165: ResidualBlock(rnn_input, 2*rnn_input,
                # n_state=hidden, dt_rank=hidden)
                h = MambaResidualBlock(
                    d_model=self.rnn_input_size,
                    d_inner=self.rnn_input_size * 2,
                    n_state=self.hidden_size,
                    dt_rank=self.hidden_size,
                    bidirectional=self.bidirectional,
                    scan_impl=self.scan_impl,
                    name=f"mamba_{i}",
                )(h)
            rnn_out = h
        else:
            rnn_out = RNNStack(
                rnn_type=self.rnn_type,
                hidden_size=self.hidden_size,
                num_layers=self.rnn_layer,
                bidirectional=self.bidirectional,
                scan_impl="pallas" if self.scan_impl == "pallas" else "scan",
                name="rnn",
            )(feats)

        if self.rnn_out == "all":
            pooled = rnn_out.reshape(b, -1)
        else:
            pooled = rnn_out[:, -1, :]

        if self.classif_mode == "multiclass":
            return MulticlassHead(
                num_classes=self.num_classes, dropout=self.dropout, name="head"
            )(pooled, deterministic=deterministic)
        return MultiBinaryHead(num_classes=self.num_classes, name="head")(pooled)


def build_lrcn(cfg: ModelConfig, sequence_length: int) -> LRCN:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return LRCN(
        num_classes=cfg.num_classes,
        sequence_length=sequence_length,
        hidden_size=cfg.resolved_hidden_size,
        rnn_input_size=cfg.rnn_input_size,
        cnn_backbone=cfg.cnn_backbone,
        rnn_type=cfg.rnn_type,
        rnn_layer=cfg.rnn_layer,
        rnn_out=cfg.rnn_out,
        bidirectional=cfg.bidirectional,
        classif_mode=cfg.classif_mode,
        dropout=cfg.dropout,
        adapt_mode=cfg.adapt if cfg.use_adapt_dsl else "",
        finetune=cfg.finetune,
        remat_backbone=cfg.remat_backbone,
        seq_shard=cfg.seq_shard,
        scan_impl=cfg.scan_impl,
        dtype=dtype,
    )
