"""VideoMamba — frozen CNN + linear adapt + Mamba residual stack + pooling.

Matches ``lrcn/videomamba.py:332-434`` / ``lrcn/mamba.py:147-249``: a single
Linear projection to d_model, ``n_layer`` selective-scan residual blocks,
final RMSNorm, temporal pooling (mean | max | last | all), then a multiclass
Linear head or per-class binary heads (the reference returns a *list* of
(B, 1) tensors in multiple_binary mode; we return the equivalent stacked
(B, num_classes) logits).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vct.core.config import ModelConfig
from vct.models.backbones import build_backbone
from vct.models.layers import RMSNorm
from vct.models.ssm import MambaResidualBlock

__all__ = ["VideoMamba", "build_videomamba"]


class VideoMamba(nn.Module):
    num_classes: int
    cnn_backbone: str = "resnet50"
    n_layer: int = 4
    d_model: int = 512
    d_inner: int = 2048
    n_state: int = 16
    dt_rank: int = 16
    num_frames: int = 16
    temporal_mode: str = "mean"  # mean | max | last | all
    classification_mode: str = "multiclass"
    finetune: bool = False
    scan_impl: str = "associative"
    dtype: Any = jnp.float32

    def temporal_pool(self, x):
        # lrcn/videomamba.py:388-401
        if self.temporal_mode == "mean":
            return jnp.mean(x, axis=1)
        if self.temporal_mode == "max":
            return jnp.max(x, axis=1)
        if self.temporal_mode == "last":
            return x[:, -1]
        if self.temporal_mode == "all":
            return x.reshape(x.shape[0], -1)
        raise ValueError(f"Unknown temporal mode: {self.temporal_mode}")

    # Frozen-backbone feature caching (train.feature_cache): backbone
    # features are bit-constant across epochs; the engine extracts them once
    # and trains adapt/mamba/head from the cached (B, T, F) block.
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
        del deterministic
        b, t = x.shape[0], x.shape[1]
        if from_features:
            feats = x.reshape(b * t, x.shape[-1])
        else:
            frames = x.reshape((b * t,) + x.shape[2:])

            backbone, _ = build_backbone(
                self.cnn_backbone, dtype=self.dtype, module_name="cnn_backbone"
            )
            feats = backbone(frames)
            if not self.finetune:
                feats = jax.lax.stop_gradient(feats)
            if features_only:
                return feats.reshape(b, t, -1)

        feats = nn.Dense(self.d_model, name="adapt")(feats)
        feats = feats.reshape(b, t, self.d_model)

        for i in range(self.n_layer):
            feats = MambaResidualBlock(
                d_model=self.d_model,
                d_inner=self.d_inner,
                n_state=self.n_state,
                dt_rank=self.dt_rank,
                scan_impl=self.scan_impl,
                name=f"layer_{i}",
            )(feats)

        feats = RMSNorm(self.d_model, name="norm_f")(feats)
        pooled = self.temporal_pool(feats)

        # Per-class binary heads fuse into one Dense — identical logits.
        return nn.Dense(self.num_classes, name="classifier")(pooled)


def build_videomamba(cfg: ModelConfig, sequence_length: int) -> VideoMamba:
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return VideoMamba(
        num_classes=cfg.num_classes,
        cnn_backbone=cfg.cnn_backbone,
        n_layer=cfg.vm_n_layer,
        d_model=cfg.vm_d_model,
        d_inner=cfg.vm_d_inner,
        n_state=cfg.vm_n_state,
        dt_rank=cfg.vm_dt_rank,
        num_frames=sequence_length,
        temporal_mode=cfg.vm_temporal_mode,
        classification_mode=cfg.classif_mode,
        finetune=cfg.finetune,
        scan_impl=cfg.scan_impl,
        dtype=dtype,
    )
