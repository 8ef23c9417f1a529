"""MobileNetV2 backbone in Flax (feature extractor, 1280-d output).

Structural equivalent of ``torchvision.models.mobilenet_v2`` as used by the
reference's backbone adapter (``medsos_lrcn/src/models.py:133-145``; the best
Bayesian-sweep config uses mamba + mobilenet_v2, ``BASELINE.md``). Inverted
residual blocks with ReLU6, eval-mode BatchNorm (backbone frozen), global
average pool tail.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["MobileNetV2", "mobilenet_v2"]


def _round8(v: float) -> int:
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
            name="bn",
        )(x)
        if self.act:
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class _InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.features

        out = x
        idx = 0
        if self.expand_ratio != 1:
            out = _ConvBNReLU(hidden, 1, 1, dtype=self.dtype, name=f"conv{idx}")(out)
            idx += 1
        out = _ConvBNReLU(
            hidden, 3, self.stride, groups=hidden, dtype=self.dtype, name=f"conv{idx}"
        )(out)
        idx += 1
        out = _ConvBNReLU(
            self.features, 1, 1, act=False, dtype=self.dtype, name=f"conv{idx}"
        )(out)
        return x + out if use_res else out


# (expand_ratio, channels, num_blocks, first_stride) — torchvision defaults.
_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    dtype: Any = jnp.float32

    feature_dim = 1280

    @nn.compact
    def __call__(self, x):
        x = _ConvBNReLU(_round8(32), 3, 2, dtype=self.dtype, name="stem")(x)
        block = 0
        for t, c, n, s in _CFG:
            for i in range(n):
                x = _InvertedResidual(
                    features=_round8(c),
                    stride=s if i == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    name=f"block{block}",
                )(x)
                block += 1
        x = _ConvBNReLU(1280, 1, 1, dtype=self.dtype, name="head")(x)
        return jnp.mean(x, axis=(1, 2))


def mobilenet_v2(dtype=jnp.float32, name=None):
    return MobileNetV2(dtype=dtype, name=name)
