"""EfficientNet-B0 backbone in Flax (feature extractor, 1280-d output).

Structural equivalent of ``torchvision.models.efficientnet_b0`` — reachable
through the reference's backbone dispatch (``models.py:133-145`` handles any
torchvision model with a ``classifier`` tail; the efficientnet family is in
its supported set per SURVEY.md C6). MBConv blocks with squeeze-excitation,
SiLU activations, eval-mode BatchNorm (eps 1e-3 like torchvision), global
average pool tail.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["EfficientNetB0", "efficientnet_b0"]


def _round8(v: float) -> int:
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


class _ConvBNAct(nn.Module):
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
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x


class _SqueezeExcite(nn.Module):
    squeeze_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.silu(nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(s))
        return x * s


class _MBConv(nn.Module):
    features: int
    kernel: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.features
        out = x
        idx = 0
        if self.expand_ratio != 1:
            out = _ConvBNAct(hidden, 1, 1, dtype=self.dtype, name=f"conv{idx}")(out)
            idx += 1
        out = _ConvBNAct(
            hidden, self.kernel, self.stride, groups=hidden,
            dtype=self.dtype, name=f"conv{idx}",
        )(out)
        idx += 1
        # SE squeeze is computed from the block's input channels / 4.
        out = _SqueezeExcite(max(1, in_ch // 4), dtype=self.dtype, name="se")(out)
        out = _ConvBNAct(
            self.features, 1, 1, act=False, dtype=self.dtype, name=f"conv{idx}"
        )(out)
        return x + out if use_res else out


# (expand, kernel, stride, channels, repeats) — torchvision B0.
_CFG = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]


class EfficientNetB0(nn.Module):
    dtype: Any = jnp.float32

    feature_dim = 1280

    @nn.compact
    def __call__(self, x):
        x = _ConvBNAct(_round8(32), 3, 2, dtype=self.dtype, name="stem")(x)
        block = 0
        for t, k, s, c, n in _CFG:
            for i in range(n):
                x = _MBConv(
                    features=_round8(c), kernel=k,
                    stride=s if i == 0 else 1, expand_ratio=t,
                    dtype=self.dtype, name=f"block{block}",
                )(x)
                block += 1
        x = _ConvBNAct(1280, 1, 1, dtype=self.dtype, name="head")(x)
        return jnp.mean(x, axis=(1, 2))


def efficientnet_b0(dtype=jnp.float32, name=None):
    return EfficientNetB0(dtype=dtype, name=name)
