"""Inception-V3 backbone in Flax (feature extractor, 2048-d output).

Structural equivalent of ``torchvision.models.inception_v3`` (minus the aux
classifier — the reference never trains it; S2VT's PretrainedCNN routes
through the feature stack, ``s2vt/beam_search.py:279-282``). BasicConv2d =
Conv + BN(eps 1e-3, eval mode) + ReLU; Mixed 5/6/7 blocks; global average
pool tail. Nominal input 299x299 but any size >= 75 works (adaptive pool)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["InceptionV3", "inception_v3"]


class _BasicConv(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=[(ph, ph), (pw, pw)], use_bias=False, dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


def _avg3(x):
    # count_include_pad=True (flax default) divides by the full 3x3 window
    # like torch's AvgPool2d(count_include_pad=True) — same as zero-pad+VALID.
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class _InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _BasicConv(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = _BasicConv(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = _BasicConv(64, (5, 5), padding=(2, 2), dtype=d, name="branch5x5_2")(b5)
        b3 = _BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = _BasicConv(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(b3)
        b3 = _BasicConv(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_3")(b3)
        bp = _BasicConv(self.pool_features, (1, 1), dtype=d, name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _BasicConv(384, (3, 3), stride=2, dtype=d, name="branch3x3")(x)
        bd = _BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = _BasicConv(96, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = _BasicConv(96, (3, 3), stride=2, dtype=d, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class _InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.c7
        b1 = _BasicConv(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = _BasicConv(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = _BasicConv(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7)
        bd = _BasicConv(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd)
        bd = _BasicConv(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd)
        bd = _BasicConv(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd)
        bd = _BasicConv(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd)
        bp = _BasicConv(192, (1, 1), dtype=d, name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _BasicConv(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = _BasicConv(320, (3, 3), stride=2, dtype=d, name="branch3x3_2")(b3)
        b7 = _BasicConv(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = _BasicConv(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7)
        b7 = _BasicConv(192, (3, 3), stride=2, dtype=d, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class _InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _BasicConv(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = _BasicConv(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3),
            _BasicConv(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _BasicConv(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = _BasicConv(384, (3, 3), padding=(1, 1), dtype=d, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd),
            _BasicConv(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _BasicConv(192, (1, 1), dtype=d, name="branch_pool")(_avg3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    dtype: Any = jnp.float32

    feature_dim = 2048

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = _BasicConv(32, (3, 3), stride=2, dtype=d, name="Conv2d_1a_3x3")(x)
        x = _BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = _BasicConv(64, (3, 3), padding=(1, 1), dtype=d, name="Conv2d_2b_3x3")(x)
        x = _max3s2(x)
        x = _BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = _BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max3s2(x)
        x = _InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = _InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = _InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = _InceptionB(dtype=d, name="Mixed_6a")(x)
        x = _InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = _InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = _InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = _InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = _InceptionD(dtype=d, name="Mixed_7a")(x)
        x = _InceptionE(dtype=d, name="Mixed_7b")(x)
        x = _InceptionE(dtype=d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))


def inception_v3(dtype=jnp.float32, name=None):
    return InceptionV3(dtype=dtype, name=name)
