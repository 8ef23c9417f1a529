"""DenseNet-121 backbone in Flax (feature extractor, 1024-d output).

Structural equivalent of ``torchvision.models.densenet121`` (the reference's
early tikHarm sweeps used densenet121 + lstm — ``dumps/checkpoint.json``,
``all_config.py:95``): BN→ReLU→Conv dense layers with channel concatenation,
0.5-compression transitions, final BN→ReLU→global-avg-pool.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DenseNet", "densenet121"]


def _bn(dtype, name):
    return nn.BatchNorm(
        use_running_average=True, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
    )


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = _bn(self.dtype, "norm1")(x)
        out = nn.relu(out)
        out = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(out)
        out = _bn(self.dtype, "norm2")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        return jnp.concatenate([x, out], axis=-1)


class _Transition(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _bn(self.dtype, "norm")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    block_config: Sequence[int] = (6, 12, 24, 16)
    growth_rate: int = 32
    init_features: int = 64
    dtype: Any = jnp.float32

    @property
    def feature_dim(self) -> int:
        ch = self.init_features
        for i, n in enumerate(self.block_config):
            ch += n * self.growth_rate
            if i != len(self.block_config) - 1:
                ch = ch // 2
        return ch

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.init_features, (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
            name="conv0",
        )(x)
        x = _bn(self.dtype, "norm0")(x)
        x = nn.relu(x)
        # reduce_window pads with the -inf init value — same as torch's pad.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        ch = self.init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = _DenseLayer(
                    self.growth_rate, dtype=self.dtype, name=f"block{i}_layer{j}"
                )(x)
            ch += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                ch = ch // 2
                x = _Transition(ch, dtype=self.dtype, name=f"transition{i}")(x)

        x = _bn(self.dtype, "norm5")(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2))


def densenet121(dtype=jnp.float32, name=None):
    return DenseNet(block_config=(6, 12, 24, 16), dtype=dtype, name=name)
