"""VGG-16 and AlexNet backbones in Flax (feature extractors).

Structural equivalents of ``torchvision.models.vgg16`` / ``alexnet`` as
reachable through the reference's backbone adapter (``models.py:133-145``,
``lrcn/rgb_lrcn.py:177-245`` handles VGG's 25088-d flattened output with an
adaptive pool). Note the reference's generic size probe reports
``classifier[-1].in_features`` (4096) while actually emitting the flattened
feature map after replacing the whole classifier — a latent shape bug we do
not replicate: ``feature_dim`` here is the true output width.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VGG16", "vgg16", "AlexNet", "alexnet"]


def _conv(x, features, dtype, name, kernel=3, stride=1, pad=1):
    # Padding rides inside the conv op (no materialized jnp.pad copy).
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], dtype=dtype, name=name,
    )(x)


_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]


class VGG16(nn.Module):
    """VGG-16 features + 7x7 adaptive pool, flattened: output 25088."""

    dtype: Any = jnp.float32

    feature_dim = 512 * 7 * 7

    @nn.compact
    def __call__(self, x):
        i = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.relu(_conv(x, v, self.dtype, f"conv{i}"))
                i += 1
        # torchvision applies AdaptiveAvgPool2d((7,7)) before flatten.
        h, w = x.shape[1:3]
        if (h, w) != (7, 7):
            x = _adaptive_avg_pool(x, 7, 7)
        return x.reshape(x.shape[0], -1)


class AlexNet(nn.Module):
    """AlexNet features + 6x6 adaptive pool, flattened: output 9216."""

    dtype: Any = jnp.float32

    feature_dim = 256 * 6 * 6

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(x, 64, self.dtype, "conv0", kernel=11, stride=4, pad=2))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(_conv(x, 192, self.dtype, "conv1", kernel=5, pad=2))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(_conv(x, 384, self.dtype, "conv2"))
        x = nn.relu(_conv(x, 256, self.dtype, "conv3"))
        x = nn.relu(_conv(x, 256, self.dtype, "conv4"))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        h, w = x.shape[1:3]
        if (h, w) != (6, 6):
            x = _adaptive_avg_pool(x, 6, 6)
        return x.reshape(x.shape[0], -1)


def _adaptive_avg_pool(x, out_h, out_w):
    """torch AdaptiveAvgPool2d semantics for static shapes."""
    b, h, w, c = x.shape
    if h % out_h == 0 and w % out_w == 0:
        x = x.reshape(b, out_h, h // out_h, out_w, w // out_w, c)
        return x.mean(axis=(2, 4))
    # General case: per-output-cell mean over torch's index windows.
    import numpy as np

    rows = [
        x[:, int(np.floor(i * h / out_h)) : int(np.ceil((i + 1) * h / out_h)), :, :].mean(
            axis=1, keepdims=True
        )
        for i in range(out_h)
    ]
    x = jnp.concatenate(rows, axis=1)
    cols = [
        x[:, :, int(np.floor(j * w / out_w)) : int(np.ceil((j + 1) * w / out_w)), :].mean(
            axis=2, keepdims=True
        )
        for j in range(out_w)
    ]
    return jnp.concatenate(cols, axis=2)


def vgg16(dtype=jnp.float32, name=None):
    return VGG16(dtype=dtype, name=name)


def alexnet(dtype=jnp.float32, name=None):
    return AlexNet(dtype=dtype, name=name)
