"""ResNet backbone family (18/34/50/101/152) in Flax.

Structurally equivalent to the torchvision models the reference resolves via
``getattr(models, cnn_backbone)`` and truncates at the classifier
(``medsos_lrcn/src/models.py:133-145``): 7x7 stem, BasicBlock/Bottleneck
stages, global average pool, feature output (the fc head is never created —
the reference replaces it with ``nn.Identity``).

TPU notes: convs lower straight onto the MXU; BatchNorm always runs in
inference mode with stored running statistics (the backbone is frozen in every
reference configuration — ``models.py:144-145``), which also lets XLA fold
BN into the preceding conv. Parameter names mirror the torchvision layout
(``layer1_0.conv1`` ⇔ ``layer1.0.conv1``) so torch state_dicts port 1:1 via
``vct.models.backbones.port.load_torch_resnet``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
]

Dtype = Any

_Conv = partial(nn.Conv, use_bias=False)


def conv_pad(x, features, kernel, stride, pad, dtype, name):
    """torch-style explicit symmetric zero-padding conv.

    The padding rides inside the convolution op (XLA pads in the conv's
    input window walk) rather than a separate ``jnp.pad``, which
    materializes the padded activation through HBM — measured 7% slower
    over the whole resnet50 forward at 224², bit-identical output.
    """
    return _Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dtype=dtype,
        name=name,
    )(x)


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv_pad(x, self.features, 3, self.stride, 1, self.dtype, "conv1")
        out = _BN(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv_pad(out, self.features, 3, 1, 1, self.dtype, "conv2")
        out = _BN(self.dtype, name="bn2")(out)
        if self.downsample:
            identity = conv_pad(
                x, self.features, 1, self.stride, 0, self.dtype, "downsample_conv"
            )
            identity = _BN(self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3 conv; output is features * 4
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv_pad(x, self.features, 1, 1, 0, self.dtype, "conv1")
        out = _BN(self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv_pad(out, self.features, 3, self.stride, 1, self.dtype, "conv2")
        out = _BN(self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv_pad(out, self.features * 4, 1, 1, 0, self.dtype, "conv3")
        out = _BN(self.dtype, name="bn3")(out)
        if self.downsample:
            identity = conv_pad(
                x, self.features * 4, 1, self.stride, 0, self.dtype, "downsample_conv"
            )
            identity = _BN(self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Feature-extractor ResNet: input (B, H, W, 3) -> features (B, C)."""

    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    dtype: Dtype = jnp.float32

    @property
    def feature_dim(self) -> int:
        return 512 * self.block.expansion

    @nn.compact
    def __call__(self, x):
        x = conv_pad(x, 64, 7, 2, 3, self.dtype, "conv1")
        x = _BN(self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # Explicit padding in reduce_window pads with the -inf init value —
        # identical to the torch maxpool's -inf pad, no materialized copy.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths = (64, 128, 256, 512)
        in_features = 64
        for stage, (width, n_blocks) in enumerate(zip(widths, self.stage_sizes)):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                needs_ds = stride != 1 or in_features != width * self.block.expansion
                x = self.block(
                    features=width,
                    stride=stride,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
                in_features = width * self.block.expansion

        # Adaptive average pool to (1, 1) then flatten — the torchvision tail
        # before the (removed) fc.
        x = jnp.mean(x, axis=(1, 2))
        return x


def resnet18(dtype=jnp.float32, name=None):
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), dtype=dtype, name=name)


def resnet34(dtype=jnp.float32, name=None):
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3), dtype=dtype, name=name)


def resnet50(dtype=jnp.float32, name=None):
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), dtype=dtype, name=name)


def resnet101(dtype=jnp.float32, name=None):
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 23, 3), dtype=dtype, name=name)


def resnet152(dtype=jnp.float32, name=None):
    return ResNet(block=Bottleneck, stage_sizes=(3, 8, 36, 3), dtype=dtype, name=name)
