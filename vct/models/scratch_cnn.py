"""Scratch (non-pretrained) CNN-RNN models.

* ``LRCN2`` — 3-conv BN/pool/dropout stack + bidirectional GRU over flattened
  conv maps + Linear head, matching ``lrcn/backup_ucf50.py:105-151``
  (UCF50 Test Acc 0.7230 per the comment at ``backup_ucf50.py:1``).
* ``TimeDistributedCNNLSTM`` — TimeDistributed 3-conv stack + LSTM taking the
  last step, matching ``lrcn/pretrain-lrcn.py:101-156``. The reference wires
  the LSTM for 64 input features while the conv stack emits 64·(H/8)·(W/8)
  (a latent shape bug that only works for 8×8 inputs); we insert the global
  average pool that makes the 64-feature contract hold for any input size.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vct.models.recurrent import GRU, LSTM

__all__ = ["LRCN2", "TimeDistributedCNNLSTM"]


def _conv3(x, features, dtype, name):
    return nn.Conv(
        features, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype, name=name
    )(x)


class LRCN2(nn.Module):
    num_classes: int
    sequence_length: int
    hidden_size: int
    dropout: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t = x.shape[0], x.shape[1]
        h = x.reshape((b * t,) + x.shape[2:])

        def bn(name):
            # From-scratch model: BN trains on batch statistics (the
            # reference runs nn.BatchNorm2d in train() mode,
            # backup_ucf50.py:118-141) — unlike the frozen pretrained
            # backbones, whose BN is eval-mode by design. The Trainer
            # threads the mutated batch_stats through the train step.
            return nn.BatchNorm(
                use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name,
            )

        h = nn.relu(bn("bn1")(_conv3(h, 16, self.dtype, "conv1")))
        h = nn.max_pool(
            nn.relu(bn("bn2")(_conv3(h, 32, self.dtype, "conv2"))), (2, 2), strides=(2, 2)
        )
        h = nn.max_pool(
            nn.relu(bn("bn3")(_conv3(h, 64, self.dtype, "conv3"))), (2, 2), strides=(2, 2)
        )
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        h = h.reshape(b, t, -1)
        h = GRU(hidden_size=self.hidden_size, num_layers=1, bidirectional=True, name="gru")(h)
        h = h.reshape(b, -1)
        return nn.Dense(self.num_classes, name="fc")(h)


class TimeDistributedCNNLSTM(nn.Module):
    num_classes: int = 5
    dropout: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, t = x.shape[0], x.shape[1]
        h = x.reshape((b * t,) + x.shape[2:])

        for i, feats in enumerate((16, 32, 64), start=1):
            h = _conv3(h, feats, self.dtype, f"conv{i}")
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)

        # Global average pool to the LSTM's 64-feature contract (see module doc).
        h = jnp.mean(h, axis=(1, 2))
        h = h.reshape(b, t, -1)
        h = LSTM(hidden_size=32, num_layers=1, name="lstm")(h)
        return nn.Dense(self.num_classes, name="fc1")(h[:, -1, :])
