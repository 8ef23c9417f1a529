"""Parameter sharding rules (tensor parallelism over the ``model`` axis).

The adapter / head Dense kernels are the trainable FLOPs of the LRCN family;
their output dimension shards over ``model`` so each device holds a column
slice and XLA inserts the reducing collectives. Anything that does not match
a rule (or does not divide) stays replicated. The reference has no multi-device
story at all (SURVEY.md §2: no torch.distributed anywhere) — this module is
the TPU-native replacement.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vct.parallel.mesh import MODEL_AXIS

__all__ = ["param_pspec", "shard_params", "shard_state_like_params"]

# Param subtrees whose 2D kernels are column-sharded over the model axis.
_TP_SUBTREES = ("adapt", "head", "rnn", "mamba_", "layer_", "classifier")


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def param_pspec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one parameter."""
    p = _path_str(path)
    if leaf.ndim >= 2 and any(t in p for t in _TP_SUBTREES):
        if leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= model_size:
            return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put params with TP column sharding where the rules apply."""
    model_size = mesh.shape[MODEL_AXIS]

    def put(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_pspec(path, leaf, model_size))
        )

    return jax.tree_util.tree_map_with_path(put, params)


def shard_state_like_params(state, mesh: Mesh):
    """Shard a TrainState: params (and mirrored optimizer moments) via the TP
    rules, everything else replicated."""
    model_size = mesh.shape[MODEL_AXIS]

    def put(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            spec = param_pspec(path, leaf, model_size)
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)
