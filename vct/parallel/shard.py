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

# Module names (exact flax path segments) whose 2D kernels column-shard over
# the model axis: the LRCN adapter/head/temporal stacks ("adapt", "head",
# "rnn", "mamba_<i>") and VideoMamba's blocks ("layer_<i>", "classifier").
# Matching is anchored per segment — a param is TP only if one of its path
# segments IS one of these names — so no future param whose name merely
# *contains* a rule string (and in particular nothing under "cnn_backbone",
# e.g. "layer1_0") can ever pick up a model-axis spec by accident.
_TP_SEGMENTS = frozenset({"adapt", "head", "rnn", "classifier"})
_TP_SEGMENT_PREFIXES = ("mamba_", "layer_")
_EXCLUDED_SEGMENTS = frozenset({"cnn_backbone", "cnn"})


def _segments(path):
    return [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]


def _is_tp_path(segments) -> bool:
    if any(s in _EXCLUDED_SEGMENTS for s in segments):
        return False
    for s in segments:
        if s in _TP_SEGMENTS:
            return True
        for prefix in _TP_SEGMENT_PREFIXES:
            # anchored: "mamba_0" / "layer_3" match, "layer1_0" does not
            if s.startswith(prefix) and s[len(prefix):].isdigit():
                return True
    return False


def param_pspec(path, leaf, model_size: int) -> P:
    """PartitionSpec for one parameter."""
    if leaf.ndim >= 2 and _is_tp_path(_segments(path)):
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
