"""Model checkpointing — Orbax + a JSON manifest.

Replaces the reference's whole-module pickle (``train_eval.py:53``
``torch.save(model)``, loaded blindly at ``worker.py:114`` /
``deployment.py:165``) with a clean layout:

    <dir>/params/...      Orbax pytree (params + extra collections)
    <dir>/manifest.json   config dict, class names, metrics, framework version

so serving can rebuild the exact model from its manifest instead of
unpickling arbitrary code. The config-encoded directory naming convention of
the sweep runner (``runner.py:69-75``) is preserved via
``Config.artifact_name``.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from vct.core.config import Config

__all__ = ["save_checkpoint", "load_checkpoint"]

_MANIFEST = "manifest.json"
_PARAMS = "params"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(
    path: str,
    variables: Dict[str, Any],
    cfg: Config,
    class_names: List[str],
    metrics: Optional[dict] = None,
) -> str:
    """Save model variables ({'params': ..., 'batch_stats': ...}) + manifest."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckpt = _checkpointer()
    params_path = os.path.join(path, _PARAMS)
    # Orbax refuses to overwrite; remove stale checkpoint dirs.
    if os.path.exists(params_path):
        import shutil

        shutil.rmtree(params_path)
    ckpt.save(params_path, jax.device_get(variables))
    ckpt.wait_until_finished()
    manifest = {
        "framework": "vct",
        "config": cfg.to_dict(),
        "class_names": list(class_names),
        "metrics": metrics or {},
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return path


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Config, List[str], dict]:
    """Returns (variables, config, class_names, manifest)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    cfg = Config.from_dict(manifest["config"])
    # Rebuild the abstract tree from a fresh init so orbax can restore
    # without a stored target: restore raw then cast leaves to jnp.
    ckpt = _checkpointer()
    variables = ckpt.restore(os.path.join(path, _PARAMS))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return variables, cfg, manifest["class_names"], manifest
