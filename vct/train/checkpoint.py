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

__all__ = ["save_checkpoint", "load_checkpoint", "save_train_state", "load_train_state"]

_MANIFEST = "manifest.json"
_PARAMS = "params"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _is_primary() -> bool:
    """The one process that mutates the checkpoint filesystem."""
    return jax.process_count() == 1 or jax.process_index() == 0


def _atomic_tree_save(final_path: str, tree) -> None:
    """Save an Orbax tree next to ``final_path`` then swap it in, so a crash
    mid-save (the exact scenario crash-tolerant training exists for) leaves
    the previous complete checkpoint in place, never a partial one.

    Multi-process: Orbax ``save`` is a COLLECTIVE (it runs its own
    ``sync_global_processes`` barriers), so EVERY rank must call this with
    the same path; only the primary performs the host-fs cleanup/renames,
    and explicit barriers separate those mutations from the other ranks'
    collective save calls — relying on Orbax to barrier before its first
    path access would be an undocumented-ordering assumption.
    """
    import shutil

    def _barrier(tag: str) -> None:
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)

    tmp_path = final_path + ".tmp"
    old_path = final_path + ".old"
    primary = _is_primary()
    if primary:
        for stale in (tmp_path, old_path):
            if os.path.exists(stale):
                shutil.rmtree(stale)
    # No rank may enter the collective save while the primary can still be
    # deleting a stale tmp dir out from under it.
    _barrier("vct_ckpt_pre_save")
    ckpt = _checkpointer()
    ckpt.save(tmp_path, tree)
    ckpt.wait_until_finished()
    if primary:
        if os.path.exists(final_path):
            os.rename(final_path, old_path)
        os.rename(tmp_path, final_path)
        if os.path.exists(old_path):
            shutil.rmtree(old_path)
    # ... and no rank may race ahead (into the NEXT epoch's save of the
    # same tmp path) while the primary is mid-rename.
    _barrier("vct_ckpt_post_swap")


def _atomic_json_write(path: str, obj) -> None:
    if not _is_primary():
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2)
    os.replace(tmp, path)


def _recover_checkpoint_dir(final_path: str) -> None:
    """Promote a survivor if a crash landed between _atomic_tree_save's two
    renames (final missing, while .old — and possibly the complete .tmp —
    exist). Prefers .tmp: it is only ever renamed away AFTER being fully
    written, and the .old+.tmp combination can only arise post-save."""
    if os.path.exists(final_path):
        return
    tmp_path, old_path = final_path + ".tmp", final_path + ".old"
    if os.path.exists(old_path):
        os.rename(tmp_path if os.path.exists(tmp_path) else old_path, final_path)


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
    _atomic_tree_save(os.path.join(path, _PARAMS), jax.device_get(variables))
    manifest = {
        "framework": "vct",
        "config": cfg.to_dict(),
        "class_names": list(class_names),
        "metrics": metrics or {},
    }
    _atomic_json_write(os.path.join(path, _MANIFEST), manifest)
    return path


def save_train_state(path: str, state, cfg: Config, class_names: List[str],
                     epoch: int, extra: Optional[dict] = None) -> str:
    """Save the FULL train state (params + extra collections + optimizer
    moments + rng + step) for crash-tolerant epoch resume. ``extra`` is a
    small JSON-safe dict carried in the manifest (early-stop / LR-plateau
    counters, so a resumed run replays them exactly)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    tree = {
        "params": jax.device_get(state.params),
        "extra_vars": jax.device_get(state.extra_vars),
        "opt_state": jax.device_get(state.opt_state),
        "rng": jax.device_get(state.rng),
        "step": jax.device_get(state.step),
    }
    _atomic_tree_save(os.path.join(path, "train_state"), tree)
    # Manifest last: a crash between the state swap and this write resumes
    # one epoch early (re-trains it from the newer state) rather than
    # pointing a newer manifest at a missing checkpoint.
    _atomic_json_write(
        os.path.join(path, "train_manifest.json"),
        {"epoch": epoch, "config": cfg.to_dict(),
         "class_names": class_names, "extra": extra or {}},
    )
    return path


def load_train_state(path: str, state) -> Tuple[Any, int, dict]:
    """Restore a full train state into the (freshly initialized) ``state``
    template; returns (state, completed_epochs, extra). ((state, 0, {}) if
    no checkpoint.)"""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    # Orbax requires absolute paths; without this a relative-path resume
    # would raise inside restore and be swallowed into "starting from
    # epoch 0" below — silently retraining instead of resuming.
    path = os.path.abspath(path)
    manifest_path = os.path.join(path, "train_manifest.json")
    if not os.path.exists(manifest_path):
        return state, 0, {}
    _recover_checkpoint_dir(os.path.join(path, "train_state"))
    if not os.path.exists(os.path.join(path, "train_state")):
        # Stale manifest without a state (interrupted save): start fresh
        # instead of crashing the resume.
        print(f"warning: {path} has a manifest but no train_state; "
              "starting from epoch 0")
        return state, 0, {}
    with open(manifest_path) as f:
        manifest = json.load(f)
    target = {
        "params": jax.device_get(state.params),
        "extra_vars": jax.device_get(state.extra_vars),
        "opt_state": jax.device_get(state.opt_state),
        "rng": jax.device_get(state.rng),
        "step": jax.device_get(state.step),
    }
    ckpt = _checkpointer()
    try:
        tree = ckpt.restore(os.path.join(path, "train_state"), target)
    except Exception as e:
        print(f"warning: could not restore train_state from {path} ({e}); "
              "starting from epoch 0")
        return state, 0, {}
    as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = state.replace(
        params=as_jnp(tree["params"]),
        extra_vars=as_jnp(tree["extra_vars"]),
        opt_state=as_jnp(tree["opt_state"]),
        rng=jnp.asarray(tree["rng"]),
        step=jnp.asarray(tree["step"]),
    )
    return state, int(manifest["epoch"]), manifest.get("extra", {})


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Config, List[str], dict]:
    """Returns (variables, config, class_names, manifest)."""
    path = os.path.abspath(path)
    _recover_checkpoint_dir(os.path.join(path, _PARAMS))
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    cfg = Config.from_dict(manifest["config"])
    # Rebuild the abstract tree from a fresh init so orbax can restore
    # without a stored target: restore raw then cast leaves to jnp.
    ckpt = _checkpointer()
    variables = ckpt.restore(os.path.join(path, _PARAMS))
    variables = jax.tree_util.tree_map(np.asarray, variables)
    return variables, cfg, manifest["class_names"], manifest
