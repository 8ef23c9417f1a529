"""Torch state_dict -> Flax variables porting.

The reference downloads torchvision pretrained weights at model build time
(``models.py:133`` ``pretrained=True``). This machine has no torchvision and
no network egress, so backbones initialize randomly by default; when a user
supplies a torchvision ``state_dict`` (``.pth`` of tensors), these routines
map it onto our parameter trees:

  * conv weights  (O, I, kH, kW)  ->  (kH, kW, I, O)
  * linear weights (O, I)         ->  (I, O)
  * BatchNorm weight/bias -> params.scale/bias; running_mean/var ->
    batch_stats.mean/var (our backbones always run BN in inference mode)
  * torchvision module paths -> our flax module names
    (``layer1.0.conv1`` ⇔ ``layer1_0/conv1`` for ResNet, etc.)

Supported: the ResNet family (18/34/50/101/152). The checks are strict —
any unconsumed or missing tensor raises, so silent partial ports can't
produce mystery logits.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["load_torch_resnet", "torch_tensor_dict"]


def torch_tensor_dict(state_dict) -> Dict[str, np.ndarray]:
    """Accept a torch state_dict (tensors) or a dict of arrays."""
    out = {}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        out[key] = np.asarray(value)
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def load_torch_resnet(variables: dict, state_dict) -> dict:
    """Port a torchvision ResNet state_dict into our ResNet variables.

    ``variables``: the tree from ``module.init`` ({'params', 'batch_stats'}).
    Returns a new tree of the same structure. fc.* entries in the state_dict
    are ignored (the reference discards the classifier, models.py:134-136).
    """
    sd = torch_tensor_dict(state_dict)
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
    consumed = set()

    params = _tree_copy(variables["params"])
    stats = _tree_copy(variables.get("batch_stats", {}))

    def take(key):
        if key not in sd:
            raise KeyError(f"Missing tensor in state_dict: {key}")
        consumed.add(key)
        return sd[key]

    def put_conv(flax_path, torch_name):
        node = _descend(params, flax_path)
        want = node["kernel"].shape
        kernel = _conv(take(f"{torch_name}.weight"))
        if kernel.shape != want:
            raise ValueError(
                f"{torch_name}: shape {kernel.shape} != expected {want}"
            )
        node["kernel"] = kernel

    def put_bn(flax_path, torch_name):
        pnode = _descend(params, flax_path)["BatchNorm_0"]
        snode = _descend(stats, flax_path)["BatchNorm_0"]
        pnode["scale"] = take(f"{torch_name}.weight")
        pnode["bias"] = take(f"{torch_name}.bias")
        snode["mean"] = take(f"{torch_name}.running_mean")
        snode["var"] = take(f"{torch_name}.running_var")
        consumed.add(f"{torch_name}.num_batches_tracked")

    put_conv(["conv1"], "conv1")
    put_bn(["bn1"], "bn1")

    for stage in range(1, 5):
        block = 0
        while f"layer{stage}_{block}" in params:
            ours = f"layer{stage}_{block}"
            theirs = f"layer{stage}.{block}"
            node = params[ours]
            n_convs = len([k for k in node if k.startswith("conv")])
            for ci in range(1, n_convs + 1):
                put_conv([ours, f"conv{ci}"], f"{theirs}.conv{ci}")
                put_bn([ours, f"bn{ci}"], f"{theirs}.bn{ci}")
            if "downsample_conv" in node:
                put_conv([ours, "downsample_conv"], f"{theirs}.downsample.0")
                put_bn([ours, "downsample_bn"], f"{theirs}.downsample.1")
            block += 1

    leftovers = {
        k for k in sd
        if k not in consumed and not k.endswith("num_batches_tracked")
    }
    if leftovers:
        raise ValueError(f"Unconsumed state_dict tensors: {sorted(leftovers)[:8]}...")

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out


def _tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return tree


def _descend(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node
