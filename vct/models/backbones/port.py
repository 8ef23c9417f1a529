"""Torch state_dict -> Flax variables porting, for EVERY backbone family.

The reference downloads torchvision pretrained weights at model build time
(``medsos_lrcn/src/models.py:133`` ``pretrained=True``) for any backbone name
in its dispatch — and its best recorded results ride mobilenet_v2
(``dumps/bayesian_medsos_checkpoint.json``) and densenet121
(``dumps/checkpoint.json``). This machine has no torchvision and no network
egress, so backbones initialize randomly by default; when a user supplies a
torchvision ``state_dict`` (``.pth`` of tensors), these routines map it onto
our parameter trees:

  * conv weights  (O, I, kH, kW)  ->  (kH, kW, I, O)
    (depthwise convs transpose the same way: (C,1,k,k) -> (k,k,1,C))
  * linear weights (O, I)         ->  (I, O)
  * BatchNorm weight/bias -> params.scale/bias; running_mean/var ->
    batch_stats.mean/var (our backbones always run BN in inference mode)
  * torchvision module paths -> our flax module names
    (``layer1.0.conv1`` ⇔ ``layer1_0/conv1`` for ResNet,
     ``features.1.conv.0.0`` ⇔ ``block0/conv0/conv`` for MobileNetV2, ...)

Supported: resnet{18,34,50,101,152}, mobilenet_v2, densenet121, vgg16,
alexnet, efficientnet_b0, inception_v3 — the full registry. The checks are
strict — any missing tensor raises ``KeyError``, any unconsumed tensor or
shape mismatch raises ``ValueError`` — so silent partial ports can't produce
mystery logits.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "load_torch_resnet",
    "load_torch_mobilenet_v2",
    "load_torch_densenet121",
    "load_torch_vgg16",
    "load_torch_alexnet",
    "load_torch_efficientnet_b0",
    "load_torch_inception_v3",
    "load_torch_backbone",
    "fold_input_scale_into_stem",
    "torch_tensor_dict",
]


def torch_tensor_dict(state_dict) -> Dict[str, np.ndarray]:
    """Accept a torch state_dict (tensors) or a dict of arrays."""
    out = {}
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        out[key] = np.asarray(value)
    return out


def _conv_t(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _tree_copy(tree):
    if isinstance(tree, dict):
        return {k: _tree_copy(v) for k, v in tree.items()}
    return tree


def _descend(tree, path: str):
    node = tree
    for key in path.split("/"):
        if key not in node:
            raise ValueError(f"No flax module at path segment {key!r} of {path!r}")
        node = node[key]
    return node


class _Porter:
    """Strict consume-everything torch->flax mapper shared by all families.

    ``drop`` prefixes (classifier heads the reference discards with
    ``nn.Identity``, models.py:134-141) are ignored without being required.
    """

    def __init__(self, variables: dict, state_dict, drop=()):
        self.sd = torch_tensor_dict(state_dict)
        self.drop = tuple(drop)
        self.consumed = set()
        self.params = _tree_copy(variables["params"])
        self.stats = _tree_copy(variables.get("batch_stats", {}))
        self._variables = variables

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"Missing tensor in state_dict: {key}")
        self.consumed.add(key)
        return self.sd[key]

    def _check(self, torch_name: str, got, want) -> None:
        if tuple(got) != tuple(want):
            raise ValueError(
                f"{torch_name}: shape {tuple(got)} != expected {tuple(want)}"
            )

    def conv(self, flax_path: str, torch_prefix: str, bias: bool = False):
        node = _descend(self.params, flax_path)
        kernel = _conv_t(self.take(f"{torch_prefix}.weight"))
        self._check(torch_prefix, kernel.shape, node["kernel"].shape)
        node["kernel"] = kernel
        if bias:
            b = self.take(f"{torch_prefix}.bias")
            self._check(f"{torch_prefix}.bias", b.shape, node["bias"].shape)
            node["bias"] = b

    def _put(self, node, key, torch_name):
        value = self.take(torch_name)
        self._check(torch_name, value.shape, node[key].shape)
        node[key] = value

    def linear(self, flax_path: str, torch_prefix: str, bias: bool = True):
        node = _descend(self.params, flax_path)
        kernel = np.transpose(self.take(f"{torch_prefix}.weight"))
        self._check(torch_prefix, kernel.shape, node["kernel"].shape)
        node["kernel"] = kernel
        if bias:
            self._put(node, "bias", f"{torch_prefix}.bias")

    def bn(self, flax_path: str, torch_prefix: str):
        pnode = _descend(self.params, flax_path)
        snode = _descend(self.stats, flax_path)
        # Families either name the BatchNorm directly ("bn"/"norm1") or wrap
        # it in a module whose anonymous child is BatchNorm_0 (ResNet _BN).
        if "scale" not in pnode and "BatchNorm_0" in pnode:
            pnode = pnode["BatchNorm_0"]
            snode = snode["BatchNorm_0"]
        self._put(pnode, "scale", f"{torch_prefix}.weight")
        self._put(pnode, "bias", f"{torch_prefix}.bias")
        self._put(snode, "mean", f"{torch_prefix}.running_mean")
        self._put(snode, "var", f"{torch_prefix}.running_var")
        self.consumed.add(f"{torch_prefix}.num_batches_tracked")

    def finish(self) -> dict:
        leftovers = {
            k
            for k in self.sd
            if k not in self.consumed
            and not k.endswith("num_batches_tracked")
            and not any(k.startswith(p) for p in self.drop)
        }
        if leftovers:
            raise ValueError(
                f"Unconsumed state_dict tensors: {sorted(leftovers)[:8]}..."
            )
        out = dict(self._variables)
        out["params"] = self.params
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# ---------------------------------------------------------------------------
# ResNet family — torchvision layout layerS.B.{convN,bnN,downsample.{0,1}}
# ---------------------------------------------------------------------------

def load_torch_resnet(variables: dict, state_dict) -> dict:
    """Port a torchvision ResNet state_dict into our ResNet variables.

    ``variables``: the tree from ``module.init`` ({'params', 'batch_stats'}).
    Returns a new tree of the same structure. fc.* entries in the state_dict
    are ignored (the reference discards the classifier, models.py:134-136).
    """
    p = _Porter(variables, state_dict, drop=("fc.",))
    p.conv("conv1", "conv1")
    p.bn("bn1", "bn1")
    for stage in range(1, 5):
        block = 0
        while f"layer{stage}_{block}" in p.params:
            ours = f"layer{stage}_{block}"
            theirs = f"layer{stage}.{block}"
            node = p.params[ours]
            n_convs = len([k for k in node if k.startswith("conv")])
            for ci in range(1, n_convs + 1):
                p.conv(f"{ours}/conv{ci}", f"{theirs}.conv{ci}")
                p.bn(f"{ours}/bn{ci}", f"{theirs}.bn{ci}")
            if "downsample_conv" in node:
                p.conv(f"{ours}/downsample_conv", f"{theirs}.downsample.0")
                p.bn(f"{ours}/downsample_bn", f"{theirs}.downsample.1")
            block += 1
    return p.finish()


# ---------------------------------------------------------------------------
# MobileNetV2 — torchvision features.{0..18}; inverted residuals hold a
# `conv` Sequential whose tail is a bare Conv2d + BatchNorm2d pair.
# ---------------------------------------------------------------------------

def load_torch_mobilenet_v2(variables: dict, state_dict) -> dict:
    p = _Porter(variables, state_dict, drop=("classifier.",))
    p.conv("stem/conv", "features.0.0")
    p.bn("stem/bn", "features.0.1")
    block = 0
    while f"block{block}" in p.params:
        ours = f"block{block}"
        theirs = f"features.{block + 1}.conv"
        n_convs = len([k for k in p.params[ours] if k.startswith("conv")])
        # n_convs == 2: expand_ratio 1 (dw, project); == 3: (expand, dw, project)
        for ci in range(n_convs - 1):
            p.conv(f"{ours}/conv{ci}/conv", f"{theirs}.{ci}.0")
            p.bn(f"{ours}/conv{ci}/bn", f"{theirs}.{ci}.1")
        # Projection: bare Conv2d at index n-1, BatchNorm2d at index n.
        p.conv(f"{ours}/conv{n_convs - 1}/conv", f"{theirs}.{n_convs - 1}")
        p.bn(f"{ours}/conv{n_convs - 1}/bn", f"{theirs}.{n_convs}")
        block += 1
    p.conv("head/conv", "features.18.0")
    p.bn("head/bn", "features.18.1")
    return p.finish()


# ---------------------------------------------------------------------------
# DenseNet-121 — torchvision features.denseblock{1..4}.denselayer{1..N}
# (1-based), transitions 1-based; mind the concat layout (growth dim is the
# channel tail, identical concat order in both frameworks).
# ---------------------------------------------------------------------------

def load_torch_densenet121(variables: dict, state_dict) -> dict:
    p = _Porter(variables, state_dict, drop=("classifier.",))
    p.conv("conv0", "features.conv0")
    p.bn("norm0", "features.norm0")
    blk = 0
    while f"block{blk}_layer0" in p.params:
        layer = 0
        while f"block{blk}_layer{layer}" in p.params:
            ours = f"block{blk}_layer{layer}"
            theirs = f"features.denseblock{blk + 1}.denselayer{layer + 1}"
            p.bn(f"{ours}/norm1", f"{theirs}.norm1")
            p.conv(f"{ours}/conv1", f"{theirs}.conv1")
            p.bn(f"{ours}/norm2", f"{theirs}.norm2")
            p.conv(f"{ours}/conv2", f"{theirs}.conv2")
            layer += 1
        if f"transition{blk}" in p.params:
            p.bn(f"transition{blk}/norm", f"features.transition{blk + 1}.norm")
            p.conv(f"transition{blk}/conv", f"features.transition{blk + 1}.conv")
        blk += 1
    p.bn("norm5", "features.norm5")
    return p.finish()


# ---------------------------------------------------------------------------
# VGG-16 / AlexNet — plain conv (with bias) stacks under features.{idx}.
# ---------------------------------------------------------------------------

_VGG16_FEATURE_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_ALEXNET_FEATURE_IDX = (0, 3, 6, 8, 10)


def load_torch_vgg16(variables: dict, state_dict) -> dict:
    p = _Porter(variables, state_dict, drop=("classifier.",))
    for i, idx in enumerate(_VGG16_FEATURE_IDX):
        p.conv(f"conv{i}", f"features.{idx}", bias=True)
    return p.finish()


def load_torch_alexnet(variables: dict, state_dict) -> dict:
    p = _Porter(variables, state_dict, drop=("classifier.",))
    for i, idx in enumerate(_ALEXNET_FEATURE_IDX):
        p.conv(f"conv{i}", f"features.{idx}", bias=True)
    return p.finish()


# ---------------------------------------------------------------------------
# EfficientNet-B0 — torchvision features.{1..7}.{j}.block.{k}; SE squeeze
# convs carry biases; Conv2dNormActivation pairs are (0=conv, 1=bn).
# ---------------------------------------------------------------------------

# (repeats per stage) — torchvision B0; flattened to our block{0..15} names.
_EFFB0_REPEATS = (1, 2, 2, 3, 3, 4, 1)


def load_torch_efficientnet_b0(variables: dict, state_dict) -> dict:
    p = _Porter(variables, state_dict, drop=("classifier.",))
    p.conv("stem/conv", "features.0.0")
    p.bn("stem/bn", "features.0.1")
    block = 0
    for stage, repeats in enumerate(_EFFB0_REPEATS):
        for j in range(repeats):
            ours = f"block{block}"
            theirs = f"features.{stage + 1}.{j}.block"
            n_convs = len([k for k in p.params[ours] if k.startswith("conv")])
            # expand(0, optional) .. dw -> SE -> project; SE sits after the
            # depthwise conv in both layouts.
            for ci in range(n_convs - 1):
                p.conv(f"{ours}/conv{ci}/conv", f"{theirs}.{ci}.0")
                p.bn(f"{ours}/conv{ci}/bn", f"{theirs}.{ci}.1")
            se = n_convs - 1  # SE's torch index == number of convs before it
            p.conv(f"{ours}/se/fc1", f"{theirs}.{se}.fc1", bias=True)
            p.conv(f"{ours}/se/fc2", f"{theirs}.{se}.fc2", bias=True)
            p.conv(f"{ours}/conv{n_convs - 1}/conv", f"{theirs}.{se + 1}.0")
            p.bn(f"{ours}/conv{n_convs - 1}/bn", f"{theirs}.{se + 1}.1")
            block += 1
    p.conv("head/conv", "features.8.0")
    p.bn("head/bn", "features.8.1")
    return p.finish()


# ---------------------------------------------------------------------------
# Inception-V3 — our flax module names mirror torchvision exactly
# (Conv2d_1a_3x3, Mixed_5b.branch1x1, ...), each a BasicConv2d {conv, bn}.
# ---------------------------------------------------------------------------

def load_torch_inception_v3(variables: dict, state_dict) -> dict:
    p = _Porter(variables, state_dict, drop=("fc.", "AuxLogits."))
    for stem, node in p.params.items():
        if isinstance(node, dict) and "conv" in node:  # top-level BasicConv2d
            p.conv(f"{stem}/conv", f"{stem}.conv")
            p.bn(f"{stem}/bn", f"{stem}.bn")
        elif isinstance(node, dict):  # Mixed_* block of BasicConv2d branches
            for branch in node:
                p.conv(f"{stem}/{branch}/conv", f"{stem}.{branch}.conv")
                p.bn(f"{stem}/{branch}/bn", f"{stem}.{branch}.bn")
    return p.finish()


# ---------------------------------------------------------------------------
# Registry-level dispatch
# ---------------------------------------------------------------------------

PORTERS = {
    "resnet18": load_torch_resnet,
    "resnet34": load_torch_resnet,
    "resnet50": load_torch_resnet,
    "resnet101": load_torch_resnet,
    "resnet152": load_torch_resnet,
    "mobilenet_v2": load_torch_mobilenet_v2,
    "densenet121": load_torch_densenet121,
    "vgg16": load_torch_vgg16,
    "alexnet": load_torch_alexnet,
    "efficientnet_b0": load_torch_efficientnet_b0,
    "inception_v3": load_torch_inception_v3,
}


def load_torch_backbone(name: str, variables: dict, state_dict) -> dict:
    """Port a torchvision ``state_dict`` for backbone ``name`` into
    ``variables`` (the tree from ``backbone.init``). Raises on unknown name,
    missing tensors, extra tensors, or any shape mismatch."""
    if name not in PORTERS:
        raise KeyError(
            f"No weight porter for backbone {name!r}; available: "
            f"{sorted(PORTERS)}"
        )
    return PORTERS[name](variables, state_dict)


# Stem conv kernel path per family, for input-scale folding.
_STEM_KERNEL_PATH = {
    "resnet18": ("conv1",), "resnet34": ("conv1",), "resnet50": ("conv1",),
    "resnet101": ("conv1",), "resnet152": ("conv1",),
    "mobilenet_v2": ("stem", "conv"),
    "efficientnet_b0": ("stem", "conv"),
    "densenet121": ("conv0",),
    "vgg16": ("conv0",), "alexnet": ("conv0",),
    "inception_v3": ("Conv2d_1a_3x3", "conv"),
}


def fold_input_scale_into_stem(params: dict, backbone_name: str,
                               scale: float = 1.0 / 255.0) -> dict:
    """Return backbone params with the input normalization folded into the
    stem conv kernel: conv(x * s, k) == conv(x, k * s), and any stem bias
    adds after the contraction so it stays untouched. Lets inference feed
    raw uint8 frames straight into the conv stack — one less full-tensor
    HBM round trip than a separate /255 pass (measured ~7% end-to-end on
    the bench config)."""
    if backbone_name not in _STEM_KERNEL_PATH:
        raise KeyError(
            f"No stem path for backbone {backbone_name!r}; "
            f"available: {sorted(_STEM_KERNEL_PATH)}"
        )
    out = _tree_copy(params)
    node = out
    for key in _STEM_KERNEL_PATH[backbone_name]:
        node = node[key]
    node["kernel"] = node["kernel"] * scale
    return out


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Read a state_dict from disk: ``.npz`` (numpy) or torch ``.pth``."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    return torch_tensor_dict(torch.load(path, map_location="cpu", weights_only=True))


def port_backbone_into_model(
    model_variables: dict, backbone_name: str, state_dict,
    module_name: str = "cnn_backbone",
) -> dict:
    """Port torch backbone weights into a FULL model's variable tree.

    ``module_name`` is the flax submodule the backbone binds to
    ("cnn_backbone" in LRCN/VideoMamba, "cnn" in the caption encoder).
    Mirrors the reference building every model around ``pretrained=True``
    backbones (models.py:133).
    """
    sub = {
        col: tree[module_name]
        for col, tree in model_variables.items()
        if isinstance(tree, dict) and module_name in tree
    }
    if "params" not in sub:
        raise KeyError(
            f"Model variables have no {module_name!r} submodule in 'params'"
        )
    ported = load_torch_backbone(backbone_name, sub, state_dict)
    out = {col: _tree_copy(tree) for col, tree in model_variables.items()}
    for col, tree in ported.items():
        out.setdefault(col, {})[module_name] = tree
    return out
