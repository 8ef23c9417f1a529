"""Port a FULL reference-LRCN torch state_dict into vct variables.

The reference checkpoints whole torch modules (``train_eval.py:53``
``torch.save(model)``); users migrating to vct export
``torch.load(path).state_dict()`` (or already have a state_dict ``.pth``)
and run::

    python -m vct.tools.port_reference --state_dict lrcn.pth \
        --out /models/ported --num_classes 4 --sequence_length 60 \
        --rnn_type mamba --rnn_input_size 8 --rnn_layer 3 ...

producing a standard vct checkpoint dir that the serving stack loads.

Key layout being consumed (``medsos_lrcn/src/models.py:121-186``):

    cnn_backbone.*                       torchvision backbone
    adapt{1,2,3}.*, bn{1,2,3}.*          canonical adapter (Linear + LayerNorm)
    rnn.weight_ih_l{i}[_reverse] ...     nn.LSTM / nn.GRU
    rnn.{i}.norm.weight, rnn.{i}.mixer.* mamba ResidualBlock list
    bn0/fc/bna/fca/bnb/fcb.*             multiclass MLP head
    fc.{i}.weight/bias                   per-class binary head list

The same mapping is golden-tested end-to-end (logits <= 1e-3 of torch)
in ``tests/test_full_model_parity.py``; this module is the production
entry point for it.
"""

from __future__ import annotations

import collections.abc
from typing import Dict

import numpy as np

from vct.models.backbones.port import load_torch_backbone, torch_tensor_dict

__all__ = [
    "port_reference_lrcn",
    "port_reference_videomamba",
    "port_reference_s2vt",
]


def _dense(sd, prefix):
    return {"kernel": np.transpose(sd[f"{prefix}.weight"]),
            "bias": sd[f"{prefix}.bias"]}


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


class _ConsumeTracker(collections.abc.Mapping):
    """Mapping view over a state_dict that records EXACTLY which keys are
    read, so the consume-everything check flags any tensor no porter touched
    (a prefix-based check would silently pass e.g. ``rnn.*_reverse`` weights
    when porting a bidirectional checkpoint with bidirectional=False).

    Derives from ``Mapping`` so every dict-style access (``items``/
    ``values`` included) routes through the tracking ``__getitem__`` —
    EXCEPT the pure existence probes ``in`` and ``get(key)``-miss, which
    must NOT consume: a porter probing ``if "rnn.weight_hh_l0_reverse" in
    sd`` (the bidirectional-detection pattern) would otherwise mark the
    tensor ported without reading it and defeat the leftovers check."""

    def __init__(self, data: Dict[str, np.ndarray], consumed=None, prefix=""):
        self.data = data
        self.consumed = set() if consumed is None else consumed
        self.prefix = prefix

    def __getitem__(self, key):
        self.consumed.add(self.prefix + key)
        return self.data[key]

    def __contains__(self, key):
        return key in self.data  # probe, not consumption

    def get(self, key, default=None):
        # Only an actual hit consumes (Mapping.get would consume via
        # __getitem__ regardless; a miss must stay a pure probe).
        return self[key] if key in self.data else default

    def __iter__(self):
        return iter(self.data)

    def __len__(self):
        return len(self.data)

    def consume_region(self, prefix: str) -> Dict[str, np.ndarray]:
        """Mark every key under ``prefix.`` consumed and return the raw
        sub-dict (for sub-porters with their own strict per-key checks,
        e.g. the backbone porter)."""
        plen = len(prefix) + 1
        sub = {}
        for k, v in self.data.items():
            if k.startswith(prefix + "."):
                self.consumed.add(self.prefix + k)
                sub[k[plen:]] = v
        return sub

    def leftovers(self):
        return sorted(
            self.prefix + k
            for k in self.data
            if self.prefix + k not in self.consumed
            and not k.endswith("num_batches_tracked")
        )


def _split_prefix(sd, prefix: str):
    plen = len(prefix) + 1
    if isinstance(sd, _ConsumeTracker):
        sub = {
            k[plen:]: v for k, v in sd.data.items() if k.startswith(prefix + ".")
        }
        return _ConsumeTracker(sub, sd.consumed, sd.prefix + prefix + ".")
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def _port_rnn(sd_rnn, bidirectional: bool, num_layers: int):
    params = {}
    suffixes = ["", "_reverse"] if bidirectional else [""]
    for layer in range(num_layers):
        for suffix in suffixes:
            for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                key = f"{kind}_l{layer}{suffix}"
                v = sd_rnn[key]
                params[key] = np.transpose(v) if kind.startswith("weight") else v
    return params


def _port_mixer(sd_m):
    return {
        "A_log": sd_m["A_log"],
        "D": sd_m["D"],
        "in_proj": {"kernel": np.transpose(sd_m["in_proj.weight"]),
                    "bias": sd_m["in_proj.bias"]},
        "conv_kernel": np.transpose(sd_m["conv1d.weight"][:, 0, :]),
        "conv_bias": sd_m["conv1d.bias"],
        "x_proj": {"kernel": np.transpose(sd_m["x_proj.weight"])},
        "dt_proj": {"kernel": np.transpose(sd_m["dt_proj.weight"]),
                    "bias": sd_m["dt_proj.bias"]},
        "out_proj": {"kernel": np.transpose(sd_m["out_proj.weight"]),
                     "bias": sd_m["out_proj.bias"]},
    }




def _finish_port(variables: dict, params: dict, sd: _ConsumeTracker,
                 bb: dict, bb_path) -> dict:
    """Shared tail of every porter: consume-everything check (every tensor a
    porter actually READ, tracked per key), per-leaf shape check against the
    fresh init, and assembly with the backbone batch_stats grafted at
    ``bb_path`` (a tuple of tree keys)."""
    leftovers = sd.leftovers()
    if leftovers:
        raise ValueError(
            f"Unconsumed state_dict tensors (the config does not describe "
            f"this checkpoint): {leftovers[:8]}..."
        )

    import jax

    def check(path, a, b):
        if tuple(np.shape(a)) != tuple(np.shape(b)):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            raise ValueError(
                f"{name}: ported shape {np.shape(b)} != model {np.shape(a)}"
            )

    jax.tree_util.tree_map_with_path(
        lambda p, a, b: check(p, a, b), variables["params"], params
    )

    out = dict(variables)
    out["params"] = params
    if bb.get("batch_stats"):
        stats = dict(variables.get("batch_stats", {}))
        node = stats
        for key in bb_path[:-1]:
            node[key] = dict(node.get(key, {}))
            node = node[key]
        node[bb_path[-1]] = bb["batch_stats"]
        out["batch_stats"] = stats
    return out


def port_reference_lrcn(variables: dict, state_dict, model_cfg) -> dict:
    """Port a reference LRCN state_dict into vct LRCN ``variables``.

    ``variables``: fresh tree from ``model.init`` (shapes must match the
    config — same backbone, rnn_type, sizes, classif_mode).
    ``model_cfg``: the ``vct.core.config.ModelConfig`` describing the model.
    Returns a new variables tree; raises KeyError/ValueError on mismatches.
    """
    sd = _ConsumeTracker(torch_tensor_dict(state_dict))

    bb_sub = {
        "params": variables["params"]["cnn_backbone"],
        "batch_stats": variables.get("batch_stats", {}).get("cnn_backbone", {}),
    }
    # The backbone porter runs its own strict per-key consume check.
    bb = load_torch_backbone(
        model_cfg.cnn_backbone, bb_sub, sd.consume_region("cnn_backbone")
    )

    params = dict(variables["params"])
    params["cnn_backbone"] = bb["params"]
    params["adapt"] = {
        "adapt1": _dense(sd, "adapt1"), "bn1": _ln(sd, "bn1"),
        "adapt2": _dense(sd, "adapt2"), "bn2": _ln(sd, "bn2"),
        "adapt3": _dense(sd, "adapt3"), "bn3": _ln(sd, "bn3"),
    }

    if model_cfg.rnn_type == "mamba":
        for i in range(model_cfg.rnn_layer):
            params[f"mamba_{i}"] = {
                "norm": {"weight": sd[f"rnn.{i}.norm.weight"]},
                "mixer": _port_mixer(_split_prefix(sd, f"rnn.{i}.mixer")),
            }
    else:
        params["rnn"] = {
            model_cfg.rnn_type: _port_rnn(
                _split_prefix(sd, "rnn"),
                model_cfg.bidirectional, model_cfg.rnn_layer,
            )
        }

    if model_cfg.classif_mode == "multiclass":
        params["head"] = {
            "bn0": _ln(sd, "bn0"), "fc": _dense(sd, "fc"),
            "bna": _ln(sd, "bna"), "fca": _dense(sd, "fca"),
            "bnb": _ln(sd, "bnb"), "fcb": _dense(sd, "fcb"),
        }
    else:
        # ModuleList of per-class Linear(F, 1) -> one fused Dense(F, C)
        n = model_cfg.num_classes
        params["head"] = {"binary_heads": {
            "kernel": np.concatenate([sd[f"fc.{i}.weight"] for i in range(n)]).T,
            "bias": np.concatenate([sd[f"fc.{i}.bias"] for i in range(n)]),
        }}

    return _finish_port(variables, params, sd, bb, ("cnn_backbone",))


def port_reference_videomamba(variables: dict, state_dict, model_cfg) -> dict:
    """Port a reference VideoMamba state_dict (``lrcn/videomamba.py:332-386``:
    cnn_backbone, single Linear ``adapt``, ``layers.{i}.norm/mixer`` residual
    blocks, ``norm_f``, ``classifier`` Linear or ``classifier.{i}`` list)."""
    sd = _ConsumeTracker(torch_tensor_dict(state_dict))

    bb_sub = {
        "params": variables["params"]["cnn_backbone"],
        "batch_stats": variables.get("batch_stats", {}).get("cnn_backbone", {}),
    }
    bb = load_torch_backbone(
        model_cfg.cnn_backbone, bb_sub, sd.consume_region("cnn_backbone")
    )
    params = dict(variables["params"])
    params["cnn_backbone"] = bb["params"]
    params["adapt"] = _dense(sd, "adapt")
    for i in range(model_cfg.vm_n_layer):
        params[f"layer_{i}"] = {
            "norm": {"weight": sd[f"layers.{i}.norm.weight"]},
            "mixer": _port_mixer(_split_prefix(sd, f"layers.{i}.mixer")),
        }
    params["norm_f"] = {"weight": sd["norm_f.weight"]}
    if model_cfg.classif_mode == "multiclass":
        params["classifier"] = _dense(sd, "classifier")
    else:
        n = model_cfg.num_classes
        params["classifier"] = {
            "kernel": np.concatenate(
                [sd[f"classifier.{i}.weight"] for i in range(n)]
            ).T,
            "bias": np.concatenate(
                [sd[f"classifier.{i}.bias"] for i in range(n)]
            ),
        }

    return _finish_port(variables, params, sd, bb, ("cnn_backbone",))


def port_reference_s2vt(variables: dict, state_dict) -> dict:
    """Port a reference VideoAnalysisModel state_dict
    (``s2vt/beam_search.py:362-382``) into vct S2VTModel variables.

    Key layout consumed: ``cnn.model.*`` (the torchvision backbone incl. its
    discarded fc), ``cnn.fc.*`` (the projection), ``encoder.embedding/gru``,
    ``decoder.embedding/attention.attn/gru/out``. The reference's
    ``cnn.feature_extractor.*`` entries are duplicates of ``cnn.model.*``
    (PretrainedCNN registers the same child modules twice,
    beam_search.py:265-267) and are dropped.
    """
    raw = torch_tensor_dict(state_dict)
    sd = _ConsumeTracker({
        k: v for k, v in raw.items()
        if not k.startswith("cnn.feature_extractor.")
    })

    bb_sub = {
        "params": variables["params"]["cnn"]["cnn"],
        "batch_stats": variables.get("batch_stats", {})
        .get("cnn", {}).get("cnn", {}),
    }
    from vct.models.backbones.port import PORTERS

    # Infer the family from the checkpoint when possible; resnets share one
    # porter, so default there (the reference's PretrainedCNN supports
    # resnet50 / vgg16 / inception_v3 / mobilenet_v2).
    bb_sd = sd.consume_region("cnn.model")
    if any(k.startswith("features.denseblock") for k in bb_sd):
        family = "densenet121"
    elif any(k.startswith("Mixed_") for k in bb_sd):
        family = "inception_v3"
    elif "features.18.0.weight" in bb_sd:
        family = "mobilenet_v2"
    elif "features.0.weight" in bb_sd:
        family = "vgg16"
    else:
        family = "resnet50" if "layer1.0.conv3.weight" in bb_sd else "resnet18"
    bb = PORTERS[family](bb_sub, bb_sd)

    def gru_params(prefix):
        out = {}
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            v = sd[f"{prefix}.{kind}_l0"]
            out[f"{kind}_l0"] = np.transpose(v) if kind.startswith("weight") else v
        return out

    params = dict(variables["params"])
    params["cnn"] = {"cnn": bb["params"], "fc": _dense(sd, "cnn.fc")}
    params["encoder"] = {
        "embedding": _dense(sd, "encoder.embedding"),
        "gru": gru_params("encoder.gru"),
    }
    params["decoder"] = {
        "embedding": {"embedding": sd["decoder.embedding.weight"]},
        "attention": {"attn": _dense(sd, "decoder.attention.attn")},
        "gru_w_ih": np.transpose(sd["decoder.gru.weight_ih_l0"]),
        "gru_w_hh": np.transpose(sd["decoder.gru.weight_hh_l0"]),
        "gru_b_ih": sd["decoder.gru.bias_ih_l0"],
        "gru_b_hh": sd["decoder.gru.bias_hh_l0"],
        "out": _dense(sd, "decoder.out"),
    }

    return _finish_port(variables, params, sd, bb, ("cnn", "cnn"))
