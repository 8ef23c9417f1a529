"""TP sharding-rule tests: anchored path-segment matching.

Round-1 matched by substring (``any(t in path ...)``), which would
column-shard any future param whose path merely *contains* a rule string.
These tests pin the anchored semantics: backbone conv kernels never get a
model-axis spec, and lookalike names don't match.
"""

import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import PartitionSpec as P

from vct.parallel.shard import _is_tp_path, param_pspec


class _Seg:
    def __init__(self, key):
        self.key = key


def _spec(path_segs, shape, model_size=2):
    leaf = np.zeros(shape, np.float32)
    return param_pspec(tuple(_Seg(s) for s in path_segs), leaf, model_size)


def test_anchored_segments_match():
    assert _is_tp_path(["adapt", "adapt1", "kernel"])
    assert _is_tp_path(["head", "fc", "kernel"])
    assert _is_tp_path(["rnn", "lstm", "weight_ih_l0"])
    assert _is_tp_path(["mamba_0", "mixer", "in_proj", "kernel"])
    assert _is_tp_path(["layer_3", "mixer", "in_proj", "kernel"])
    assert _is_tp_path(["classifier", "kernel"])


def test_lookalike_segments_do_not_match():
    # substrings of rule names must NOT match
    assert not _is_tp_path(["overhead", "kernel"])          # contains "head"
    assert not _is_tp_path(["adaptive_pool", "kernel"])     # contains "adapt"
    assert not _is_tp_path(["cnn_backbone", "layer1_0", "conv1", "kernel"])
    assert not _is_tp_path(["layer1_0", "conv1", "kernel"])  # not layer_<i>
    assert not _is_tp_path(["mamba_x", "kernel"])            # not mamba_<i>
    # explicit exclusion wins even if a nested segment matches
    assert not _is_tp_path(["cnn_backbone", "head", "conv", "kernel"])
    assert not _is_tp_path(["cnn", "fc", "kernel"])


def test_full_model_backbone_never_model_sharded():
    """Every param under cnn_backbone replicates; adapter/head kernels shard."""
    from vct.core.config import Config
    from vct.models import build_model

    cfg = Config().replace(**{
        "model.cnn_backbone": "resnet18",
        "model.rnn_type": "mamba",
        "model.rnn_input_size": "8",
        "model.rnn_layer": "1",
        "data.sequence_length": "4",
    })
    model = build_model(cfg.model, 4)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 4, 32, 32, 3), jnp.float32)
    )
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    model_axis_specs = {}
    for path, leaf in flat:
        segs = [str(getattr(k, "key", k)) for k in path]
        spec = _spec(segs, leaf.shape)
        if segs[0] == "cnn_backbone":
            assert spec == P(), f"backbone param {segs} got {spec}"
        elif spec != P():
            model_axis_specs["/".join(segs)] = spec
    # the trainable matmuls did pick up the model axis
    assert any(k.startswith("adapt/") for k in model_axis_specs)
    assert any(k.startswith("head/") for k in model_axis_specs)
    assert any(k.startswith("mamba_0/") for k in model_axis_specs)


def test_ambient_mesh_uses_public_carrier():
    from vct.parallel.mesh import activate_mesh, ambient_mesh, make_mesh

    assert ambient_mesh() is None
    mesh = make_mesh(jax.devices()[:2], data=2, model=1)
    with activate_mesh(mesh) as m:
        assert ambient_mesh() is m
        inner = make_mesh(jax.devices()[:2], data=1, model=2)
        with activate_mesh(inner):
            assert ambient_mesh() is inner
        assert ambient_mesh() is m
    assert ambient_mesh() is None
