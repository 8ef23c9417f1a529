"""Model-family forward/shape/grad tests on synthetic batches — the pattern
the reference itself uses for end-to-end checks (``lrcn/mamba.py:440-457``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct.core.config import ModelConfig
from vct.models import build_model
from vct.models.backbones import BACKBONES, build_backbone

B, T, H, W = 2, 4, 32, 32


def _x(h=H, w=W):
    return jnp.asarray(np.random.RandomState(0).rand(B, T, h, w, 3), jnp.float32)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru", "mamba"])
@pytest.mark.parametrize("rnn_out", ["all", "last"])
def test_lrcn_variants(rnn_type, rnn_out):
    cfg = ModelConfig(
        num_classes=4, cnn_backbone="resnet18", rnn_type=rnn_type,
        rnn_input_size=8, rnn_layer=2, rnn_out=rnn_out,
    )
    model = build_model(cfg, T)
    variables = model.init(jax.random.PRNGKey(0), _x())
    out = model.apply(variables, _x())
    assert out.shape == (B, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lrcn_multiple_binary():
    cfg = ModelConfig(
        num_classes=3, cnn_backbone="resnet18", rnn_type="lstm",
        rnn_input_size=8, rnn_layer=1, classif_mode="multiple_binary",
    )
    model = build_model(cfg, T)
    variables = model.init(jax.random.PRNGKey(0), _x())
    assert model.apply(variables, _x()).shape == (B, 3)


def test_lrcn_bidirectional():
    cfg = ModelConfig(
        num_classes=4, cnn_backbone="resnet18", rnn_type="mamba",
        rnn_input_size=8, rnn_layer=1, bidirectional=True,
    )
    model = build_model(cfg, T)
    variables = model.init(jax.random.PRNGKey(0), _x())
    assert model.apply(variables, _x()).shape == (B, 4)


def test_videomamba_temporal_modes():
    for mode in ("mean", "max", "last", "all"):
        cfg = ModelConfig(
            model_family="videomamba", num_classes=4, cnn_backbone="resnet18",
            vm_d_model=16, vm_d_inner=32, vm_n_state=4, vm_dt_rank=4,
            vm_n_layer=1, vm_temporal_mode=mode,
        )
        model = build_model(cfg, T)
        variables = model.init(jax.random.PRNGKey(0), _x())
        assert model.apply(variables, _x()).shape == (B, 4)


def test_scratch_models():
    for family in ("lrcn2", "td_cnn_lstm"):
        cfg = ModelConfig(model_family=family, num_classes=5, hidden_size=16)
        model = build_model(cfg, T)
        variables = model.init(jax.random.PRNGKey(0), _x())
        assert model.apply(variables, _x()).shape == (B, 5)


@pytest.mark.slow
def test_backbone_feature_dims():
    # True output dims of each backbone (see vgg.py module doc for the
    # reference's VGG/AlexNet size-probe bug we intentionally fix).
    expected = {
        "resnet18": 512, "resnet34": 512, "resnet50": 2048,
        "mobilenet_v2": 1280, "densenet121": 1024,
    }
    x = jnp.ones((1, 64, 64, 3))
    for name, dim in expected.items():
        module, feature_dim = build_backbone(name)
        assert feature_dim == dim, name
        variables = module.init(jax.random.PRNGKey(0), x)
        out = module.apply(variables, x)
        assert out.shape == (1, dim), name


def test_all_backbones_registered():
    for name in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
                 "mobilenet_v2", "densenet121", "vgg16", "alexnet",
                 "efficientnet_b0", "inception_v3"):
        assert name in BACKBONES


def test_vgg_alexnet_forward_dims():
    # True output widths (the reference's size probe would claim 4096 for
    # both — the documented bug we fix; see vgg.py module doc).
    x = jnp.ones((1, 96, 96, 3))
    for name, dim in (("vgg16", 25088), ("alexnet", 9216)):
        module, feature_dim = build_backbone(name)
        assert feature_dim == dim, name
        variables = module.init(jax.random.PRNGKey(0), x)
        assert module.apply(variables, x).shape == (1, dim), name


@pytest.mark.slow
def test_backbone_frozen_no_grad():
    cfg = ModelConfig(num_classes=4, cnn_backbone="resnet18", rnn_type="lstm",
                      rnn_input_size=8, rnn_layer=1)
    model = build_model(cfg, T)
    variables = model.init(jax.random.PRNGKey(0), _x())

    def loss(params):
        out = model.apply({**variables, "params": params}, _x())
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    bb_grads = jax.tree_util.tree_leaves(g["cnn_backbone"])
    assert all(bool(jnp.all(leaf == 0)) for leaf in bb_grads)
    head_grads = jax.tree_util.tree_leaves(g["head"])
    assert any(bool(jnp.any(leaf != 0)) for leaf in head_grads)
