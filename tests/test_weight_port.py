"""Torch->Flax weight porting for every backbone family.

Each synthetic state_dict below is generated from the *published torchvision
architecture* (channel arithmetic + module layout), written out independently
of our port code and our flax trees, so a drift in either side fails loudly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.models.backbones.port import (
    load_torch_backbone,
    load_torch_resnet,
    port_backbone_into_model,
)
from vct.models.backbones.resnet import resnet18, resnet50

_SLOW = pytest.mark.slow  # heavy torch builds stay out of the fast lane


def _torchvision_resnet18_keys():
    """The torchvision resnet18 state_dict layout, written out independently
    of our port code (conv OIHW shapes)."""
    keys = {
        "conv1.weight": (64, 3, 7, 7),
    }

    def bn(name, ch):
        keys[f"{name}.weight"] = (ch,)
        keys[f"{name}.bias"] = (ch,)
        keys[f"{name}.running_mean"] = (ch,)
        keys[f"{name}.running_var"] = (ch,)
        keys[f"{name}.num_batches_tracked"] = ()

    bn("bn1", 64)
    chans = {1: 64, 2: 128, 3: 256, 4: 512}
    for stage in (1, 2, 3, 4):
        ch = chans[stage]
        in_ch = 64 if stage == 1 else chans[stage - 1]
        for block in (0, 1):
            p = f"layer{stage}.{block}"
            first_in = in_ch if block == 0 else ch
            keys[f"{p}.conv1.weight"] = (ch, first_in, 3, 3)
            bn(f"{p}.bn1", ch)
            keys[f"{p}.conv2.weight"] = (ch, ch, 3, 3)
            bn(f"{p}.bn2", ch)
            if block == 0 and stage > 1:
                keys[f"{p}.downsample.0.weight"] = (ch, in_ch, 1, 1)
                bn(f"{p}.downsample.1", ch)
    keys["fc.weight"] = (1000, 512)
    keys["fc.bias"] = (1000,)
    return keys


def _fake_state_dict():
    rng = np.random.RandomState(0)
    sd = {}
    for key, shape in _torchvision_resnet18_keys().items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0)
        elif key.endswith("running_var"):
            sd[key] = np.abs(rng.randn(*shape)).astype(np.float32) + 0.5
        else:
            sd[key] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd


def test_port_resnet18_full():
    model = resnet18()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    sd = _fake_state_dict()
    ported = load_torch_resnet(variables, sd)

    # spot-check transposes and BN placement
    np.testing.assert_array_equal(
        ported["params"]["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        ported["params"]["layer2_0"]["downsample_conv"]["kernel"],
        np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        ported["batch_stats"]["bn1"]["BatchNorm_0"]["mean"], sd["bn1.running_mean"]
    )
    np.testing.assert_array_equal(
        ported["params"]["layer4_1"]["bn2"]["BatchNorm_0"]["scale"],
        sd["layer4.1.bn2.weight"],
    )
    # ported model runs and differs from the random init
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    out_ported = model.apply(ported, x)
    out_random = model.apply(variables, x)
    assert out_ported.shape == (1, 512)
    assert not np.allclose(np.asarray(out_ported), np.asarray(out_random))


def test_port_missing_key_raises():
    model = resnet18()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    sd = _fake_state_dict()
    del sd["layer3.0.conv1.weight"]
    with pytest.raises(KeyError, match="layer3.0.conv1"):
        load_torch_resnet(variables, sd)


def test_port_extra_key_raises():
    model = resnet18()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    sd = _fake_state_dict()
    sd["layer9.0.conv1.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="Unconsumed"):
        load_torch_resnet(variables, sd)


@pytest.mark.slow
def test_port_wrong_shape_raises():
    model = resnet50()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    sd = _fake_state_dict()  # resnet18-shaped
    with pytest.raises((ValueError, KeyError)):
        load_torch_resnet(variables, sd)


# ---------------------------------------------------------------------------
# Synthetic torchvision state_dict generators (architecture-derived shapes)
# ---------------------------------------------------------------------------


def _bn_keys(keys, name, ch):
    keys[f"{name}.weight"] = (ch,)
    keys[f"{name}.bias"] = (ch,)
    keys[f"{name}.running_mean"] = (ch,)
    keys[f"{name}.running_var"] = (ch,)
    keys[f"{name}.num_batches_tracked"] = ()


def _round8(v):
    new_v = max(8, int(v + 4) // 8 * 8)
    if new_v < 0.9 * v:
        new_v += 8
    return new_v


def _mobilenet_v2_keys():
    keys = {"features.0.0.weight": (32, 3, 3, 3)}
    _bn_keys(keys, "features.0.1", 32)
    cfg = [(1, 16, 1), (6, 24, 2), (6, 32, 3), (6, 64, 4),
           (6, 96, 3), (6, 160, 3), (6, 320, 1)]
    in_ch, fidx = 32, 1
    for t, c, n in cfg:
        out_ch = _round8(c)
        for _ in range(n):
            hidden = in_ch * t
            p = f"features.{fidx}.conv"
            if t != 1:
                keys[f"{p}.0.0.weight"] = (hidden, in_ch, 1, 1)
                _bn_keys(keys, f"{p}.0.1", hidden)
                keys[f"{p}.1.0.weight"] = (hidden, 1, 3, 3)
                _bn_keys(keys, f"{p}.1.1", hidden)
                keys[f"{p}.2.weight"] = (out_ch, hidden, 1, 1)
                _bn_keys(keys, f"{p}.3", out_ch)
            else:
                keys[f"{p}.0.0.weight"] = (hidden, 1, 3, 3)
                _bn_keys(keys, f"{p}.0.1", hidden)
                keys[f"{p}.1.weight"] = (out_ch, hidden, 1, 1)
                _bn_keys(keys, f"{p}.2", out_ch)
            in_ch = out_ch
            fidx += 1
    keys["features.18.0.weight"] = (1280, 320, 1, 1)
    _bn_keys(keys, "features.18.1", 1280)
    keys["classifier.1.weight"] = (1000, 1280)
    keys["classifier.1.bias"] = (1000,)
    return keys


def _densenet121_keys():
    keys = {"features.conv0.weight": (64, 3, 7, 7)}
    _bn_keys(keys, "features.norm0", 64)
    ch = 64
    for bi, n_layers in enumerate((6, 12, 24, 16)):
        for li in range(n_layers):
            p = f"features.denseblock{bi + 1}.denselayer{li + 1}"
            _bn_keys(keys, f"{p}.norm1", ch)
            keys[f"{p}.conv1.weight"] = (128, ch, 1, 1)
            _bn_keys(keys, f"{p}.norm2", 128)
            keys[f"{p}.conv2.weight"] = (32, 128, 3, 3)
            ch += 32
        if bi != 3:
            _bn_keys(keys, f"features.transition{bi + 1}.norm", ch)
            keys[f"features.transition{bi + 1}.conv.weight"] = (ch // 2, ch, 1, 1)
            ch //= 2
    _bn_keys(keys, "features.norm5", ch)
    keys["classifier.weight"] = (1000, ch)
    keys["classifier.bias"] = (1000,)
    return keys


def _vgg16_keys():
    keys = {}
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    idxs = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    in_ch = 3
    for ch, idx in zip(chans, idxs):
        keys[f"features.{idx}.weight"] = (ch, in_ch, 3, 3)
        keys[f"features.{idx}.bias"] = (ch,)
        in_ch = ch
    for idx, (o, i) in {0: (4096, 25088), 3: (4096, 4096), 6: (1000, 4096)}.items():
        keys[f"classifier.{idx}.weight"] = (o, i)
        keys[f"classifier.{idx}.bias"] = (o,)
    return keys


def _alexnet_keys():
    keys = {}
    convs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    for idx, (o, i, k) in zip((0, 3, 6, 8, 10), convs):
        keys[f"features.{idx}.weight"] = (o, i, k, k)
        keys[f"features.{idx}.bias"] = (o,)
    for idx, (o, i) in {1: (4096, 9216), 4: (4096, 4096), 6: (1000, 4096)}.items():
        keys[f"classifier.{idx}.weight"] = (o, i)
        keys[f"classifier.{idx}.bias"] = (o,)
    return keys


def _efficientnet_b0_keys():
    keys = {"features.0.0.weight": (32, 3, 3, 3)}
    _bn_keys(keys, "features.0.1", 32)
    cfg = [(1, 3, 16, 1), (6, 3, 24, 2), (6, 5, 40, 2), (6, 3, 80, 3),
           (6, 5, 112, 3), (6, 5, 192, 4), (6, 3, 320, 1)]
    in_ch = 32
    for stage, (t, k, c, n) in enumerate(cfg):
        out_ch = _round8(c)
        for j in range(n):
            p = f"features.{stage + 1}.{j}.block"
            hidden = in_ch * t
            idx = 0
            if t != 1:
                keys[f"{p}.0.0.weight"] = (hidden, in_ch, 1, 1)
                _bn_keys(keys, f"{p}.0.1", hidden)
                idx = 1
            keys[f"{p}.{idx}.0.weight"] = (hidden, 1, k, k)
            _bn_keys(keys, f"{p}.{idx}.1", hidden)
            sq = max(1, in_ch // 4)
            keys[f"{p}.{idx + 1}.fc1.weight"] = (sq, hidden, 1, 1)
            keys[f"{p}.{idx + 1}.fc1.bias"] = (sq,)
            keys[f"{p}.{idx + 1}.fc2.weight"] = (hidden, sq, 1, 1)
            keys[f"{p}.{idx + 1}.fc2.bias"] = (hidden,)
            keys[f"{p}.{idx + 2}.0.weight"] = (out_ch, hidden, 1, 1)
            _bn_keys(keys, f"{p}.{idx + 2}.1", out_ch)
            in_ch = out_ch
    keys["features.8.0.weight"] = (1280, 320, 1, 1)
    _bn_keys(keys, "features.8.1", 1280)
    keys["classifier.1.weight"] = (1000, 1280)
    keys["classifier.1.bias"] = (1000,)
    return keys


def _torchvision_inception_module_names():
    """The torchvision inception_v3 conv-module name set, written out from
    the documented architecture (torchvision inception.py) INDEPENDENTLY of
    the flax tree — drift in the flax module naming fails the structural
    assertion in _inception_v3_keys loudly."""
    names = [
        "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
        "Conv2d_3b_1x1", "Conv2d_4a_3x3",
    ]
    inc_a = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
             "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    inc_b = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
             "branch3x3dbl_3"]
    inc_c = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
             "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
             "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    inc_d = ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
             "branch7x7x3_3", "branch7x7x3_4"]
    inc_e = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
             "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
             "branch3x3dbl_3b", "branch_pool"]
    for block, branches in [
        ("Mixed_5b", inc_a), ("Mixed_5c", inc_a), ("Mixed_5d", inc_a),
        ("Mixed_6a", inc_b),
        ("Mixed_6b", inc_c), ("Mixed_6c", inc_c), ("Mixed_6d", inc_c),
        ("Mixed_6e", inc_c),
        ("Mixed_7a", inc_d),
        ("Mixed_7b", inc_e), ("Mixed_7c", inc_e),
    ]:
        names.extend(f"{block}.{b}" for b in branches)
    return set(names)


def _inception_v3_keys():
    """Inception key list: channel shapes come from our flax tree (no
    torchvision in the image), but the MODULE-NAME STRUCTURE is asserted
    against the independent hand-written torchvision architecture above, so
    a naming drift in the flax tree cannot silently self-fulfil."""
    from vct.models.backbones.inception import inception_v3

    m = inception_v3()
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 96, 96, 3)))
    keys = {}
    for stem, node in v["params"].items():
        subs = [("",)] if "conv" in node else [(b,) for b in node]
        for (branch,) in subs:
            inner = node if branch == "" else node[branch]
            dotted = stem if branch == "" else f"{stem}.{branch}"
            kh, kw, i, o = inner["conv"]["kernel"].shape
            keys[f"{dotted}.conv.weight"] = (o, i, kh, kw)
            _bn_keys(keys, f"{dotted}.bn", o)
    derived = {k[: -len(".conv.weight")] for k in keys
               if k.endswith(".conv.weight")}
    assert derived == _torchvision_inception_module_names(), (
        "flax inception module names drifted from the torchvision "
        f"architecture: {sorted(derived ^ _torchvision_inception_module_names())[:6]}"
    )
    keys["fc.weight"] = (1000, 2048)
    keys["fc.bias"] = (1000,)
    keys["AuxLogits.conv0.conv.weight"] = (128, 768, 1, 1)
    _bn_keys(keys, "AuxLogits.conv0.bn", 128)
    keys["AuxLogits.conv1.conv.weight"] = (768, 128, 5, 5)
    _bn_keys(keys, "AuxLogits.conv1.bn", 768)
    keys["AuxLogits.fc.weight"] = (1000, 768)
    keys["AuxLogits.fc.bias"] = (1000,)
    return keys


def _synth_state_dict(keys, seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for key, shape in keys.items():
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0)
        elif key.endswith("running_var"):
            sd[key] = np.abs(rng.randn(*shape)).astype(np.float32) + 0.5
        else:
            sd[key] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd


_FAMILY_CASES = [
    ("mobilenet_v2", _mobilenet_v2_keys, 64, 1280),
    ("densenet121", _densenet121_keys, 64, 1024),
    ("vgg16", _vgg16_keys, 64, 25088),
    ("alexnet", _alexnet_keys, 64, 9216),
    ("efficientnet_b0", _efficientnet_b0_keys, 64, 1280),
    ("inception_v3", _inception_v3_keys, 96, 2048),
]


@pytest.mark.parametrize("name,keygen,size,feat", _FAMILY_CASES,
                         ids=[c[0] for c in _FAMILY_CASES])
@pytest.mark.slow
def test_port_family_full(name, keygen, size, feat):
    from vct.models.backbones import BACKBONES

    model = BACKBONES.get(name)()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, size, size, 3)))
    sd = _synth_state_dict(keygen())
    ported = load_torch_backbone(name, variables, sd)

    x = jnp.asarray(np.random.RandomState(1).rand(2, size, size, 3), jnp.float32)
    out_ported = model.apply(ported, x)
    out_random = model.apply(variables, x)
    assert out_ported.shape == (2, feat)
    assert np.all(np.isfinite(np.asarray(out_ported)))
    assert not np.allclose(np.asarray(out_ported), np.asarray(out_random))


@pytest.mark.slow
def test_port_family_spot_checks():
    """Transpose + BN-stat placement spot checks on non-resnet families."""
    from vct.models.backbones import BACKBONES

    m = BACKBONES.get("mobilenet_v2")()
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    sd = _synth_state_dict(_mobilenet_v2_keys())
    ported = load_torch_backbone("mobilenet_v2", v, sd)
    # depthwise conv: (C,1,k,k) -> (k,k,1,C)
    np.testing.assert_array_equal(
        ported["params"]["block1"]["conv1"]["conv"]["kernel"],
        np.transpose(sd["features.2.conv.1.0.weight"], (2, 3, 1, 0)),
    )
    np.testing.assert_array_equal(
        ported["batch_stats"]["head"]["bn"]["mean"],
        sd["features.18.1.running_mean"],
    )

    m = BACKBONES.get("densenet121")()
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    sd = _synth_state_dict(_densenet121_keys())
    ported = load_torch_backbone("densenet121", v, sd)
    np.testing.assert_array_equal(
        ported["params"]["block2_layer5"]["conv2"]["kernel"],
        np.transpose(
            sd["features.denseblock3.denselayer6.conv2.weight"], (2, 3, 1, 0)
        ),
    )
    np.testing.assert_array_equal(
        ported["batch_stats"]["transition1"]["norm"]["var"],
        sd["features.transition2.norm.running_var"],
    )

    m = BACKBONES.get("efficientnet_b0")()
    v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    sd = _synth_state_dict(_efficientnet_b0_keys())
    ported = load_torch_backbone("efficientnet_b0", v, sd)
    np.testing.assert_array_equal(
        ported["params"]["block0"]["se"]["fc1"]["bias"],
        sd["features.1.0.block.1.fc1.bias"],
    )


@pytest.mark.parametrize("name,keygen", [
    # all non-resnet inits are ~10s+ on the 1-core CPU lane; the raise path
    # lives in the shared _Porter and stays fast-covered by
    # test_port_missing_key_raises (resnet18)
    pytest.param("mobilenet_v2", _mobilenet_v2_keys, marks=_SLOW),
    pytest.param("densenet121", _densenet121_keys, marks=_SLOW),
    pytest.param("efficientnet_b0", _efficientnet_b0_keys, marks=_SLOW),
])
def test_port_family_missing_key_raises(name, keygen):
    from vct.models.backbones import BACKBONES

    model = BACKBONES.get(name)()
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    sd = _synth_state_dict(keygen())
    victim = sorted(k for k in sd if k.endswith(".weight"))[3]
    del sd[victim]
    with pytest.raises(KeyError):
        load_torch_backbone(name, v, sd)


def test_port_family_extra_key_raises():
    """The consume-everything policy flags any tensor no porter read.
    (resnet18 — the smallest family — keeps this raise-path test cheap;
    the policy lives in the shared _Porter, not per family.)"""
    from vct.models.backbones import BACKBONES

    model = BACKBONES.get("resnet18")()
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))
    sd = _fake_state_dict()
    sd["layer9.0.conv1.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError, match="Unconsumed"):
        load_torch_backbone("resnet18", v, sd)


def test_port_unknown_backbone_raises():
    with pytest.raises(KeyError, match="No weight porter"):
        load_torch_backbone("resnext50", {"params": {}}, {})


@pytest.mark.slow
def test_port_backbone_into_full_model():
    """Port into the LRCN's cnn_backbone submodule; head params untouched."""
    from vct.core.config import Config
    from vct.models import build_model

    cfg = Config().replace(**{
        "model.cnn_backbone": "mobilenet_v2",
        "model.rnn_type": "gru",
        "data.sequence_length": "4",
    })
    model = build_model(cfg.model, 4)
    x = jnp.ones((1, 4, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = _synth_state_dict(_mobilenet_v2_keys())
    ported = port_backbone_into_model(variables, "mobilenet_v2", sd)
    np.testing.assert_array_equal(
        ported["params"]["cnn_backbone"]["stem"]["conv"]["kernel"],
        np.transpose(sd["features.0.0.weight"], (2, 3, 1, 0)),
    )
    # non-backbone params are untouched
    for key in variables["params"]:
        if key != "cnn_backbone":
            a = jax.tree_util.tree_leaves(variables["params"][key])
            b = jax.tree_util.tree_leaves(ported["params"][key])
            for x1, x2 in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    out = model.apply(ported, x)
    assert out.shape == (1, cfg.model.num_classes)


@pytest.mark.parametrize("name,size", [
    ("resnet18", 64), ("vgg16", 64), ("alexnet", 64),
    pytest.param("mobilenet_v2", 64, marks=_SLOW),
    pytest.param("densenet121", 64, marks=_SLOW),
    pytest.param("efficientnet_b0", 64, marks=_SLOW),
    pytest.param("inception_v3", 96, marks=_SLOW),
])
def test_fold_input_scale_into_stem(name, size):
    """conv(x/255) == conv_with_folded_kernel(x) for every family.

    Pinned to float32 conv precision: this checks the algebraic fold, and
    a backend's DEFAULT conv precision can be bf16-class (the TPU MXU:
    measured ~3e-3 relative on a single stem conv), which drowns the 1e-4
    tolerance. Under f32 the two scalings agree to ~2e-7 on every backend,
    so the test is meaningful on the CPU lane and under VCT_TEST_TPU=1
    alike.
    """
    from vct.models.backbones import BACKBONES
    from vct.models.backbones.port import fold_input_scale_into_stem

    model = BACKBONES.get(name)()
    with jax.default_matmul_precision("float32"):
        variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, size, size, 3)))
        raw = np.random.RandomState(0).randint(0, 256, (2, size, size, 3), np.uint8)

        want = model.apply(variables, jnp.asarray(raw, jnp.float32) / 255.0)
        folded = dict(variables)
        folded["params"] = fold_input_scale_into_stem(variables["params"], name)
        got = model.apply(folded, jnp.asarray(raw, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fold_unknown_backbone_raises():
    from vct.models.backbones.port import fold_input_scale_into_stem

    with pytest.raises(KeyError, match="No stem path"):
        fold_input_scale_into_stem({}, "resnext")


def test_consume_tracker_probes_do_not_consume():
    """`in` and `get(miss)` are pure probes: a porter probing for optional
    keys (the bidirectional-detection pattern) must NOT mark them consumed,
    or the leftovers check would pass on weights that were never ported."""
    from vct.models.lrcn_port import _ConsumeTracker

    sd = {"a": np.zeros(1), "rnn.weight_hh_l0_reverse": np.ones(1)}
    t = _ConsumeTracker(sd)
    assert "rnn.weight_hh_l0_reverse" in t
    assert t.get("missing") is None
    assert t.get("missing", 7) == 7
    assert t.leftovers() == ["a", "rnn.weight_hh_l0_reverse"]
    # real reads DO consume — get() hit included
    _ = t["a"]
    assert t.get("rnn.weight_hh_l0_reverse") is not None
    assert t.leftovers() == []
    # Mapping niceties still route through tracking
    t2 = _ConsumeTracker(dict(sd))
    assert sorted(k for k, _ in t2.items()) == sorted(sd)
    assert t2.leftovers() == []
