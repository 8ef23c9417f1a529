"""Torch->Flax weight porting for the ResNet family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.models.backbones.port import load_torch_resnet
from vct.models.backbones.resnet import resnet18, resnet50


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


def test_port_wrong_shape_raises():
    model = resnet50()
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    sd = _fake_state_dict()  # resnet18-shaped
    with pytest.raises((ValueError, KeyError)):
        load_torch_resnet(variables, sd)
