"""EfficientNet backbone, partial freezing, Adapt DSL wiring, most-unique
samplers, observability (history JSON, step logs)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vct.core.config import Config, ModelConfig
from vct.data.synthetic import generate_dummy_data
from vct.models import build_model
from vct.models.backbones import build_backbone
from vct.train.engine import Trainer, _param_label_tree, count_parameters


@pytest.mark.slow
def test_efficientnet_b0_shapes():
    module, dim = build_backbone("efficientnet_b0")
    assert dim == 1280
    x = jnp.ones((1, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    assert module.apply(variables, x).shape == (1, 1280)


@pytest.mark.slow
def test_inception_v3_shapes_and_param_count():
    module, dim = build_backbone("inception_v3")
    assert dim == 2048
    x = jnp.ones((1, 96, 96, 3))
    variables = module.init(jax.random.PRNGKey(0), x)
    assert module.apply(variables, x).shape == (1, 2048)
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    # torchvision inception_v3 feature stack (no fc, no aux) ~21.79M params
    assert 21_000_000 < n < 22_500_000


def test_adapt_dsl_wiring():
    cfg = ModelConfig(
        num_classes=4, cnn_backbone="resnet18", rnn_type="lstm",
        rnn_input_size=8, rnn_layer=1, use_adapt_dsl=True, adapt="lnsd3",
    )
    model = build_model(cfg, 2)
    x = jnp.ones((1, 2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    # DSL adapter params present instead of the canonical adapt1/2/3
    assert "cell0_linear" in variables["params"]["adapt"]
    assert model.apply(variables, x).shape == (1, 4)


def test_partial_freeze_labels():
    params = {
        "cnn_backbone": {"conv1": 0, "bn1": 0, "layer1_0": 0, "layer2_0": 0,
                         "layer3_0": 0, "layer4_0": 0},
        "head": {"fc": 0},
    }
    labels = _param_label_tree(params, finetune=True,
                               freeze_until="conv1,bn1,layer1,layer2")
    assert labels["head"] == "train"
    assert labels["cnn_backbone"]["conv1"] == "freeze"
    assert labels["cnn_backbone"]["layer2_0"] == "freeze"
    assert labels["cnn_backbone"]["layer3_0"] == "train"
    # full finetune: everything trains
    assert _param_label_tree(params, True)["cnn_backbone"] == "train"
    # default: whole backbone frozen
    assert _param_label_tree(params, False)["cnn_backbone"] == "freeze"


def test_partial_freeze_training():
    cfg = Config().replace(**{
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "model.finetune": "true",
        "model.freeze_until": "conv1,bn1,layer1,layer2,layer3",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.epochs": "1", "train.save_model": "false",
    })
    x, y, names = generate_dummy_data(8, 4, 32, 32, 4)
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    frozen_before = jax.device_get(state.params["cnn_backbone"]["layer1_0"])
    live_before = jax.device_get(state.params["cnn_backbone"]["layer4_0"])
    state, _ = tr.fit(state, x, y, log=False)
    frozen_after = jax.device_get(state.params["cnn_backbone"]["layer1_0"])
    live_after = jax.device_get(state.params["cnn_backbone"]["layer4_0"])
    for a, b in zip(jax.tree_util.tree_leaves(frozen_before),
                    jax.tree_util.tree_leaves(frozen_after)):
        np.testing.assert_array_equal(a, b)
    changed = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(live_before),
                        jax.tree_util.tree_leaves(live_after))
    )
    assert changed, "layer4 should have trained"


def test_most_unique_samplers():
    from vct.data.samplers import (
        optical_flow_sampling_most_unique,
        ssim_sampling_most_unique,
    )

    base = np.zeros((8, 8, 3), np.uint8)
    frames = [base.copy() for _ in range(10)]
    frames[4] = np.full((8, 8, 3), 255, np.uint8)
    out = ssim_sampling_most_unique(frames, 4)
    assert len(out) == 4
    picked = [i for i, f in enumerate(frames) if any(f is o for o in out)]
    assert 0 in picked and 4 in picked
    out2 = optical_flow_sampling_most_unique(frames, 4)
    assert len(out2) == 4


def test_sampler_registry_has_all_reference_methods():
    from vct.data.samplers import SAMPLERS

    for name in ("uniform", "ssim", "sad", "optical_flow", "optiflow",
                 "ssim_most_unique", "optiflow_most_unique"):
        assert name in SAMPLERS


def test_history_json_and_step_logging(tmp_path, capsys):
    history_path = str(tmp_path / "history.json")
    cfg = Config().replace(**{
        "model.cnn_backbone": "resnet18", "model.rnn_type": "lstm",
        "model.rnn_input_size": "8", "model.rnn_layer": "1",
        "data.sequence_length": "4", "data.img_height": "32",
        "data.img_width": "32", "train.batch_size": "8",
        "train.epochs": "2", "train.save_model": "false",
        "train.log_every": "1", "train.history_path": history_path,
    })
    x, y, names = generate_dummy_data(16, 4, 32, 32, 4)
    tr = Trainer(cfg, names)
    state = tr.init_state(jax.random.PRNGKey(0), x)
    state, run = tr.fit(state, x, y)
    out = capsys.readouterr().out
    assert "ms/step" in out
    hist = json.load(open(history_path))
    assert len(hist["train_loss"]) == 2
    assert hist["step_times"]["steps"] == 4
    assert hist["config"]["model"]["rnn_type"] == "lstm"


def test_count_parameters_partial_freeze():
    params = {
        "cnn_backbone": {"conv1": {"w": np.zeros((2, 2))},
                         "layer4_0": {"w": np.zeros(5)}},
        "head": {"w": np.zeros(3)},
    }
    # finetune without freeze_until: everything trainable
    counts = count_parameters(params, finetune=True)
    assert counts["Trainable parameters"] == 12
    # partial freeze subtracts the frozen backbone prefixes
    counts = count_parameters(params, finetune=True, freeze_until="conv1")
    assert counts["Non-trainable parameters"] == 4
    assert counts["Trainable parameters"] == 8
