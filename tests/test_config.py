import dataclasses

import pytest

from vct.core.config import Config, apply_overrides, parse_cli_overrides


def test_defaults_match_reference():
    # all_config.py:11-31 defaults
    cfg = Config()
    assert cfg.data.img_height == 80
    assert cfg.data.sequence_length == 60
    assert cfg.model.rnn_type == "mamba"
    assert cfg.model.rnn_input_size == 8
    assert cfg.model.resolved_hidden_size == 32  # MULT_FACTOR * RNN_INPUT_SIZE
    assert cfg.train.batch_size == 32
    assert cfg.train.epochs == 8


def test_dotted_overrides_and_coercion():
    cfg = Config().replace(**{
        "model.rnn_type": "lstm",
        "model.hidden_size": "64",
        "train.epochs": "3",
        "model.bidirectional": "true",
    })
    assert cfg.model.rnn_type == "lstm"
    assert cfg.model.resolved_hidden_size == 64
    assert cfg.train.epochs == 3
    assert cfg.model.bidirectional is True
    # original untouched (immutability)
    assert Config().model.rnn_type == "mamba"


def test_unknown_override_raises():
    with pytest.raises((KeyError, TypeError)):
        apply_overrides(Config(), {"model.nonexistent": 1})


def test_cache_key_convention():
    # all_config.py:32-35 naming
    cfg = Config()
    assert "1000_60fr_uniform" in cfg.data.data_file


def test_artifact_name_encodes_config():
    # runner.py:69-75 convention
    cfg = Config()
    name = cfg.artifact_name("best_model")
    # Exact reference fragments (runner.py:69-75 best_model_filename):
    # rnn{input}, rnnType{..}, method{..}, epochs{..}.
    for frag in ("seq60", "batch32", "hidden32", "cnnresnet50", "rnnTypemamba",
                 "methoduniform", "outall", "max1000", "epochs8",
                 "classifmodemulticlass"):
        assert frag in name, frag


def test_roundtrip_dict():
    cfg = Config().replace(**{"model.rnn_type": "gru"})
    assert Config.from_dict(cfg.to_dict()) == cfg


def test_cli_override_parsing():
    ov = parse_cli_overrides(["--model.rnn_type", "lstm", "--train.epochs=5"])
    assert ov == {"model.rnn_type": "lstm", "train.epochs": "5"}
