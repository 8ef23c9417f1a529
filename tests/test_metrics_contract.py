"""The stdout metric block must be scrapeable by the reference's exact
regexes (``runner.py:108-135``)."""

import pytest

from vct.core.metrics_contract import (
    RunMetrics,
    extract_metrics,
    print_metric_block,
    print_param_counts,
    print_training_duration,
)


def _capture_block(capsys, classif_mode="multiclass"):
    m = RunMetrics(
        accuracy=0.7612, precision=0.76, recall=0.7601, f1=0.7601,
        training_duration=365.96, inference_duration=12.08,
        trainable_params=3225764,
        per_class={"a": {"precision": 0.5, "recall": 0.5, "f1": 0.5, "accuracy": 0.5}},
    )
    print_training_duration(m.training_duration)
    print_param_counts(m.trainable_params, 100)
    print_metric_block(m, ["a"], classif_mode)
    return capsys.readouterr().out, m


@pytest.mark.parametrize("mode", ["multiclass", "multiple_binary"])
def test_roundtrip(capsys, mode):
    out, m = _capture_block(capsys, mode)
    got = extract_metrics(out)
    assert got.accuracy == pytest.approx(m.accuracy, abs=1e-4)
    assert got.f1 == pytest.approx(m.f1, abs=1e-4)
    assert got.training_duration == pytest.approx(365.96)
    assert got.inference_duration == pytest.approx(12.08)
    assert got.trainable_params == 3225764


def test_missing_metric_raises():
    with pytest.raises(ValueError, match="Could not find a match"):
        extract_metrics("Overall Accuracy: 0.5\n")


def test_reference_regexes_verbatim(capsys):
    """Drive the scrape with the reference's literal patterns."""
    import re

    out, _ = _capture_block(capsys)
    patterns = {
        "accuracy": r"Overall Accuracy: (\d\.\d+|\d\.\d)",
        "precision": r"Overall Precision: (\d\.\d+|\d\.\d)",
        "recall": r"Overall Recall: (\d\.\d+|\d\.\d)",
        "f1": r"Overall F1-Score: (\d\.\d+|\d\.\d)",
        "train_duration": r"training_duration:\s+([\d.]+)",
        "inf_duration": r"inference_duration:\s+([\d.]+)",
        "trainable_params": r"'Trainable parameters':\s+(\d+)",
    }
    for key, pattern in patterns.items():
        assert re.search(pattern, out), key
