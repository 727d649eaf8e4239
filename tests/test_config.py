"""Unified config override tests."""

import dataclasses

import pytest

from himo_tpu.training.losses import SSLLossWeights
from himo_tpu.training.trainer import TrainConfig
from himo_tpu.utils.config import apply_overrides, split_known_overrides


def test_flat_override():
    cfg = apply_overrides(TrainConfig(), {"lr": 1e-4, "epochs": 3})
    assert cfg.lr == 1e-4
    assert cfg.epochs == 3
    assert cfg.batch_size == TrainConfig().batch_size


def test_nested_dotted_override():
    cfg = apply_overrides(TrainConfig(), {"weights.chamfer_dis": 2.0})
    assert cfg.weights.chamfer_dis == 2.0
    assert cfg.weights.static_flow_loss == 1.0


def test_nested_mapping_override():
    cfg = apply_overrides(TrainConfig(), {"weights": {"static_flow_loss": 0.5}})
    assert cfg.weights.static_flow_loss == 0.5


def test_unknown_key_raises():
    with pytest.raises(KeyError, match="unknown config key"):
        apply_overrides(TrainConfig(), {"nope": 1})


def test_type_coercion():
    cfg = apply_overrides(TrainConfig(), {"lr": "0.001"})
    assert cfg.lr == pytest.approx(0.001)
    assert isinstance(cfg.lr, float)


def test_split_known():
    known, rest = split_known_overrides(
        TrainConfig, {"lr": 1.0, "weights.chamfer_dis": 2.0, "other": 3}
    )
    assert set(known) == {"lr", "weights.chamfer_dis"}
    assert set(rest) == {"other"}
