"""Config dataclass tests: JSON roundtrip + namespace mirror."""

import argparse

from pose3d_tpu.config import RunConfig


def test_defaults_match_reference_constants():
    cfg = RunConfig()
    assert cfg.seed == 46
    assert cfg.model.bin_size == 15
    assert cfg.optim.weight_decay == 5e-4
    assert cfg.loss.kd_gt_weight == 0.25 and cfg.loss.kd_kl_weight == 0.75
    assert cfg.loss.nce_dropout == 0.3
    assert RunConfig.REGIME_EPOCHS["crd"] == 60


def test_json_roundtrip():
    cfg = RunConfig()
    cfg.batch_size = 46
    cfg.loss.tau = 0.25
    cfg.data.shot = 10
    restored = RunConfig.from_json(cfg.to_json())
    assert restored.batch_size == 46
    assert restored.loss.tau == 0.25
    assert restored.data.shot == 10
    assert restored.model.bin_size == 15


def test_from_namespace():
    ns = argparse.Namespace(batch_size=8, lr=3e-4, shape="MultiView",
                            tau=0.9, img_feature_dim=64)
    cfg = RunConfig.from_namespace(ns)
    assert cfg.batch_size == 8
    assert cfg.optim.lr == 3e-4
    assert cfg.data.shape == "MultiView"
    assert cfg.loss.tau == 0.9
    assert cfg.model.img_feature_dim == 64
