"""Typed experiment configuration.

The reference scatters hyperparameters across per-CLI argparse sets and
hard-coded constants (SURVEY.md §5 'Config / flag system': seed 46, bin_size
15, loss weights 0.25/0.75, wd 5e-4, regime epoch counts...). Here every knob
lives in one dataclass tree; the CLIs remain flag-compatible mirrors
(pose3d_tpu/cli/*) and build these configs via `from_namespace`.

Hard-coded reference constants are surfaced as defaults with their source
cited, so a config diff shows exactly how a run deviates from the paper
recipe.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass
class DataConfig:
    dataset: str = "ObjectNet3D"
    data_root: str = "data"
    shape: str | None = "PointCloud"  # PointCloud | MultiView | None
    shape_dir: str = "pointcloud"
    input_dim: int = 224
    point_num: int = 2500  # dataset.py:160
    view_num: int = 12
    tour: int = 2
    keypoint: bool = False
    novel: bool = False
    shot: int | None = None
    random: bool = False
    random_range: int = 0
    workers: int = 4
    loader: str = "thread"  # thread | shm (data/shm_loader.py process workers)


@dataclass
class ModelConfig:
    img_feature_dim: int = 1024
    shape_feature_dim: int = 1024
    student_feature_dim: int = 2048  # trainingKD.py:211
    bin_size: int = 15  # base_class.py:100
    bf16: bool = True


@dataclass
class OptimConfig:
    lr: float = 1e-4  # README.md:62
    weight_decay: float = 5e-4  # training.py:269
    decrease: int = 200  # epoch of the single MultiStepLR milestone
    gamma: float = 0.1


@dataclass
class LossConfig:
    # teacher contrastive term (training.py:57-59)
    teacher_nce_weight: float = 0.5
    teacher_nce_tau: float = 0.1
    nce_dropout: float = 0.3  # model_utils.py:268
    # KD weights (vanilla_kd.py:119-160)
    kd_gt_weight: float = 0.25
    kd_kl_weight: float = 0.75
    kd_feature_weight: float = 0.75
    temperature: float = 1.0  # vanilla_kd.py:107
    # stage-1 symmetric NCE (base_class.py:508-510)
    stage1_nce_weight: float = 0.75
    tau: float = 0.5  # --tau CLI default
    weighting: str = "linear"


@dataclass
class RunConfig:
    seed: int = 46  # training.py:195
    batch_size: int = 160
    n_epoch: int = 300
    n_devices: int | None = None
    result_dir: str = "result"
    resume: bool = False
    profile_dir: str | None = None
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss: LossConfig = field(default_factory=LossConfig)

    # regime epoch counts hard-coded in the reference (trainingKD.py:280-287)
    REGIME_EPOCHS = {"contrast": 30, "crd": 60, "stage1": 300, "stage2": 90}

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        raw = json.loads(text)

        def build(dc_cls, d):
            kwargs = {}
            for f in dataclasses.fields(dc_cls):
                if f.name not in d:
                    continue
                v = d[f.name]
                if dataclasses.is_dataclass(f.type) or f.name in (
                        "data", "model", "optim", "loss"):
                    sub = {"data": DataConfig, "model": ModelConfig,
                           "optim": OptimConfig, "loss": LossConfig}[f.name]
                    kwargs[f.name] = build(sub, v)
                else:
                    kwargs[f.name] = v
            return dc_cls(**kwargs)

        return build(cls, raw)

    @classmethod
    def from_namespace(cls, opt: Any) -> "RunConfig":
        """Build from an argparse Namespace produced by the CLI flag mirrors;
        unknown attributes are ignored, missing ones keep defaults."""
        cfg = cls()

        def fill(dc):
            for f in dataclasses.fields(dc):
                if dataclasses.is_dataclass(getattr(dc, f.name, None)):
                    fill(getattr(dc, f.name))
                elif hasattr(opt, f.name) and getattr(opt, f.name) is not None:
                    setattr(dc, f.name, getattr(opt, f.name))

        fill(cfg)
        for sub in (cfg.data, cfg.model, cfg.optim, cfg.loss):
            fill(sub)
        return cfg
