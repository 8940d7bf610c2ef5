"""Reference-name compatibility surface.

Users migrating from the reference repo can find every public symbol they
used under its original name here, mapped to the TPU-native equivalent:

    from pose3d_tpu.compat import (PoseEstimator, BaselineEstimator,
                                   infoNCE_KD, rotation_err, DeltaLoss, ...)

Function-style losses keep the reference call signatures where they were
sane; class-style losses (CELoss/DeltaLoss) are provided as thin callable
wrappers. Trainers: `VanillaKD` maps to pose3d_tpu.train.trainer.KDTrainer
(see its docstring for the regime methods).
"""

from __future__ import annotations

import jax.numpy as jnp

# models (auxiliary/model.py names)
from pose3d_tpu.models import (  # noqa: F401
    BaselineEstimator,
    PoseEstimator,
    PoseEstimatorVanilla as PoseEstimator_Vanilla,
    ShapeEncoderPC,
    ShapeEncoderMV,
    ShapeEncoderMVRaw,
    DeformNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    vgg11,
    vgg11_bn,
    vgg13,
    vgg16,
    vgg19,
)

# geometry (auxiliary/utils.py names)
from pose3d_tpu.geometry import (  # noqa: F401
    angles_to_matrix,
    rotation_err,
    rotation_acc,
    angle_err,
)

# losses (auxiliary/loss.py + model_utils.py names)
from pose3d_tpu.losses import (
    cross_entropy_bin_loss,
    delta_loss as _delta_loss,
    info_nce,
    info_nce_kd,
    pose_nce,
    pose_nce_kd,
    single_info_nce_kd,
    multi_pose_nce_kd,
    label_smoothing_loss as LabelSmoothingLoss,  # noqa: F401
    smooth_cross_entropy_bin_loss,
)

# KD losses (KD/vision/vanilla/vanilla_kd.py names)
from pose3d_tpu.losses import (  # noqa: F401
    temperature_scaled_kl as TemperatureScaledKLDivLoss,
    gaussian_vid_loss as GaussianLoss,
)

# utilities (auxiliary/utils.py names)
from pose3d_tpu.utils import AverageValueMeter  # noqa: F401
from pose3d_tpu.data.transforms import (  # noqa: F401
    random_crop,
    resize_pad,
    resize_padding,
    sample_pointcloud as read_pointcloud,
    process_viewpoint_label,
)

# trainer (KD/ names)
from pose3d_tpu.train.trainer import KDTrainer as VanillaKD  # noqa: F401

# evaluation library (evaluation.py names, imported by training.py:15,
# trainingKD.py:19, KD/common/base_class.py:15)
from pose3d_tpu.train.evaluation_api import (  # noqa: F401
    val,
    val_new,
    test_category,
    test_category_training,
    test_category_training_new,
)


def infoNCE(feat_ori, feat_pos, tau=0.1):
    """model_utils.py:169 name."""
    return info_nce(feat_ori, feat_pos, tau)


def poseNCE(feat_ori, feat_pos, label, tau=0.1, weighting="linear"):
    """model_utils.py:187 name."""
    return pose_nce(feat_ori, feat_pos, label, tau, weighting)


def poseNCE_KD(feat_ori, feat_pos, label, tau=0.1, weighting="linear"):
    """model_utils.py:225 name."""
    return pose_nce_kd(feat_ori, feat_pos, label, tau, weighting)


def infoNCE_KD(feat_ori, feat_pos, label=None, tau=0.1, weighting="linear",
               dropout_rng=None):
    """model_utils.py:263 name; `label`/`weighting` accepted and ignored like
    the reference does. Pass dropout_rng for the teacher-dropout behavior."""
    del label, weighting
    return info_nce_kd(feat_ori, feat_pos, tau, dropout_rng=dropout_rng)


def singleinfoNCE_KD(feat_ori, feat_pos, label=None, tau=0.1, weighting="linear"):
    del label, weighting
    return single_info_nce_kd(feat_ori, feat_pos, tau)


def multiposeNCE_KD(feat_ori, feat_pos, label, tau=0.1):
    return multi_pose_nce_kd(feat_ori, feat_pos, label, tau)


class CELoss:
    """auxiliary/loss.py:13 name: CE on angle-bin labels."""

    def __init__(self, range):  # noqa: A002 (reference arg name)
        self.range = range

    def __call__(self, pred, target):
        return cross_entropy_bin_loss(pred, target, self.range)


class DeltaLoss:
    """auxiliary/loss.py:37 name: in-bin offset Huber loss."""

    def __init__(self, bin):  # noqa: A002 (reference arg name)
        self.bin = bin

    def __call__(self, pred_azi, pred_ele, pred_rol, target):
        return _delta_loss(pred_azi, pred_ele, pred_rol,
                           target.astype(jnp.int32), self.bin)


def get_pred_from_cls_output(outputs):
    """auxiliary/utils.py:92 name: per-head argmax bins."""
    return [jnp.argmax(o, axis=-1) for o in outputs]
