"""Compat-surface tests: reference names resolve and compute the same values."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_reference_names_importable():
    from pose3d_tpu import compat

    for name in ("PoseEstimator", "BaselineEstimator", "PoseEstimator_Vanilla",
                 "ShapeEncoderPC", "ShapeEncoderMV", "DeformNet", "resnet50",
                 "vgg11", "angles_to_matrix", "rotation_err", "rotation_acc",
                 "infoNCE", "poseNCE", "poseNCE_KD", "infoNCE_KD",
                 "singleinfoNCE_KD", "multiposeNCE_KD", "CELoss", "DeltaLoss",
                 "TemperatureScaledKLDivLoss", "GaussianLoss", "VanillaKD",
                 "AverageValueMeter", "random_crop", "resize_pad",
                 "read_pointcloud", "get_pred_from_cls_output"):
        assert hasattr(compat, name), name


def test_compat_losses_match_canonical(rng):
    from pose3d_tpu import compat
    from pose3d_tpu import losses

    logits = jnp.asarray(rng.standard_normal((16, 24)).astype(np.float32))
    target = jnp.asarray(rng.integers(0, 360, 16).astype(np.int32))
    assert float(compat.CELoss(360)(logits, target)) == pytest.approx(
        float(losses.cross_entropy_bin_loss(logits, target, 360)), rel=1e-6)

    s = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((8, 32)).astype(np.float32))
    assert float(compat.infoNCE_KD(s, t, None, tau=0.5)) == pytest.approx(
        float(losses.info_nce_kd(s, t, 0.5, dropout_rng=None)), rel=1e-6)
