from pose3d_tpu.losses.binned import (
    cross_entropy_bin_loss,
    delta_loss,
    label_smoothing_loss,
    pose_loss,
    pose_loss_per_sample,
    smooth_cross_entropy_bin_loss,
    smooth_l1,
)
from pose3d_tpu.losses.nce import (
    info_nce,
    info_nce_kd,
    info_nce_kd_per_sample,
    pose_nce,
    pose_nce_kd,
    single_info_nce_kd,
    multi_pose_nce_kd,
)
from pose3d_tpu.losses.memory_bank import (
    MemoryBank,
    init_memory_bank,
    enqueue,
    info_nce_memory,
)
from pose3d_tpu.losses.kd import (
    temperature_scaled_kl,
    gaussian_vid_loss,
    kd_loss,
    kd_loss_with_features,
    vid_loss,
)

__all__ = [
    "cross_entropy_bin_loss",
    "delta_loss",
    "label_smoothing_loss",
    "pose_loss",
    "pose_loss_per_sample",
    "smooth_cross_entropy_bin_loss",
    "smooth_l1",
    "info_nce",
    "info_nce_kd",
    "info_nce_kd_per_sample",
    "pose_nce",
    "pose_nce_kd",
    "single_info_nce_kd",
    "multi_pose_nce_kd",
    "MemoryBank",
    "init_memory_bank",
    "enqueue",
    "info_nce_memory",
    "temperature_scaled_kl",
    "gaussian_vid_loss",
    "kd_loss",
    "kd_loss_with_features",
    "vid_loss",
]
