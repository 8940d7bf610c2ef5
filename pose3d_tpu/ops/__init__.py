from pose3d_tpu.ops.pointnet_fused import fused_pointnet_eval, fold_pointnet_params
from pose3d_tpu.ops.geodesic import rotation_err_pallas

__all__ = ["fused_pointnet_eval", "fold_pointnet_params", "rotation_err_pallas"]
