from pose3d_tpu.ops.pointnet_fused import fused_pointnet_eval, fold_pointnet_params

__all__ = ["fused_pointnet_eval", "fold_pointnet_params"]
