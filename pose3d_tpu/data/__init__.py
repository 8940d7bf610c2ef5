from pose3d_tpu.data import transforms, ply, annotations, datasets, loader, synthetic

__all__ = ["transforms", "ply", "annotations", "datasets", "loader", "synthetic"]
