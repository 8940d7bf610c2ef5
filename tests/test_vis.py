"""Smoke test for the t-SNE visualization CLI (student mode) on the fixture."""

import os

import numpy as np
import pytest

from pose3d_tpu.data import synthetic

pytestmark = pytest.mark.slow


def test_vis_tsne_student_mode(tmp_path):
    root = str(tmp_path / "data" / "ObjectNet3D")
    synthetic.make_objectnet3d_fixture(root, n_train_per_cat=2, n_val_per_cat=4)

    from pose3d_tpu.cli import vis_tsne

    out = str(tmp_path / "tsne.png")
    embeddings, labels = vis_tsne.main([
        "--mode", "student", "--dataset", "ObjectNet3D",
        "--data_root", str(tmp_path / "data"), "--batch_size", "4",
        "--workers", "0", "--input_dim", "32", "--img_feature_dim", "32",
        "--shape", "None", "--out", out, "--perplexity", "2",
    ])
    assert "student" in embeddings
    assert embeddings["student"].shape[1] == 2
    assert os.path.exists(str(tmp_path / "tsne.npz"))


def test_vis_tsne_contrastive_mode(tmp_path):
    """--mode contrastive (reference vis_contrastive.py): teacher fused +
    image-projector features embedded in ONE t-SNE space."""
    root = str(tmp_path / "data" / "ObjectNet3D")
    synthetic.make_objectnet3d_fixture(root, n_train_per_cat=2, n_val_per_cat=4)

    from pose3d_tpu.cli import vis_tsne

    out = str(tmp_path / "tsne_contrastive.png")
    embeddings, labels = vis_tsne.main([
        "--mode", "contrastive", "--dataset", "ObjectNet3D",
        "--data_root", str(tmp_path / "data"), "--batch_size", "4",
        "--workers", "0", "--input_dim", "32", "--img_feature_dim", "32",
        "--shape_feature_dim", "32", "--shape", "PointCloud",
        "--shape_dir", "pointcloud", "--point_num", "64",
        "--out", out, "--perplexity", "2",
    ])
    assert set(embeddings) == {"fused", "projector"}
    assert embeddings["fused"].shape == embeddings["projector"].shape
    assert embeddings["fused"].shape[1] == 2
    assert len(labels) == embeddings["fused"].shape[0]
    assert os.path.exists(str(tmp_path / "tsne_contrastive.npz"))
