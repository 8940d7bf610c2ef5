"""Tests for optimizer utilities (freeze masks, param counting)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pose3d_tpu.utils import frozen_tx, count_parameters


def test_frozen_tx_zeroes_selected_subtree():
    params = {"VGG_0": {"k": jnp.ones(3)}, "head": {"k": jnp.ones(3)}}
    grads = {"VGG_0": {"k": jnp.full(3, 2.0)}, "head": {"k": jnp.full(3, 2.0)}}
    tx = frozen_tx(optax.sgd(0.5), lambda p: p[0] == "VGG_0")
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(np.asarray(updates["VGG_0"]["k"]), 0.0)
    np.testing.assert_array_equal(np.asarray(updates["head"]["k"]), -1.0)


def test_count_parameters():
    params = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros(5)}}
    assert count_parameters(params) == 11


def test_all_modules_import():
    """Every public module imports cleanly (guards against the reference's
    CUDA-at-import class of defects, SURVEY.md §2b)."""
    import importlib

    for mod in [
        "pose3d_tpu", "pose3d_tpu.geometry", "pose3d_tpu.config",
        "pose3d_tpu.losses", "pose3d_tpu.losses.binned", "pose3d_tpu.losses.nce",
        "pose3d_tpu.losses.kd", "pose3d_tpu.losses.memory_bank",
        "pose3d_tpu.models", "pose3d_tpu.models.resnet", "pose3d_tpu.models.vgg",
        "pose3d_tpu.models.pointnet", "pose3d_tpu.models.deformnet",
        "pose3d_tpu.models.multiview", "pose3d_tpu.models.estimators",
        "pose3d_tpu.ops", "pose3d_tpu.ops.pointnet_fused",
        "pose3d_tpu.ops.geodesic", "pose3d_tpu.ops.nce_fused",
        "pose3d_tpu.parallel", "pose3d_tpu.parallel.mesh",
        "pose3d_tpu.parallel.distributed",
        "pose3d_tpu.data", "pose3d_tpu.data.transforms", "pose3d_tpu.data.ply",
        "pose3d_tpu.data.annotations", "pose3d_tpu.data.datasets",
        "pose3d_tpu.data.loader", "pose3d_tpu.data.synthetic",
        "pose3d_tpu.train", "pose3d_tpu.train.state", "pose3d_tpu.train.steps",
        "pose3d_tpu.train.evaluate", "pose3d_tpu.train.evaluation_api",
        "pose3d_tpu.train.trainer", "pose3d_tpu.train.ckpt",
        "pose3d_tpu.train.torch_import",
        "pose3d_tpu.serving.aot",
        "pose3d_tpu.utils", "pose3d_tpu.cli.common", "pose3d_tpu.cli.training",
        "pose3d_tpu.cli.trainingKD", "pose3d_tpu.cli.testing",
        "pose3d_tpu.cli.inference", "pose3d_tpu.cli.vis_tsne",
    ]:
        importlib.import_module(mod)
