"""Checkpoint tests: orbax save/restore roundtrip, lenient partial merge, and
the PyTorch .pth importer validated end-to-end against the reference torch
models (read-only import from /root/reference): same input -> same output."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.train.ckpt import Checkpointer, merge_partial


def test_orbax_roundtrip(tmp_path):
    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "batch_stats": {"b": np.ones(4, np.float32)}}
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save_epoch(3, tree, is_best=True)
    assert ck.latest_epoch() == 3
    restored = ck.restore("checkpoint", target=tree)
    np.testing.assert_array_equal(restored["params"]["a"], tree["params"]["a"])
    best = ck.restore("best", target=tree)
    np.testing.assert_array_equal(best["batch_stats"]["b"], tree["batch_stats"]["b"])


def test_merge_partial_keeps_mismatches():
    target = {"a": np.zeros((2, 2)), "b": {"c": np.zeros(3), "d": np.zeros(4)}}
    restored = {"a": np.ones((2, 2)), "b": {"c": np.ones(5)}}  # c mismatched, d missing
    merged, skipped = merge_partial(target, restored)
    np.testing.assert_array_equal(merged["a"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["b"]["c"], np.zeros(3))
    np.testing.assert_array_equal(merged["b"]["d"], np.zeros(4))
    assert len(skipped) == 2


def test_unwrap_state_dict_fallbacks():
    """Key fallbacks model -> state_dict -> net_vp -> student_model -> raw
    (reference utils.py:56-68)."""
    from pose3d_tpu.train.torch_import import unwrap_state_dict

    sd = {"w": 1}
    assert unwrap_state_dict({"model": sd}) is sd
    assert unwrap_state_dict({"state_dict": sd}) is sd
    assert unwrap_state_dict({"net_vp": sd}) is sd
    assert unwrap_state_dict({"student_model": sd}) is sd
    assert unwrap_state_dict({"teacher_model": sd}) is sd
    assert unwrap_state_dict(sd) is sd
    # precedence: 'model' wins over others
    assert unwrap_state_dict({"model": sd, "state_dict": {"x": 2}}) is sd


# --------------------------------------------------------------------------
# torch import: build a torch reference model, save, import, compare outputs
# --------------------------------------------------------------------------
@pytest.fixture(scope="module")
def reference_models():
    sys.path.insert(0, "/root/reference")
    import torch  # noqa: F401
    from auxiliary.model import BaselineEstimator as TorchBaseline  # type: ignore
    from auxiliary.model import PoseEstimator as TorchPose  # type: ignore

    return TorchBaseline, TorchPose


@pytest.mark.slow
def test_torch_import_student_output_parity(tmp_path, reference_models):
    import torch

    TorchBaseline, _ = reference_models
    torch.manual_seed(0)
    tmodel = TorchBaseline(img_feature_dim=2048)
    tmodel.eval()
    path = str(tmp_path / "student.pth")
    torch.save({"state_dict": tmodel.state_dict()}, path)

    from pose3d_tpu.models import BaselineEstimator
    from pose3d_tpu.train.torch_import import load_torch_variables

    model = BaselineEstimator(img_feature_dim=2048)
    im = np.random.default_rng(0).standard_normal((2, 224, 224, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(im), train=False)
    variables = load_torch_variables(path, variables)

    outputs, proj = model.apply(variables, jnp.asarray(im), train=False)

    with torch.no_grad():
        t_out, t_proj = tmodel(
            torch.from_numpy(np.ascontiguousarray(im.transpose(0, 3, 1, 2))))

    for i in range(6):
        np.testing.assert_allclose(np.asarray(outputs[i]), t_out[i].numpy(),
                                   rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(proj), t_proj.numpy(), rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_torch_export_roundtrip_student(tmp_path, reference_models):
    """torch -> flax (import) -> torch (export): every tensor identical."""
    import torch

    TorchBaseline, _ = reference_models
    torch.manual_seed(1)
    tmodel = TorchBaseline(img_feature_dim=2048)
    path = str(tmp_path / "s.pth")
    torch.save({"state_dict": tmodel.state_dict()}, path)

    from pose3d_tpu.models import BaselineEstimator
    from pose3d_tpu.train.torch_import import load_torch_variables
    from pose3d_tpu.train.torch_export import export_baseline_estimator

    model = BaselineEstimator(img_feature_dim=2048)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)),
                           train=False)
    variables = load_torch_variables(path, variables)
    exported = export_baseline_estimator(variables)

    original = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    for key, val in original.items():
        if "num_batches_tracked" in key:
            continue
        assert key in exported, key
        np.testing.assert_allclose(exported[key], val, rtol=1e-6, atol=1e-7,
                                   err_msg=key)


@pytest.mark.slow
def test_torch_import_teacher_output_parity(tmp_path, reference_models):
    import torch

    _, TorchPose = reference_models
    torch.manual_seed(0)
    tmodel = TorchPose(shape="PointCloud", img_feature_dim=1024, shape_feature_dim=1024)
    tmodel.eval()
    path = str(tmp_path / "teacher.pth")
    torch.save({"model": tmodel.state_dict()}, path)

    from pose3d_tpu.models import PoseEstimator
    from pose3d_tpu.train.torch_import import load_torch_variables

    model = PoseEstimator(shape="PointCloud", img_feature_dim=1024,
                          shape_feature_dim=1024)
    rng = np.random.default_rng(1)
    im = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    pc = rng.random((2, 500, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(im), jnp.asarray(pc),
                           train=False)
    variables = load_torch_variables(path, variables)

    outputs, fused, proj = model.apply(variables, jnp.asarray(im), jnp.asarray(pc),
                                       train=False)

    with torch.no_grad():
        t_out, t_fused, t_proj = tmodel(
            torch.from_numpy(im.transpose(0, 3, 1, 2)),
            torch.from_numpy(pc.transpose(0, 2, 1)))

    np.testing.assert_allclose(np.asarray(fused), t_fused.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(proj), t_proj.numpy(), rtol=1e-3, atol=2e-3)
    for i in range(6):
        np.testing.assert_allclose(np.asarray(outputs[i]), t_out[i].numpy(),
                                   rtol=1e-3, atol=2e-3)
