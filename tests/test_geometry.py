"""Golden tests for geometry vs an independent torch-CPU oracle implementing
the reference formulas (auxiliary/utils.py:156-214), plus sanity properties."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from pose3d_tpu import geometry


# --------------------------------------------------------------------------
# Torch oracle: independent reimplementation of the reference math on CPU.
# --------------------------------------------------------------------------
def torch_angles_to_matrix(angles):
    azi, ele, rol = angles[:, 0], angles[:, 1], angles[:, 2]
    cos, sin = torch.cos, torch.sin
    elems = [
        cos(rol) * cos(azi) - sin(rol) * cos(ele) * sin(azi),
        sin(rol) * cos(azi) + cos(rol) * cos(ele) * sin(azi),
        sin(ele) * sin(azi),
        -cos(rol) * sin(azi) - sin(rol) * cos(ele) * cos(azi),
        -sin(rol) * sin(azi) + cos(rol) * cos(ele) * cos(azi),
        sin(ele) * cos(azi),
        sin(rol) * sin(ele),
        -cos(rol) * sin(ele),
        cos(ele),
    ]
    return torch.stack(elems, dim=1)


def torch_rotation_err(preds, targets):
    preds = preds.float().clone()
    targets = targets.float().clone()
    preds[:, 1] -= 180.0
    preds[:, 2] -= 180.0
    targets[:, 1] -= 180.0
    targets[:, 2] -= 180.0
    preds = preds * np.pi / 180.0
    targets = targets * np.pi / 180.0
    r_p = torch_angles_to_matrix(preds)
    r_g = torch_angles_to_matrix(targets)
    err = torch.acos((torch.sum(r_p * r_g, 1).clamp(-1.0, 3.0) - 1.0) / 2)
    return err * 180.0 / np.pi


def test_rotation_err_matches_torch_oracle(rng):
    preds = rng.integers(0, 360, size=(256, 3)).astype(np.float32)
    targets = rng.integers(0, 360, size=(256, 3)).astype(np.float32)
    ours = np.asarray(geometry.rotation_err(jnp.asarray(preds), jnp.asarray(targets)))
    oracle = torch_rotation_err(torch.from_numpy(preds), torch.from_numpy(targets)).numpy()
    # acos is ill-conditioned near +-1, so allow a small absolute slack (deg)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=0.05)


def test_rotation_err_zero_for_identical():
    labels = jnp.asarray([[10.0, 100.0, 200.0], [0.0, 0.0, 0.0]])
    err = geometry.rotation_err(labels, labels)
    # arccos near cos=1 is ill-conditioned: fp noise of 1e-7 in the trace
    # becomes ~0.04 deg of error, so the bound is loose by necessity
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=0.1)


def test_rotation_acc_matches_mean(rng):
    preds = rng.integers(0, 360, size=(128, 3)).astype(np.float32)
    targets = rng.integers(0, 360, size=(128, 3)).astype(np.float32)
    err = np.asarray(geometry.rotation_err(jnp.asarray(preds), jnp.asarray(targets)))
    acc = float(geometry.rotation_acc(jnp.asarray(preds), jnp.asarray(targets)))
    assert acc == pytest.approx(100.0 * np.mean(err <= 30.0), abs=1e-3)


def test_angle_err_wraparound():
    preds = jnp.asarray([[359.0, 0.0, 180.0]])
    targets = jnp.asarray([[1.0, 359.0, 181.0]])
    errs = np.asarray(geometry.angle_err(preds, targets))
    np.testing.assert_allclose(errs, [[2.0, 1.0, 1.0]], atol=1e-5)


def test_decode_predictions_train_decoder(rng):
    """(bin + tanh(delta)/2 + 0.5) * bin_size, delta gathered at argmax bin."""
    n = 16
    cls = [rng.standard_normal((n, k)).astype(np.float32) for k in (24, 12, 24)]
    reg = [rng.standard_normal((n, k)).astype(np.float32) for k in (24, 12, 24)]
    pred = np.asarray(
        geometry.decode_predictions(
            tuple(jnp.asarray(c) for c in cls), tuple(jnp.asarray(r) for r in reg)
        )
    )
    for i, (c, r) in enumerate(zip(cls, reg)):
        bins = np.argmax(c, axis=-1)
        delta = np.tanh(r[np.arange(n), bins]) / 2.0
        expect = (bins.astype(np.float32) + delta + 0.5) * 15.0
        np.testing.assert_allclose(pred[:, i], expect, rtol=1e-5)


def test_decode_predictions_inference_decoder(rng):
    """compute_vp_pred parity: (bin + raw delta) * bin_size, clamp [0, 360]."""
    n = 16
    cls = [rng.standard_normal((n, k)).astype(np.float32) for k in (24, 12, 24)]
    reg = [(3 * rng.standard_normal((n, k))).astype(np.float32) for k in (24, 12, 24)]
    pred = np.asarray(
        geometry.decode_predictions_inference(
            tuple(jnp.asarray(c) for c in cls), tuple(jnp.asarray(r) for r in reg)
        )
    )
    for i, (c, r) in enumerate(zip(cls, reg)):
        bins = np.argmax(c, axis=-1)
        delta = r[np.arange(n), bins]
        expect = np.clip((bins.astype(np.float32) + delta) * 15.0, 0.0, 360.0)
        np.testing.assert_allclose(pred[:, i], expect, rtol=1e-5)
    assert pred.min() >= 0.0 and pred.max() <= 360.0
