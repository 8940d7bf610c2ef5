"""Rotation geometry and viewpoint metrics (pure jnp, jit-friendly).

Behavioral parity with the reference implementation
(/root/reference/auxiliary/utils.py:156-214):

  * ``angles_to_matrix``   — R = Rz(inp) @ Rx(ele - pi/2) @ Rz(-azi), emitted as
    9 explicit elements (utils.py:156-176).
  * ``rotation_err``       — geodesic angle between two viewpoint label triples
    in degrees, including the reference's ``clamp(-1., 3.)`` quirk applied to
    trace(R_p^T R_g) *before* subtracting 1 (utils.py:200).
  * ``rotation_acc``       — 100 * mean(err <= threshold) (utils.py:205-207).
  * ``angle_err``          — per-angle wraparound error (utils.py:210-214).

Viewpoint label convention (canonicalized, see auxiliary/dataset.py:271-273):
  label = (azimuth in [0,360), elevation + 90 in [0,180), inplane + 180 in [0,360))
All functions take degrees and are fully vectorized: inputs of shape (..., 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEG2RAD = jnp.pi / 180.0


def angles_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Euler viewpoint angles (radians, (..., 3)) -> flattened rotation (..., 9).

    R = Rz(inp) @ Rx(ele - pi/2) @ Rz(-azi); element layout matches the
    reference (row-major 3x3 flattened), auxiliary/utils.py:164-176.
    """
    azi = angles[..., 0]
    ele = angles[..., 1]
    rol = angles[..., 2]
    sin, cos = jnp.sin, jnp.cos
    e1 = cos(rol) * cos(azi) - sin(rol) * cos(ele) * sin(azi)
    e2 = sin(rol) * cos(azi) + cos(rol) * cos(ele) * sin(azi)
    e3 = sin(ele) * sin(azi)
    e4 = -cos(rol) * sin(azi) - sin(rol) * cos(ele) * cos(azi)
    e5 = -sin(rol) * sin(azi) + cos(rol) * cos(ele) * cos(azi)
    e6 = sin(ele) * cos(azi)
    e7 = sin(rol) * sin(ele)
    e8 = -cos(rol) * sin(ele)
    e9 = cos(ele)
    return jnp.stack([e1, e2, e3, e4, e5, e6, e7, e8, e9], axis=-1)


def _to_matrix_from_labels(labels_deg: jnp.ndarray) -> jnp.ndarray:
    """Canonical label triple (degrees) -> flattened rotation matrix (..., 9).

    Reproduces the reference's pre-processing: elevation and inplane are
    shifted by -180 degrees before conversion (utils.py:184-189). Note the
    reference shifts elevation by 180 even though labels encode ele+90; this
    asymmetric offset is intentional parity.
    """
    labels = labels_deg.astype(jnp.float32)
    shifted = jnp.stack(
        [labels[..., 0], labels[..., 1] - 180.0, labels[..., 2] - 180.0], axis=-1
    )
    return angles_to_matrix(shifted * DEG2RAD)


def rotation_err(preds_deg: jnp.ndarray, targets_deg: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees between label triples (..., 3) -> (...,).

    Parity includes the reference's `.clamp(-1., 3.)` applied to
    trace(R_p^T R_g) before the (x - 1) / 2 (utils.py:200).
    """
    r_pred = _to_matrix_from_labels(preds_deg)
    r_gt = _to_matrix_from_labels(targets_deg)
    trace = jnp.sum(r_pred * r_gt, axis=-1)
    cos_angle = (jnp.clip(trace, -1.0, 3.0) - 1.0) / 2.0
    return jnp.arccos(cos_angle) * (180.0 / jnp.pi)


def rotation_acc(
    preds_deg: jnp.ndarray, targets_deg: jnp.ndarray, threshold: float = 30.0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Acc@pi/6 (by default): 100 * mean(geodesic err <= threshold).
    `valid` (bool (N,)) masks padded batch rows out of the mean."""
    err = rotation_err(preds_deg, targets_deg)
    hit = (err <= threshold).astype(jnp.float32)
    if valid is None:
        return 100.0 * jnp.mean(hit)
    v = valid.astype(jnp.float32)
    return 100.0 * jnp.sum(hit * v) / jnp.maximum(jnp.sum(v), 1.0)


def angle_err(preds_deg: jnp.ndarray, targets_deg: jnp.ndarray) -> jnp.ndarray:
    """Per-angle wraparound error: min(|p - t|, 360 - |p - t|)."""
    errs = jnp.abs(preds_deg - targets_deg)
    return jnp.minimum(errs, 360.0 - errs)


def decode_predictions(
    cls_logits: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    reg_outputs: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    bin_size: float = 15.0,
) -> jnp.ndarray:
    """Train/val-time decoder: (bin + tanh(delta)/2 + 0.5) * bin_size.

    Matches evaluation.py:42-47 / base_class.py:390-395: the predicted bin is
    the argmax of the classification logits, the delta is the regression
    output *at that bin* squashed by tanh()/2.
    Returns (N, 3) angle predictions in degrees.
    """
    preds = []
    for logits, reg in zip(cls_logits, reg_outputs):
        bins = jnp.argmax(logits, axis=-1)
        delta = jnp.take_along_axis(reg, bins[:, None], axis=-1)[:, 0]
        delta = jnp.tanh(delta) / 2.0
        preds.append((bins.astype(jnp.float32) + delta + 0.5) * bin_size)
    return jnp.stack(preds, axis=-1)


def decode_predictions_inference(
    cls_logits: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    reg_outputs: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    bin_size: float = 15.0,
    return_scores: bool = False,
):
    """Inference-time decoder, parity with BaselineEstimator.compute_vp_pred
    (auxiliary/model.py:73-97): (bin + raw_delta) * bin_size, clamped to
    [0, 360]. NOTE this intentionally differs from `decode_predictions` — the
    reference uses two different decoders in training/eval vs inference.
    """
    preds = []
    scores = []
    for logits, reg in zip(cls_logits, reg_outputs):
        bins = jnp.argmax(logits, axis=-1)
        delta = jnp.take_along_axis(reg, bins[:, None], axis=-1)[:, 0]
        preds.append((bins.astype(jnp.float32) + delta) * bin_size)
        if return_scores:
            probs = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
            scores.append(probs)
    vp = jnp.clip(jnp.stack(preds, axis=-1), 0.0, 360.0)
    if return_scores:
        return vp, jnp.stack(scores, axis=-1)
    return vp
