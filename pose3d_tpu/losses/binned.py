"""Binned viewpoint losses: per-angle bin cross-entropy + in-bin delta Huber.

Parity with /root/reference/auxiliary/loss.py:
  * ``cross_entropy_bin_loss`` — CE on bin labels target // (range // n_classes)
    (loss.py:7-20).
  * ``delta_loss`` — Huber(5 * tanh(pred_at_gt_bin)/2, 5 * ((target % bin)/bin - 0.5))
    with PyTorch SmoothL1Loss default beta=1 semantics (loss.py:23-44).
  * ``pose_loss`` — the 4-term sum used by every train/val loop:
    CE(azi) + CE(ele) + CE(inp) + delta (training.py:50-54).

All functions take integer-degree labels (the canonicalized triple) and are
pure jnp, differentiable, jit/shard_map friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """PyTorch nn.SmoothL1Loss (mean reduction): 0.5 x^2 / beta if |x| < beta else |x| - 0.5 beta."""
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return jnp.mean(loss)


def cross_entropy_bin_loss(
    logits: jnp.ndarray, target_deg: jnp.ndarray, angle_range: int
) -> jnp.ndarray:
    """Softmax CE where the class label is the angle's bin index.

    bin_size = angle_range // n_classes; label = target_deg // bin_size.
    Matches auxiliary/loss.py:7-10 (integer floor division on int labels).
    """
    n_classes = logits.shape[-1]
    bin_size = angle_range // n_classes
    labels = (target_deg.astype(jnp.int32) // bin_size).astype(jnp.int32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def delta_loss(
    reg_azi: jnp.ndarray,
    reg_ele: jnp.ndarray,
    reg_inp: jnp.ndarray,
    target_deg: jnp.ndarray,
    bin_size: int = 15,
) -> jnp.ndarray:
    """In-bin offset regression loss (auxiliary/loss.py:23-34).

    target_delta = (target % bin)/bin - 0.5 in [-0.5, 0.5);
    pred_delta   = tanh(reg[gt_bin]) / 2;
    loss = SmoothL1(5 * pred_delta, 5 * target_delta).
    """
    target = target_deg.astype(jnp.float32)
    target_delta = (jnp.mod(target, bin_size) / bin_size) - 0.5
    gt_bin = (target_deg.astype(jnp.int32) // bin_size).astype(jnp.int32)

    deltas = []
    for i, reg in enumerate((reg_azi, reg_ele, reg_inp)):
        d = jnp.take_along_axis(reg, gt_bin[:, i][:, None], axis=-1)[:, 0]
        deltas.append(jnp.tanh(d) / 2.0)
    pred_delta = jnp.stack(deltas, axis=-1)
    return smooth_l1(5.0 * pred_delta, 5.0 * target_delta)


def neg_dot_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """negDotLoss parity (auxiliary/model_utils.py:145-155): mean(-<gt, pred>)
    over per-sample 2-vectors (trig-encoding variant, kept for API parity)."""
    return jnp.mean(-jnp.sum(gt.astype(jnp.float32) * pred.astype(jnp.float32),
                             axis=-1))


def classification_accuracy(outputs: list[jnp.ndarray], targets: jnp.ndarray) -> list:
    """Per-angle top-1 bin accuracy in percent (auxiliary/utils.py:108-115)."""
    accs = []
    for n, logits in enumerate(outputs):
        pred = jnp.argmax(logits, axis=-1)
        accs.append(100.0 * jnp.mean((pred == targets[:, n]).astype(jnp.float32)))
    return accs


def label_smoothing_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, smoothing: float = 0.0
) -> jnp.ndarray:
    """LabelSmoothingLoss parity (auxiliary/model_utils.py:70-85): smoothed
    one-hot target with confidence 1-smoothing, off-target mass
    smoothing/(C-1), mean over batch of sum(-target * log_softmax)."""
    n_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    off = smoothing / (n_classes - 1)
    one_hot = jax.nn.one_hot(labels, n_classes, dtype=log_probs.dtype)
    target = one_hot * (1.0 - smoothing - off) + off
    return jnp.mean(jnp.sum(-target * log_probs, axis=-1))


def smooth_cross_entropy_bin_loss(
    logits: jnp.ndarray, target_deg: jnp.ndarray, angle_range: int,
    smoothing: float = 0.0,
) -> jnp.ndarray:
    """SmoothCELoss parity (auxiliary/model_utils.py:88-98): bin the target
    angle then apply the label-smoothing CE."""
    n_classes = logits.shape[-1]
    bin_size = angle_range // n_classes
    labels = (target_deg.astype(jnp.int32) // bin_size).astype(jnp.int32)
    return label_smoothing_loss(logits, labels, smoothing)


def masked_mean(per_sample: jnp.ndarray, valid: jnp.ndarray | None) -> jnp.ndarray:
    """Mean over valid rows only; with valid=None, a plain mean. Padded rows
    (parallel/mesh.pad_batch) contribute exactly zero to loss and grads."""
    if valid is None:
        return jnp.mean(per_sample)
    v = valid.astype(per_sample.dtype)
    return jnp.sum(per_sample * v) / jnp.maximum(jnp.sum(v), 1.0)


def pose_loss(
    outputs: list[jnp.ndarray],
    target_deg: jnp.ndarray,
    bin_size: int = 15,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """4-term viewpoint loss over the 6-head output list
    [cls_azi, cls_ele, cls_inp, reg_azi, reg_ele, reg_inp]
    (training.py:50-54, base_class.py:141-145). `valid` (bool (N,)) masks
    padded batch rows out of the mean."""
    if valid is not None:
        return masked_mean(pose_loss_per_sample(outputs, target_deg, bin_size), valid)
    loss_azi = cross_entropy_bin_loss(outputs[0], target_deg[:, 0], 360)
    loss_ele = cross_entropy_bin_loss(outputs[1], target_deg[:, 1], 180)
    loss_inp = cross_entropy_bin_loss(outputs[2], target_deg[:, 2], 360)
    loss_reg = delta_loss(outputs[3], outputs[4], outputs[5], target_deg, bin_size)
    return loss_azi + loss_ele + loss_inp + loss_reg


def pose_loss_per_sample(
    outputs: list[jnp.ndarray],
    target_deg: jnp.ndarray,
    bin_size: int = 15,
) -> jnp.ndarray:
    """Per-sample decomposition of `pose_loss` (mean over it == pose_loss):
    used by the evaluator to mask padded tail-batch rows exactly."""
    per = jnp.zeros(target_deg.shape[0], jnp.float32)
    for i, angle_range in ((0, 360), (1, 180), (2, 360)):
        logits = outputs[i]
        n_classes = logits.shape[-1]
        bsz = angle_range // n_classes
        labels = (target_deg[:, i].astype(jnp.int32) // bsz).astype(jnp.int32)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        per = per - jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]

    target = target_deg.astype(jnp.float32)
    target_delta = (jnp.mod(target, bin_size) / bin_size) - 0.5
    gt_bin = (target_deg.astype(jnp.int32) // bin_size).astype(jnp.int32)
    deltas = []
    for i, reg in enumerate(outputs[3:6]):
        d = jnp.take_along_axis(reg, gt_bin[:, i][:, None], axis=-1)[:, 0]
        deltas.append(jnp.tanh(d) / 2.0)
    pred_delta = jnp.stack(deltas, axis=-1)
    diff = jnp.abs(5.0 * pred_delta - 5.0 * target_delta)
    huber = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    return per + jnp.mean(huber, axis=-1)
