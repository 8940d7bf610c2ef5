"""Knowledge-distillation losses.

Parity with /root/reference/KD/vision/vanilla/vanilla_kd.py:
  * ``temperature_scaled_kl`` — T^2 * KL(softmax(t/T) || softmax(s/T)) with
    PyTorch `reduction="batchmean"` semantics (vanilla_kd.py:8-32).
  * ``kd_loss``               — 0.25*gt + 0.75*sum_6 KL (vanilla_kd.py:111-140).
  * ``kd_loss_with_features`` — the `--crd` loss: 0.25*gt + 0.75*sum_6 KL +
    0.75*KL(student_feat || teacher_feat); the 200-d projector features are
    deliberately treated as logits and softmaxed, exactly like the reference
    (vanilla_kd.py:143-164).
  * ``gaussian_vid_loss`` / ``vid_loss`` — variational information
    distillation variant (vanilla_kd.py:35-49, 167-195).

Teacher logits/features must be `stop_gradient`-ed by the caller when only
the student is trained; see pose3d_tpu.train.steps (the reference lets
teacher grads flow then ignores them, base_class.py:363 — same update, more
FLOPs; we don't copy that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def temperature_scaled_kl(
    student_logits: jnp.ndarray, teacher_logits: jnp.ndarray, temperature: float = 1.0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """T^2 * batchmean KL(q || p), q=softmax(teacher/T), p=softmax(student/T).
    `valid` (bool (N,)) masks padded batch rows out of the batchmean."""
    log_p = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    log_q = jax.nn.log_softmax(teacher_logits / temperature, axis=-1)
    q = jnp.exp(log_q)
    kl_per_sample = jnp.sum(q * (log_q - log_p), axis=-1)
    if valid is None:
        return (temperature**2) * jnp.mean(kl_per_sample)
    v = valid.astype(kl_per_sample.dtype)
    return (temperature**2) * (jnp.sum(kl_per_sample * v)
                               / jnp.maximum(jnp.sum(v), 1.0))


def gaussian_vid_loss(
    pred_mean: jnp.ndarray, pred_var: jnp.ndarray, target: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """VID Gaussian loss: mean(0.5 * ((mu - y)^2 / var + log var)).
    `valid` (bool (N,)) masks padded batch rows out of the mean."""
    per = 0.5 * ((pred_mean - target) ** 2 / pred_var + jnp.log(pred_var))
    if valid is None:
        return jnp.mean(per)
    per_row = jnp.mean(per, axis=tuple(range(1, per.ndim)))
    v = valid.astype(per_row.dtype)
    return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)


def kd_loss(
    student_outputs: list[jnp.ndarray],
    teacher_outputs: list[jnp.ndarray],
    gt_loss: jnp.ndarray,
    temperature: float = 1.0,
    gt_weight: float = 0.25,
    kl_weight: float = 0.75,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """0.25 * gt + 0.75 * sum over the 6 heads of temperature-scaled KL."""
    kl = jnp.asarray(0.0, dtype=jnp.float32)
    for s, t in zip(student_outputs, teacher_outputs):
        kl = kl + temperature_scaled_kl(s, t, temperature, valid)
    return gt_weight * gt_loss + kl_weight * kl


def kd_loss_with_features(
    student_outputs: list[jnp.ndarray],
    teacher_outputs: list[jnp.ndarray],
    student_features: jnp.ndarray,
    teacher_features: jnp.ndarray,
    gt_loss: jnp.ndarray,
    temperature: float = 1.0,
    gt_weight: float = 0.25,
    kl_weight: float = 0.75,
    feature_weight: float = 0.75,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """`calculate_kd_loss_new` (vanilla_kd.py:143-164) — the `--crd` path."""
    kl = jnp.asarray(0.0, dtype=jnp.float32)
    for s, t in zip(student_outputs, teacher_outputs):
        kl = kl + temperature_scaled_kl(s, t, temperature, valid)
    feat_kl = temperature_scaled_kl(student_features, teacher_features, temperature,
                                    valid)
    return gt_weight * gt_loss + kl_weight * kl + feature_weight * feat_kl


def vid_loss(
    student_outputs: list[jnp.ndarray],
    teacher_outputs: list[jnp.ndarray],
    student_loss: jnp.ndarray,
    student_features: jnp.ndarray,
    teacher_features: jnp.ndarray,
    pred_var: jnp.ndarray | None = None,
    temperature: float = 1.0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """0.6*CE + 0.2*meanKL + 0.2*VID (vanilla_kd.py:167-195).

    Dormant in the reference (calculate_vid_loss has no caller); wired here
    as the opt-in `--vid` KD loss (cli/trainingKD.py -> steps.make_kd_crd_step
    loss_variant='vid'). `valid` masks padded batch rows everywhere."""
    ce_weight, kl_weight, vid_weight = 0.6, 0.2, 0.2
    kl = jnp.asarray(0.0, dtype=jnp.float32)
    for s, t in zip(student_outputs, teacher_outputs):
        kl = kl + temperature_scaled_kl(s, t, temperature, valid) / 6.0
    if pred_var is None:
        pred_var = jnp.ones_like(student_features)
    vid = gaussian_vid_loss(student_features, pred_var, teacher_features,
                            valid=valid)
    return ce_weight * student_loss + kl_weight * kl + vid_weight * vid
