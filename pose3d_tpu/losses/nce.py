"""Contrastive (NCE) loss family, vectorized + numerically stable.

Parity with /root/reference/auxiliary/model_utils.py:169-351:
  * ``info_nce``            — in-batch infoNCE with eye-masked logits (169-184)
  * ``pose_nce``            — negatives weighted by pairwise geodesic pose
                              distance, negatives from feat_ori (187-223)
  * ``pose_nce_kd``         — same but negatives from feat_pos (225-261)
  * ``info_nce_kd``         — THE loss used by the main recipes: dropout p=0.3
                              on teacher features, L2 normalize, in-batch
                              softmax over [pos | all teacher feats] (263-285)
  * ``single_info_nce_kd``  — positive-only (288-303)
  * ``multi_pose_nce_kd``   — multi-positive with 30 deg threshold; the
                              reference builds the mask with an O(b^2) Python
                              loop (322-335) — here it is a vectorized mask.

All exp/log forms are computed via max-subtraction (log-sum-exp) — these are
algebraically identical to the reference's raw exp ratios but do not overflow
in bf16/fp32 on TPU.

Under jit + GSPMD with a batch-sharded input, the (N, N) Gram matrices below
compile to an all-gather of the 200-d features over the data axis followed by
a local matmul — i.e. in-batch NCE automatically sees the *global* batch,
which is the behavioral superset required by SURVEY.md §2c.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pose3d_tpu.geometry import rotation_err


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(dim=-1) parity: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _pairwise_pose_distance(labels_deg: jnp.ndarray, weighting: str) -> jnp.ndarray:
    """(N, N) geodesic distance between all label pairs, rescaled per the
    reference's weighting schemes (model_utils.py:201-211)."""
    n = labels_deg.shape[0]
    a = jnp.broadcast_to(labels_deg[:, None, :], (n, n, 3)).reshape(-1, 3)
    b = jnp.broadcast_to(labels_deg[None, :, :], (n, n, 3)).reshape(-1, 3)
    dist = rotation_err(a, b).reshape(n, n)
    if weighting == "linear":
        return dist / 180.0
    if weighting == "square":
        return (dist / 180.0) ** 2
    if weighting == "sqrt":
        return jnp.sqrt(dist / 180.0)
    if weighting == "sin":
        return jnp.abs(jnp.sin(dist / 180.0 * jnp.pi))
    if weighting == "sinsin":
        return jnp.sin(dist / 180.0 * jnp.pi) ** 2
    raise ValueError(f"unknown weighting: {weighting}")


def _weighted_nce(
    pos_logit: jnp.ndarray, neg_logits: jnp.ndarray, neg_weights: jnp.ndarray | None,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """loss_i = -log( exp(pos_i) / (exp(pos_i) + sum_j w_ij exp(neg_ij)) ),
    computed stably. `pos_logit` (N,), `neg_logits` (N, M). `valid` (bool (N,))
    masks padded rows out of the mean (the caller masks padded COLUMNS out of
    neg_logits/neg_weights itself, since M may exceed N, e.g. memory banks)."""
    all_logits = jnp.concatenate([pos_logit[:, None], neg_logits], axis=-1)
    m = jax.lax.stop_gradient(jnp.max(all_logits, axis=-1, keepdims=True))
    exp_pos = jnp.exp(pos_logit[:, None] - m)[:, 0]
    exp_neg = jnp.exp(neg_logits - m)
    if neg_weights is not None:
        exp_neg = exp_neg * neg_weights
    denom = exp_pos + jnp.sum(exp_neg, axis=-1)
    loss = -(jnp.log(exp_pos) - jnp.log(denom))
    if valid is None:
        return jnp.mean(loss)
    v = valid.astype(loss.dtype)
    return jnp.sum(loss * v) / jnp.maximum(jnp.sum(v), 1.0)


def info_nce(feat_ori: jnp.ndarray, feat_pos: jnp.ndarray, tau: float = 0.1) -> jnp.ndarray:
    """In-batch infoNCE with diagonal replaced by the positive inner product
    (model_utils.py:169-184): CE over rows of the eye-masked Gram matrix."""
    feat_ori = _l2_normalize(feat_ori)
    feat_pos = _l2_normalize(feat_pos)
    n = feat_ori.shape[0]
    l_pos = jnp.sum(feat_ori * feat_pos, axis=-1)
    l_neg = feat_ori @ feat_ori.T
    eye = jnp.eye(n, dtype=l_neg.dtype)
    logits = ((1.0 - eye) * l_neg + eye * l_pos[:, None]) / tau
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(log_probs))


def pose_nce(
    feat_ori: jnp.ndarray,
    feat_pos: jnp.ndarray,
    labels_deg: jnp.ndarray,
    tau: float = 0.1,
    weighting: str = "linear",
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pose-distance-weighted NCE, negatives from feat_ori (model_utils.py:187-223).
    `valid` (bool (N,)) masks padded rows out of the negative pool (their
    weight is zeroed) and the mean — the padded-DP-batch contract of
    info_nce_kd(valid=...)."""
    feat_ori = _l2_normalize(feat_ori)
    feat_pos = _l2_normalize(feat_pos)
    dist = _pairwise_pose_distance(labels_deg, weighting)
    if valid is not None:
        dist = dist * valid[None, :].astype(dist.dtype)
    pos = jnp.sum(feat_ori * feat_pos, axis=-1) / tau
    neg = (feat_ori @ feat_ori.T) / tau
    return _weighted_nce(pos, neg, dist, valid)


def pose_nce_kd(
    feat_ori: jnp.ndarray,
    feat_pos: jnp.ndarray,
    labels_deg: jnp.ndarray,
    tau: float = 0.1,
    weighting: str = "linear",
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pose-distance-weighted NCE, negatives from feat_pos (model_utils.py:225-261).
    `valid`: see pose_nce."""
    feat_ori = _l2_normalize(feat_ori)
    feat_pos = _l2_normalize(feat_pos)
    dist = _pairwise_pose_distance(labels_deg, weighting)
    if valid is not None:
        dist = dist * valid[None, :].astype(dist.dtype)
    pos = jnp.sum(feat_ori * feat_pos, axis=-1) / tau
    neg = (feat_ori @ feat_pos.T) / tau
    return _weighted_nce(pos, neg, dist, valid)


def info_nce_kd_per_sample(
    feat_ori: jnp.ndarray,
    feat_pos: jnp.ndarray,
    tau: float = 0.1,
    dropout_rng: jax.Array | None = None,
    dropout_rate: float = 0.3,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-sample info_nce_kd losses (N,), exactly the reference's row terms
    before its batch mean (model_utils.py:263-285).

    `valid` (bool, (N,)) masks PADDED rows out of the negative pool: a padded
    duplicate row must not appear as a key/negative in any real row's
    denominator (ragged val tails are padded by the loader — the caller also
    drops padded rows from the returned vector before reducing). With
    valid=None this is the dense in-batch loss.
    """
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, feat_pos.shape)
        feat_pos = jnp.where(keep, feat_pos / (1.0 - dropout_rate), 0.0)
    feat_ori = _l2_normalize(feat_ori)
    feat_pos = _l2_normalize(feat_pos)
    pos = jnp.sum(feat_ori * feat_pos, axis=-1) / tau
    neg = (feat_ori @ feat_pos.T) / tau
    all_logits = jnp.concatenate([pos[:, None], neg], axis=-1)
    m = jax.lax.stop_gradient(jnp.max(all_logits, axis=-1, keepdims=True))
    exp_pos = jnp.exp(pos[:, None] - m)[:, 0]
    exp_neg = jnp.exp(neg - m)
    if valid is not None:
        exp_neg = exp_neg * valid[None, :].astype(exp_neg.dtype)
    denom = exp_pos + jnp.sum(exp_neg, axis=-1)
    return -(jnp.log(exp_pos) - jnp.log(denom))


def info_nce_kd(
    feat_ori: jnp.ndarray,
    feat_pos: jnp.ndarray,
    tau: float = 0.1,
    dropout_rng: jax.Array | None = None,
    dropout_rate: float = 0.3,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The contrastive loss actually used by the main recipes
    (model_utils.py:263-285).

    Student/query features `feat_ori`, teacher/key features `feat_pos`.
    Teacher features get dropout p=0.3 with `training=True` unconditionally in
    the reference (model_utils.py:268) — pass `dropout_rng` to reproduce; pass
    None for the deterministic expectation (useful in tests/eval).
    `valid` masks padded rows out of both the negative pool and the mean.
    """
    per = info_nce_kd_per_sample(feat_ori, feat_pos, tau, dropout_rng,
                                 dropout_rate, valid)
    if valid is None:
        return jnp.mean(per)
    v = valid.astype(per.dtype)
    return jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)


def single_info_nce_kd(
    feat_ori: jnp.ndarray, feat_pos: jnp.ndarray, tau: float = 0.1
) -> jnp.ndarray:
    """Positive-only variant (model_utils.py:288-303): -mean(<s_i, t_i>/tau)."""
    feat_ori = _l2_normalize(feat_ori)
    feat_pos = _l2_normalize(feat_pos)
    pos = jnp.sum(feat_ori * feat_pos, axis=-1) / tau
    return jnp.mean(-pos)


def multi_pose_nce_kd(
    feat_ori: jnp.ndarray,
    feat_pos: jnp.ndarray,
    labels_deg: jnp.ndarray,
    tau: float = 0.1,
    threshold: float = 30.0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Multi-positive NCE: every sample whose pose is within `threshold`
    degrees counts as a positive (model_utils.py:306-351). The reference's
    O(b^2) Python double loop building the mask is replaced by a vectorized
    comparison — same mask, one fused VPU op. `valid` (bool (N,)) masks
    padded rows out of positives, negatives and the mean."""
    feat_ori = _l2_normalize(feat_ori)
    feat_pos = _l2_normalize(feat_pos)
    n = feat_ori.shape[0]
    dist = _pairwise_pose_distance_raw(labels_deg)
    mask = jnp.logical_or(dist <= threshold, jnp.eye(n, dtype=bool)).astype(feat_ori.dtype)

    logits = (feat_ori @ feat_pos.T) / tau
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    exp_logits = jnp.exp(logits - m)
    if valid is not None:
        exp_logits = exp_logits * valid[None, :].astype(exp_logits.dtype)
    l_pos = jnp.sum(exp_logits * mask, axis=-1)
    if valid is not None:
        # an INVALID row's own diagonal is masked -> l_pos would be 0 and
        # log(0) * 0-weight = NaN; clamp (valid rows always exceed this)
        l_pos = jnp.maximum(l_pos, 1e-30)
    denom = l_pos + jnp.sum(exp_logits, axis=-1)
    per_row = -(jnp.log(l_pos) - jnp.log(denom))
    if valid is None:
        return jnp.mean(per_row)
    v = valid.astype(per_row.dtype)
    return jnp.sum(per_row * v) / jnp.maximum(jnp.sum(v), 1.0)


def _pairwise_pose_distance_raw(labels_deg: jnp.ndarray) -> jnp.ndarray:
    n = labels_deg.shape[0]
    a = jnp.broadcast_to(labels_deg[:, None, :], (n, n, 3)).reshape(-1, 3)
    b = jnp.broadcast_to(labels_deg[None, :, :], (n, n, 3)).reshape(-1, 3)
    return rotation_err(a, b).reshape(n, n)
