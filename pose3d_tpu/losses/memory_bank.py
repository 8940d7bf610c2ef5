"""Optional contrast memory bank (extension — NOT in the reference).

Honest provenance note (SURVEY.md §5): the reference's `--crd` flag does NOT
implement a CRD ContrastMemory bank — all NCE negatives come from the current
batch (model_utils.py:273-285). The parity path in this framework is the
in-batch NCE (pose3d_tpu.losses.nce, global batch under GSPMD). This module
adds the natural extension: a MoCo-style FIFO queue of teacher features that
enlarges the negative pool beyond the batch, as a purely functional state
(jit/donate friendly, replicated across the data mesh — the enqueue uses the
all-gathered global batch so every replica holds the same queue).

Usage:
    bank = init_memory_bank(size=4096, dim=200)
    loss = info_nce_memory(student_feat, teacher_feat, bank, tau)
    bank = enqueue(bank, teacher_feat)   # after the step (stop-gradient side)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pose3d_tpu.losses.nce import _l2_normalize, _weighted_nce


class MemoryBank(NamedTuple):
    queue: jnp.ndarray  # (K, D), L2-normalized entries
    ptr: jnp.ndarray  # () int32, next write position
    filled: jnp.ndarray  # () int32, number of valid entries


def init_memory_bank(size: int, dim: int, dtype=jnp.float32) -> MemoryBank:
    return MemoryBank(
        queue=jnp.zeros((size, dim), dtype),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
    )


def enqueue(bank: MemoryBank, features: jnp.ndarray,
            valid: jnp.ndarray | None = None) -> MemoryBank:
    """FIFO insert of a (normalized) feature batch. Static batch size; a
    single scatter (`queue.at[idx].set`) with modular indices handles
    wraparound without data-dependent shapes (jit-safe).

    `valid` (bool (N,), optional) skips padded rows: invalid rows' write
    indices are redirected out of range and dropped (`mode="drop"`), valid
    rows are compacted to consecutive slots via a cumsum, and ptr/filled
    advance by the VALID count only — a padded DP batch (parallel/mesh.
    pad_batch) therefore enqueues exactly the features an unpadded run would,
    no duplicates."""
    feats = _l2_normalize(jax.lax.stop_gradient(features.astype(bank.queue.dtype)))
    k = bank.queue.shape[0]
    b = feats.shape[0]
    if valid is None:
        idx = (bank.ptr + jnp.arange(b, dtype=jnp.int32)) % k
        n_written = jnp.asarray(b, jnp.int32)
    else:
        v = valid.astype(jnp.int32)
        slot = jnp.cumsum(v) - 1  # position among valid rows
        idx = jnp.where(v > 0, (bank.ptr + slot) % k, k)  # k = OOB -> dropped
        n_written = jnp.sum(v)
    queue = bank.queue.at[idx].set(feats, mode="drop")
    return MemoryBank(
        queue=queue,
        ptr=(bank.ptr + n_written) % k,
        filled=jnp.minimum(bank.filled + n_written, k),
    )


def info_nce_memory(
    feat_student: jnp.ndarray,
    feat_teacher: jnp.ndarray,
    bank: MemoryBank,
    tau: float = 0.1,
    valid: jnp.ndarray | None = None,
    dropout_rng: jax.Array | None = None,
    dropout_rate: float = 0.3,
) -> jnp.ndarray:
    """infoNCE_KD semantics with the negative pool extended by the queue:
    denom_i = exp(pos_i) + sum_j exp(<s_i, t_j>/tau) + sum_q exp(<s_i, q>/tau)
    (unfilled queue slots are masked out). `valid` (bool (N,)) masks padded
    batch rows out of both the in-batch negative pool and the mean.

    `dropout_rng` applies the reference's key-side dropout (p=0.3 on the
    in-batch teacher/key features, model_utils.py:268) exactly as
    `info_nce_kd` does, so toggling the bank changes ONLY the extra queue
    negatives, not the dropout regime. Queue entries are stored and compared
    dropout-free (MoCo convention: the queue holds clean keys)."""
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    feat_teacher.shape)
        feat_teacher = jnp.where(keep, feat_teacher / (1.0 - dropout_rate), 0.0)
    s = _l2_normalize(feat_student)
    t = _l2_normalize(feat_teacher)
    pos = jnp.sum(s * t, axis=-1) / tau
    neg_batch = (s @ t.T) / tau
    if valid is not None:
        neg_batch = jnp.where(valid[None, :], neg_batch, -jnp.inf)
    neg_queue = (s @ bank.queue.T) / tau
    k = bank.queue.shape[0]
    filled = (jnp.arange(k) < bank.filled)[None, :]
    # mask invalid queue entries to -inf so their exp contribution is 0
    neg_queue = jnp.where(filled, neg_queue, -jnp.inf)
    neg = jnp.concatenate([neg_batch, neg_queue], axis=-1)
    return _weighted_nce(pos, neg, None, valid)
