"""Fused infoNCE-KD loss as Pallas TPU kernels with an analytic custom VJP.

Semantics: `pose3d_tpu.losses.nce.info_nce_kd` WITHOUT the dropout (apply
dropout to the teacher features before calling, exactly like the XLA path
does internally):

    s_n = s / |s|,  t_n = t / |t|          (L2 rows)
    z_ij = <s_n_i, t_n_j> / tau            (N, N) similarity logits
    pos_i = z_ii
    denom_i = exp(pos_i) + sum_j exp(z_ij)   # reference double-counts the
                                             # positive (model_utils.py:277-285)
    L = mean_i ( -pos_i + log denom_i )

Analytic backward (derived, gradient-checked against jax.grad of the XLA
implementation in tests/test_ops.py):

    q_ij     = exp(z_ij) / denom_i
    q_pos_i  = exp(pos_i) / denom_i
    dL/dz_ij = (q_ij + delta_ij * (q_pos_i - 1)) / N
    dL/ds_n  = (dL/dz) @ t_n / tau ;  dL/dt_n = (dL/dz)^T @ s_n / tau
    through normalization: ds = (g - (g . s_n) s_n) / |s|

Why a kernel: under wide data-parallel meshes the all-gathered feature matrix
makes z big; the kernel keeps z entirely in VMEM for both passes (fwd saves
only the row norms and denominators, N floats — z is recomputed in bwd, a
FLOPs-for-HBM trade that wins for N x N matrices).

ROUND-2 DISPOSITION (VERDICT r1 item #9): XLA stays the production default.
On-chip timing showed XLA ahead at every batch the workloads reach
(b=138-1024, docs/PERF.md), and the single-block kernel VMEM-OOMs at b~2048.

ROUND-3/4 UPDATE: the blocked-Gram rewrite this docstring deferred now
exists (ops/nce_blocked.py — online-LSE fwd, two-pass analytic bwd, valid
masking) and handles the >1024-row regime this kernel cannot; under
`use_fused_nce` the shared selector (train/steps.route_info_nce) dispatches
single-block here for narrow unmasked batches and blocked above — on-chip
A/B numbers in docs/PERF.md round 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _normalize(x, eps=1e-12):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps), jnp.maximum(norm, eps)


def _eye(n):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(jnp.float32)


def _fwd_kernel(s_ref, t_ref, tau_ref, loss_ref, denom_ref, m_ref):
    # all row-wise quantities kept as (N, 1) column vectors: Mosaic vector
    # lanes want >= 2-D shapes
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = jnp.dot(s, t.T, preferred_element_type=jnp.float32) / tau  # (N, N)
    pos = jnp.sum(z * _eye(z.shape[0]), axis=-1, keepdims=True)  # (N, 1)
    m = jnp.maximum(jnp.max(z, axis=-1, keepdims=True), pos)  # (N, 1)
    exp_z = jnp.exp(z - m)
    exp_pos = jnp.exp(pos - m)
    denom = exp_pos + jnp.sum(exp_z, axis=-1, keepdims=True)  # (N, 1)
    per_row = -(pos - m) + jnp.log(denom)  # (N, 1)
    loss_ref[0, 0] = jnp.sum(per_row) / per_row.shape[0]
    denom_ref[:] = denom
    m_ref[:] = m


def _bwd_kernel(s_ref, t_ref, tau_ref, denom_ref, m_ref, g_ref, ds_ref, dt_ref):
    tau = tau_ref[0, 0]
    g = g_ref[0, 0]
    s, s_norm = _normalize(s_ref[:].astype(jnp.float32))
    t, t_norm = _normalize(t_ref[:].astype(jnp.float32))
    n = s.shape[0]
    z = jnp.dot(s, t.T, preferred_element_type=jnp.float32) / tau
    denom = denom_ref[:]  # (N, 1)
    m = m_ref[:]  # (N, 1)
    q = jnp.exp(z - m) / denom  # (N, N)
    eye = _eye(n)
    pos = jnp.sum(z * eye, axis=-1, keepdims=True)  # (N, 1)
    q_pos = jnp.exp(pos - m) / denom  # (N, 1)
    # dL/dz scaled by upstream cotangent g
    dz = (q + eye * (q_pos - 1.0)) * (g / n)
    ds_n = jnp.dot(dz, t, preferred_element_type=jnp.float32) / tau
    dt_n = jnp.dot(dz.T, s, preferred_element_type=jnp.float32) / tau
    # back through row normalization
    ds = (ds_n - jnp.sum(ds_n * s, axis=-1, keepdims=True) * s) / s_norm
    dt = (dt_n - jnp.sum(dt_n * t, axis=-1, keepdims=True) * t) / t_norm
    ds_ref[:] = ds.astype(ds_ref.dtype)
    dt_ref[:] = dt.astype(dt_ref.dtype)


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.devices()[0].platform != "tpu"
    return interpret


def _fwd_call(s, t, tau, interpret):
    interpret = _resolve_interpret(interpret)
    n = s.shape[0]
    loss, denom, m = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(s, t, jnp.asarray([[tau]], jnp.float32))
    return loss[0, 0], denom, m


def _bwd_call(s, t, tau, denom, m, g, interpret):
    interpret = _resolve_interpret(interpret)
    n, d = s.shape
    ds, dt = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), s.dtype),
            jax.ShapeDtypeStruct((n, d), t.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(s, t, jnp.asarray([[tau]], jnp.float32), denom, m,
      jnp.asarray([[g]], jnp.float32))
    return ds, dt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_info_nce(s, t, tau: float = 0.1, interpret: bool | None = None):
    """Pallas-fused infoNCE-KD loss (no dropout; see module docstring).
    interpret=None auto-selects interpreter mode on non-TPU platforms."""
    loss, _, _ = _fwd_call(s, t, tau, interpret)
    return loss


def _vjp_fwd(s, t, tau, interpret):
    loss, denom, m = _fwd_call(s, t, tau, interpret)
    return loss, (s, t, denom, m)


def _vjp_bwd(tau, interpret, residuals, g):
    s, t, denom, m = residuals
    ds, dt = _bwd_call(s, t, tau, denom, m, g, interpret)
    return ds, dt


fused_info_nce.defvjp(_vjp_fwd, _vjp_bwd)
