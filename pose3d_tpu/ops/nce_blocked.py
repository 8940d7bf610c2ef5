"""Blocked-Gram infoNCE-KD: the wide-batch Pallas kernel family.

Same loss semantics as ops/nce_fused.fused_info_nce (= losses.info_nce_kd
without dropout, reference model_utils.py:277-285 incl. the double-counted
positive), but the (N, N) similarity matrix is never materialized: the
forward runs a flash-attention-style online log-sum-exp over column blocks
(residuals per row: running max m, sum-exp se, positive logit pos — 3N
floats), and the backward recomputes z blockwise in two passes (row-major
for ds, col-major for dt) so each output block stays resident across its
inner accumulation loop (Pallas output-revisit rule).

Masking: every call carries a per-row validity vector (all-ones when the
caller has no `valid` mask; zeros for the internal block padding). Invalid
COLUMNS are masked to -inf inside every z block (they never enter any real
row's denominator — the same contract as losses.info_nce_kd(valid=...)),
invalid ROWS are zeroed out of the backward, and the loss is the mean over
valid rows only. This is what lets padded DP batches
(parallel/mesh.pad_batch) route here instead of falling back to XLA.

Why: the single-block kernel VMEM-OOMs at N≈2048 (N² Gram > 16 MB), and XLA
materializes the N² Gram + its softmax in HBM for both passes — the hard
wall is N=65536, where XLA's lowering exceeds the 16 GB HBM outright
(measured on-chip, docs/PERF.md round 4) while this kernel streams O(N·D)
bytes and keeps running. Below the wall the kernel is at time parity with
XLA up to N=4096 (both dispatch-bound) and ahead 1.10-1.18x from N=8192 up
at block=1024 (the measured-best block; 2048 exceeds scoped VMEM). This is
exactly the ">16-chip global-batch NCE" regime ROADMAP left open (b =
per-chip batch x DP width reaches 2048+ at 16 chips x 128 or 64 x 160).

VMEM per grid step at block B: z block B² f32 + two (B, D) operand blocks —
B=1024, D=200: ~5.8 MB.

On-chip A/B vs the XLA lowering of the same loss: the "blocked-Gram NCE"
table in docs/PERF.md (round 4), from benchmarks/nce_blocked_ab.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shared with the single-block kernel — steps.py routes between the two by
# batch size expecting identical math
from pose3d_tpu.ops.nce_fused import _normalize, _resolve_interpret

_NEG = -1e30  # large-negative instead of -inf: keeps exp() math NaN-free


def _masked_z(s, t, tau, vcol_t):
    """Normalized block Gram with invalid COLUMNS masked to _NEG.

    `vcol_t` is the LANE-MAJOR (1, B) validity slice for this column block —
    it is 0 on both caller-masked rows and the internal pad-to-block-multiple
    tail, so one mask covers both. Lane-major matters: a (B, 1) slice would
    need a sublane->lane relayout inside the kernel to broadcast over z's
    columns, and that relayout blows Mosaic's scoped-VMEM budget (measured
    on-chip: 19.4 MB scoped demand at B=128 vs the 16 MB limit — the
    kernel-parity sweep caught it). The (1, B) operand broadcasts for free."""
    z = jnp.dot(s, t.T, preferred_element_type=jnp.float32) / tau
    return jnp.where(vcol_t > 0.0, z, _NEG)


def _fwd_kernel(tau_ref, s_ref, t_ref, vcol_ref, m_ref, se_ref, pos_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = _masked_z(s, t, tau, vcol_ref[:])
    blk_max = jnp.max(z, axis=-1, keepdims=True)  # (B, 1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = blk_max
        se_ref[:] = jnp.sum(jnp.exp(z - blk_max), axis=-1, keepdims=True)

    @pl.when(j != 0)
    def _():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, blk_max)
        se_ref[:] = (se_ref[:] * jnp.exp(m_old - m_new)
                     + jnp.sum(jnp.exp(z - m_new), axis=-1, keepdims=True))
        m_ref[:] = m_new

    @pl.when(j == i)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
        pos_ref[:] = jnp.sum(jnp.where(rows == cols, z, 0.0), axis=-1,
                             keepdims=True)


def _dz_block(z, m, denom, pos, g_eff, vrow, i, j, block):
    """dL/dz for one (B, B) block, invalid ROWS zeroed.

    Invalid columns need no extra handling: their z is _NEG so q underflows
    to exactly 0 (except on an all-invalid row, which the row mask covers)."""
    q = jnp.exp(z - m) / denom
    dz = q * g_eff
    rows_i = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    cols_j = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    diag = (rows_i + i * block) == (cols_j + j * block)
    q_pos = jnp.exp(pos - m) / denom  # (B, 1)
    dz = dz + jnp.where(diag, (q_pos - 1.0) * g_eff, 0.0)
    return jnp.where(vrow > 0.0, dz, 0.0)


def _bwd_ds_kernel(tau_ref, g_ref, s_ref, t_ref, vrow_ref, vcol_ref, m_ref,
                   de_ref, pos_ref, ds_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    block = s_ref.shape[0]
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = _masked_z(s, t, tau, vcol_ref[:])
    dz = _dz_block(z, m_ref[:], de_ref[:], pos_ref[:], g_ref[0, 0],
                   vrow_ref[:], i, j, block)
    update = jnp.dot(dz, t, preferred_element_type=jnp.float32) / tau

    @pl.when(j == 0)
    def _():
        ds_ref[:] = update

    @pl.when(j != 0)
    def _():
        ds_ref[:] = ds_ref[:] + update


def _bwd_dt_kernel(tau_ref, g_ref, s_ref, t_ref, vrow_ref, vcol_ref, m_ref,
                   de_ref, pos_ref, dt_ref):
    # grid = (col blocks, row blocks): j outer so dt[j] stays resident
    j, i = pl.program_id(0), pl.program_id(1)
    block = s_ref.shape[0]
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = _masked_z(s, t, tau, vcol_ref[:])
    dz = _dz_block(z, m_ref[:], de_ref[:], pos_ref[:], g_ref[0, 0],
                   vrow_ref[:], i, j, block)
    update = jnp.dot(dz.T, s, preferred_element_type=jnp.float32) / tau

    @pl.when(i == 0)
    def _():
        dt_ref[:] = update

    @pl.when(i != 0)
    def _():
        dt_ref[:] = dt_ref[:] + update


def _pad(x, n_pad):
    n, d = x.shape
    if n == n_pad:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad - n, d), x.dtype)], axis=0)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_call(s, t, validf, tau, block, interpret):
    interpret = _resolve_interpret(interpret)
    n, d = s.shape
    nb = pl.cdiv(n, block)
    n_pad = nb * block
    sp, tp = _pad(s, n_pad), _pad(t, n_pad)
    # zero-padded: pad tail is invalid; lane-major (1, n_pad) for the column
    # mask (see _masked_z — sublane-major would force an in-kernel relayout)
    vt = _pad(validf[:, None], n_pad).reshape(1, n_pad)
    row_spec = pl.BlockSpec((block, d), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((block, d), lambda i, j: (j, 0),
                            memory_space=pltpu.VMEM)
    vcol_spec = pl.BlockSpec((1, block), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((block, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    m, se, pos = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, nb),
        out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),) * 3,
        in_specs=[_smem_spec(), row_spec, col_spec, vcol_spec],
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(jnp.asarray([[tau]], jnp.float32), sp, tp, vt)
    m, se, pos = m[:n], se[:n], pos[:n]
    denom = jnp.exp(pos - m) + se
    per_row = -(pos - m) + jnp.log(denom)  # (n, 1)
    n_valid = jnp.maximum(jnp.sum(validf), 1.0)
    loss = jnp.sum(per_row[:, 0] * validf) / n_valid
    return loss, (m, denom, pos)


def _bwd_call(s, t, validf, tau, block, m, denom, pos, g, interpret):
    interpret = _resolve_interpret(interpret)
    n, d = s.shape
    nb = pl.cdiv(n, block)
    n_pad = nb * block
    sp, tp = _pad(s, n_pad), _pad(t, n_pad)
    pad1 = lambda x: _pad(x, n_pad)
    vp = pad1(validf[:, None])          # sublane-major: row mask
    vt = vp.reshape(1, n_pad)           # lane-major: column mask
    mp, dp, pp = pad1(m), pad1(denom), pad1(pos)
    n_valid = jnp.maximum(jnp.sum(validf), 1.0)
    g_eff = (g / n_valid).astype(jnp.float32)  # d(mean over valid rows)
    scal = [jnp.asarray([[tau]], jnp.float32), g_eff[None, None]]
    by_i = lambda i, j: (i, 0)
    by_j = lambda i, j: (j, 0)

    def vspec(index_map, width):
        return pl.BlockSpec((block, width), index_map,
                            memory_space=pltpu.VMEM)

    def tspec(index_map):  # lane-major (1, block) column-mask slice
        return pl.BlockSpec((1, block), index_map, memory_space=pltpu.VMEM)

    ds_n = pl.pallas_call(
        _bwd_ds_kernel,
        grid=(nb, nb),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        in_specs=[_smem_spec()] * 2
        + [vspec(by_i, d), vspec(by_j, d),
           vspec(by_i, 1), tspec(lambda i, j: (0, j)),
           vspec(by_i, 1), vspec(by_i, 1), vspec(by_i, 1)],
        out_specs=vspec(by_i, d),
        interpret=interpret,
    )(*scal, sp, tp, vp, vt, mp, dp, pp)

    # col-major pass: program_id(0)=j (t rows), program_id(1)=i (s rows)
    dt_n = pl.pallas_call(
        _bwd_dt_kernel,
        grid=(nb, nb),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        in_specs=[_smem_spec()] * 2
        + [vspec(by_j, d), vspec(by_i, d),
           vspec(by_j, 1), tspec(lambda i, j: (0, i)),
           vspec(by_j, 1), vspec(by_j, 1), vspec(by_j, 1)],
        out_specs=vspec(by_i, d),
        interpret=interpret,
    )(*scal, sp, tp, vp, vt, mp, dp, pp)

    ds_n, dt_n = ds_n[:n], dt_n[:n]
    # back through the row L2 normalization (outside the kernel: O(N D))
    s_n, s_norm = _normalize(s.astype(jnp.float32))
    t_n, t_norm = _normalize(t.astype(jnp.float32))
    ds = (ds_n - jnp.sum(ds_n * s_n, axis=-1, keepdims=True) * s_n) / s_norm
    dt = (dt_n - jnp.sum(dt_n * t_n, axis=-1, keepdims=True) * t_n) / t_norm
    return ds.astype(s.dtype), dt.astype(t.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _blocked_info_nce_v(s, t, validf, tau, block, interpret):
    loss, _ = _fwd_call(s, t, validf, tau, block, interpret)
    return loss


def _vjp_fwd(s, t, validf, tau, block, interpret):
    loss, (m, denom, pos) = _fwd_call(s, t, validf, tau, block, interpret)
    return loss, (s, t, validf, m, denom, pos)


def _vjp_bwd(tau, block, interpret, residuals, g):
    s, t, validf, m, denom, pos = residuals
    ds, dt = _bwd_call(s, t, validf, tau, block, m, denom, pos, g, interpret)
    return ds, dt, jnp.zeros_like(validf)


_blocked_info_nce_v.defvjp(_vjp_fwd, _vjp_bwd)


def blocked_info_nce(s, t, tau: float = 0.1, block: int = 1024,
                     interpret: bool | None = None,
                     valid: jnp.ndarray | None = None):
    """Blocked-Gram infoNCE-KD loss (no dropout; see module docstring).

    N need not divide `block` (internal padding + masking). `valid` ((N,)
    bool/float, optional) excludes rows from both the negative pool and the
    mean with the exact semantics of losses.info_nce_kd(valid=...) — padded
    DP batches route here with their mask instead of falling back to XLA.
    interpret=None auto-selects interpreter mode off-TPU. block=1024 is the
    measured-best tile on v5e (docs/PERF.md round 4; 2048 exceeds scoped
    VMEM)."""
    validf = (jnp.ones((s.shape[0],), jnp.float32) if valid is None
              else valid.astype(jnp.float32))
    return _blocked_info_nce_v(s, t, validf, tau, block, interpret)
