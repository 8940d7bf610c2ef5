"""Blocked-Gram infoNCE-KD: the wide-batch Pallas kernel family.

Same loss semantics as ops/nce_fused.fused_info_nce (= losses.info_nce_kd
without dropout, reference model_utils.py:277-285 incl. the double-counted
positive), but the (N, N) similarity matrix is never materialized: the
forward runs a flash-attention-style online log-sum-exp over column blocks
(residuals per row: running max m, sum-exp se, positive logit pos — 3N
floats), and the backward recomputes z blockwise in two passes (row-major
for ds, col-major for dt) so each output block stays resident across its
inner accumulation loop (Pallas output-revisit rule).

The core is RECTANGULAR: (local rows of s) x (all columns of t), with the
positive for local row r at column `row_offset + r`. Two consumers:

  * blocked_info_nce          — the single-device square loss (offset 0,
    rows == cols), returning the mean over valid rows;
  * blocked_info_nce_partial  — the per-shard term of the DATA-PARALLEL loss
    (parallel/nce_shard.sharded_info_nce): each device keeps its row shard,
    all-gathers the 200-d key features over the mesh axis, computes the SUM
    of its rows' losses against the global column set with its shard offset
    as the diagonal, and the caller psums sums and valid counts. Gradients
    flow through jax's all_gather transpose (psum-scatter) automatically, so
    ds stays local and dt is reduced across shards — the global-batch NCE of
    SURVEY.md §2c without ever materializing an N x N Gram per device.

Masking: every call carries per-row and per-column validity vectors
(all-ones when the caller has no `valid` mask; zeros for the internal block
padding). Invalid COLUMNS are masked to -inf inside every z block (they
never enter any real row's denominator — the same contract as
losses.info_nce_kd(valid=...)), invalid ROWS are zeroed out of the backward
and excluded from the loss sum. This is what lets padded DP batches
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
table in docs/PERF.md (round 4), from benchmarks/nce_blocked_ab.py; on-chip
numerics parity (square and sharded routes): benchmarks/kernel_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


def _diag_mask(shape, i, j, rb, cb, off):
    """Positive-pair mask for block (i, j): local row r's positive sits at
    global column `off + i*rb + r` (off = this shard's row offset in the
    global batch; 0 for the square single-device loss)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (rows + i * rb + off) == (cols + j * cb)


def _fwd_kernel(tau_ref, off_ref, s_ref, t_ref, vcol_ref, m_ref, se_ref,
                pos_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    rb, cb = s_ref.shape[0], t_ref.shape[0]
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = _masked_z(s, t, tau, vcol_ref[:])
    blk_max = jnp.max(z, axis=-1, keepdims=True)  # (B, 1)
    # at most one column matches per row across the whole grid; blocks with
    # no match contribute exactly 0 to the running sum
    match = _diag_mask(z.shape, i, j, rb, cb, off_ref[0, 0])
    contrib = jnp.sum(jnp.where(match, z, 0.0), axis=-1, keepdims=True)

    @pl.when(j == 0)
    def _():
        m_ref[:] = blk_max
        se_ref[:] = jnp.sum(jnp.exp(z - blk_max), axis=-1, keepdims=True)
        pos_ref[:] = contrib

    @pl.when(j != 0)
    def _():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, blk_max)
        se_ref[:] = (se_ref[:] * jnp.exp(m_old - m_new)
                     + jnp.sum(jnp.exp(z - m_new), axis=-1, keepdims=True))
        m_ref[:] = m_new
        pos_ref[:] = pos_ref[:] + contrib


def _dz_block(z, m, denom, pos, g_eff, vrow, diag):
    """dL/dz for one (RB, CB) block, invalid ROWS zeroed.

    Invalid columns need no extra handling: their z is _NEG so q underflows
    to exactly 0 (except on an all-invalid row, which the row mask covers)."""
    q = jnp.exp(z - m) / denom
    dz = q * g_eff
    q_pos = jnp.exp(pos - m) / denom  # (B, 1)
    dz = dz + jnp.where(diag, (q_pos - 1.0) * g_eff, 0.0)
    return jnp.where(vrow > 0.0, dz, 0.0)


def _bwd_ds_kernel(tau_ref, off_ref, g_ref, s_ref, t_ref, vrow_ref, vcol_ref,
                   m_ref, de_ref, pos_ref, ds_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    rb, cb = s_ref.shape[0], t_ref.shape[0]
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = _masked_z(s, t, tau, vcol_ref[:])
    diag = _diag_mask(z.shape, i, j, rb, cb, off_ref[0, 0])
    dz = _dz_block(z, m_ref[:], de_ref[:], pos_ref[:], g_ref[0, 0],
                   vrow_ref[:], diag)
    update = jnp.dot(dz, t, preferred_element_type=jnp.float32) / tau

    @pl.when(j == 0)
    def _():
        ds_ref[:] = update

    @pl.when(j != 0)
    def _():
        ds_ref[:] = ds_ref[:] + update


def _bwd_dt_kernel(tau_ref, off_ref, g_ref, s_ref, t_ref, vrow_ref, vcol_ref,
                   m_ref, de_ref, pos_ref, dt_ref):
    # grid = (col blocks, row blocks): col index outer so dt[j] stays resident
    j, i = pl.program_id(0), pl.program_id(1)
    rb, cb = s_ref.shape[0], t_ref.shape[0]
    tau = tau_ref[0, 0]
    s, _ = _normalize(s_ref[:].astype(jnp.float32))
    t, _ = _normalize(t_ref[:].astype(jnp.float32))
    z = _masked_z(s, t, tau, vcol_ref[:])
    diag = _diag_mask(z.shape, i, j, rb, cb, off_ref[0, 0])
    dz = _dz_block(z, m_ref[:], de_ref[:], pos_ref[:], g_ref[0, 0],
                   vrow_ref[:], diag)
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


def _fwd_call(s, t, vrow, vcol, off, tau, block, interpret):
    interpret = _resolve_interpret(interpret)
    nr, d = s.shape
    nc = t.shape[0]
    nbr, nbc = pl.cdiv(nr, block), pl.cdiv(nc, block)
    sp, tp = _pad(s, nbr * block), _pad(t, nbc * block)
    # zero-padded: pad tail is invalid; lane-major (1, nc_pad) for the column
    # mask (see _masked_z — sublane-major would force an in-kernel relayout)
    vt = _pad(vcol[:, None], nbc * block).reshape(1, nbc * block)
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
        grid=(nbr, nbc),
        out_shape=(jax.ShapeDtypeStruct((nbr * block, 1), jnp.float32),) * 3,
        in_specs=[_smem_spec(), _smem_spec(), row_spec, col_spec, vcol_spec],
        out_specs=(out_spec, out_spec, out_spec),
        interpret=interpret,
    )(jnp.asarray([[tau]], jnp.float32),
      jnp.asarray(off, jnp.int32).reshape(1, 1), sp, tp, vt)
    m, se, pos = m[:nr], se[:nr], pos[:nr]
    denom = jnp.exp(pos - m) + se
    per_row = -(pos - m) + jnp.log(denom)  # (nr, 1)
    lsum = jnp.sum(per_row[:, 0] * vrow)  # SUM over valid rows; caller
    return lsum, (m, denom, pos)  # divides by the (global) valid count


def _bwd_call(s, t, vrow, vcol, off, tau, block, m, denom, pos, g, interpret):
    interpret = _resolve_interpret(interpret)
    nr, d = s.shape
    nc = t.shape[0]
    nbr, nbc = pl.cdiv(nr, block), pl.cdiv(nc, block)
    nr_pad, nc_pad = nbr * block, nbc * block
    sp, tp = _pad(s, nr_pad), _pad(t, nc_pad)
    vp = _pad(vrow[:, None], nr_pad)              # sublane-major: row mask
    vt = _pad(vcol[:, None], nc_pad).reshape(1, nc_pad)  # lane-major: col mask
    mp = _pad(m, nr_pad)
    dp = _pad(denom, nr_pad)
    pp = _pad(pos, nr_pad)
    # g is the cotangent of the row-loss SUM — no division here; the mean's
    # 1/count arrives through the caller's division (square API) or psum'd
    # count (sharded route)
    scal = [jnp.asarray([[tau]], jnp.float32),
            jnp.asarray(off, jnp.int32).reshape(1, 1),
            g.astype(jnp.float32)[None, None]]

    def vspec(index_map, width):
        return pl.BlockSpec((block, width), index_map,
                            memory_space=pltpu.VMEM)

    def tspec(index_map):  # lane-major (1, block) column-mask slice
        return pl.BlockSpec((1, block), index_map, memory_space=pltpu.VMEM)

    # row-major pass: program_id(0)=i (s row blocks), program_id(1)=j (cols)
    by_row = lambda i, j: (i, 0)
    by_col = lambda i, j: (j, 0)
    ds_n = pl.pallas_call(
        _bwd_ds_kernel,
        grid=(nbr, nbc),
        out_shape=jax.ShapeDtypeStruct((nr_pad, d), jnp.float32),
        in_specs=[_smem_spec()] * 3
        + [vspec(by_row, d), vspec(by_col, d),
           vspec(by_row, 1), tspec(lambda i, j: (0, j)),
           vspec(by_row, 1), vspec(by_row, 1), vspec(by_row, 1)],
        out_specs=vspec(by_row, d),
        interpret=interpret,
    )(*scal, sp, tp, vp, vt, mp, dp, pp)

    # col-major pass: program_id(0)=j (t col blocks), program_id(1)=i (rows)
    by_row2 = lambda j, i: (i, 0)
    by_col2 = lambda j, i: (j, 0)
    dt_n = pl.pallas_call(
        _bwd_dt_kernel,
        grid=(nbc, nbr),
        out_shape=jax.ShapeDtypeStruct((nc_pad, d), jnp.float32),
        in_specs=[_smem_spec()] * 3
        + [vspec(by_row2, d), vspec(by_col2, d),
           vspec(by_row2, 1), tspec(lambda j, i: (0, j)),
           vspec(by_row2, 1), vspec(by_row2, 1), vspec(by_row2, 1)],
        out_specs=vspec(by_col2, d),
        interpret=interpret,
    )(*scal, sp, tp, vp, vt, mp, dp, pp)

    ds_n, dt_n = ds_n[:nr], dt_n[:nc]
    # back through the row L2 normalization (outside the kernel: O(N D))
    s_n, s_norm = _normalize(s.astype(jnp.float32))
    t_n, t_norm = _normalize(t.astype(jnp.float32))
    ds = (ds_n - jnp.sum(ds_n * s_n, axis=-1, keepdims=True) * s_n) / s_norm
    dt = (dt_n - jnp.sum(dt_n * t_n, axis=-1, keepdims=True) * t_n) / t_norm
    return ds.astype(s.dtype), dt.astype(t.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _blocked_rect_sum(s, t, vrow, vcol, off, tau, block, interpret):
    lsum, _ = _fwd_call(s, t, vrow, vcol, off, tau, block, interpret)
    return lsum


def _vjp_fwd(s, t, vrow, vcol, off, tau, block, interpret):
    lsum, (m, denom, pos) = _fwd_call(s, t, vrow, vcol, off, tau, block,
                                      interpret)
    return lsum, (s, t, vrow, vcol, off, m, denom, pos)


def _vjp_bwd(tau, block, interpret, residuals, g):
    s, t, vrow, vcol, off, m, denom, pos = residuals
    ds, dt = _bwd_call(s, t, vrow, vcol, off, tau, block, m, denom, pos,
                       jnp.asarray(g), interpret)
    return (ds, dt, jnp.zeros_like(vrow), jnp.zeros_like(vcol),
            np.zeros(np.shape(off), jax.dtypes.float0))


_blocked_rect_sum.defvjp(_vjp_fwd, _vjp_bwd)


def blocked_info_nce_partial(s, t, valid_rows, valid_cols, row_offset,
                             tau: float = 0.1, block: int = 1024,
                             interpret: bool | None = None) -> jnp.ndarray:
    """Per-shard partial of the data-parallel infoNCE-KD loss.

    `s` (local_n, D): this shard's query rows; `t` (N, D): the ALL-GATHERED
    key features; `row_offset`: this shard's first global row index (traced
    int ok — `jax.lax.axis_index(axis) * local_n` inside shard_map). Returns
    the SUM of per-row losses over this shard's valid rows; the caller psums
    sums and valid counts (parallel/nce_shard.sharded_info_nce). Gradients:
    ds is local, dt spans the gathered width — jax's all_gather transpose
    reduces it back across shards."""
    return _blocked_rect_sum(s, t, valid_rows.astype(jnp.float32),
                             valid_cols.astype(jnp.float32),
                             jnp.asarray(row_offset, jnp.int32),
                             tau, block, interpret)


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
    lsum = _blocked_rect_sum(s, t, validf, validf,
                             jnp.zeros((), jnp.int32), tau, block, interpret)
    return lsum / jnp.maximum(jnp.sum(validf), 1.0)
