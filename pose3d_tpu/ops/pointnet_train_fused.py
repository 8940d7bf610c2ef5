"""Fused TRAIN-mode PointNet encoder (Pallas, custom VJP).

Why (round-3 teacher-train push, docs/PERF.md): the teacher train step at
bs=160 is HBM-bandwidth bound — XLA's own cost analysis reports 65.3 GB of
traffic for a 79 ms device step = ~100% of the v5e's 819 GB/s. The PointNet
branch is the worst traffic-per-FLOP offender: its (160, 2500, 1024)
activations (819 MB bf16 each) exist only to be max-reduced, yet the unfused
train path materializes them (plus cotangents) several times — ~14-18 ms of
the step for under 1 ms of MXU work.

This module runs ShapeEncoderPC's train-mode forward+backward as a pipeline
of Pallas kernels that keep the wide activations in VMEM:

  forward  F1  read pts            -> accumulate layer-1 stat sums
           F2  read pts            -> h1 (cached, 64ch) + layer-2 stat sums
           F3  read h1             -> h2 (cached, 128ch) + layer-3 stat sums
           F4  read h2             -> out = max_p y3 (+ tie counts)
  backward B1  read h1,h2 + g      -> dW3, db3, d_y2 (cached) + BN2 bwd sums
           B2  read pts,h1,d_y2    -> dW2, db2, d_y1 (cached) + BN1 bwd sums
           B3  read pts, d_y1      -> dW1, db1

Only the NARROW tensors (h1, h2, d_y2, d_y1 — 64/128 channels) touch HBM;
the 1024-wide layer is recomputed from h2 where needed (the 128->1024 matmul
is cheap on the MXU — recompute trades ~0.5 ms of FLOPs for ~10 ms of
traffic). BatchNorm statistics accumulate across sequential grid steps in
VMEM f32 accumulators; the BN backward uses the standard through-statistics
formula da = g*r*(dy - mean(dy) - xhat*mean(dy*xhat)), r = rsqrt(var+eps).

Numerics: matmuls accumulate f32 and round to the compute dtype exactly like
the XLA path; stat sums differ from jnp.mean only in f32 summation ORDER
(~1e-7 rel). The max backward routes g to the ARGMAX row via an index F4
stores at forward time and an exact integer compare in B1 — NOT a value
compare: B1 recomputes y3, and on real hardware the two programs'
matmuls accumulate in different orders (~1e-3 rel divergence under the TPU
f32 default matmul precision), so an exact == against the stored max
silently drops the true max row and any workable tolerance mis-assigns g
to near-max rows (both measured — benchmarks/kernel_parity.py caught the
~100%-wrong on-chip grads in round 4 while interpret mode passed bitwise).
jnp.max's VJP splits exact float ties instead of picking the first; exact
ties are measure-zero in continuous activations and gradient-equivalent
when they occur. A/B-tested against the explicit XLA path
(models/pointnet.dense_bn_forward — values AND grads) in tests/test_ops.py
AND on-chip via the kernel-parity sweep.

Integration: models/pointnet.ShapeEncoderPC(use_fused_train=True); the
masked (padded-batch) and sync-BN paths fall back to XLA.

MEASURED RESULT (v5e chip, teacher step bs=160 bf16, benchmarks/
fused_pointnet_ab.py, round 3): the pipeline compiles and runs with matching
loss (12.3148 vs 12.3172 — bf16 noise) and cuts XLA-reported traffic
65.3 -> 57.7 GB, but the step is 82.6 vs 80.9 ms = 0.98x — a measured
NEGATIVE. Why: the recompute schedule re-runs the 128->1024 matmul three
extra times (fwd stats pass, max pass, bwd xhat pass ≈ +320 GFLOP) and the
kernels serialize against the surrounding XLA graph, eating the ~10 ms of
roofline savings (per-op profile: the 7 kernels total ~10.5 ms vs ~9 ms for
the XLA-fused PointNet section in context). Block size is not the issue
(400-step 8x128 grid and 80-step 8x640 grid time identical). Kept flag-gated
(default OFF) as a tested experiment record, like ops/pooling.py. No
teacher-step lever paid: rematerialization of the ResNet blocks also
measured NEGATIVE (0.84x "full" / 0.59x "elementwise" — docs/PERF.md round
3), and the round-3 roofline closure shows the step already runs at ~99% of
v5e HBM bandwidth: 26% MFU IS the bandwidth ceiling for train-mode conv/BN
at bs160.

Mosaic/TPU lessons encoded here (cost us three compile iterations):
no (BN,BP)->(BN*BP,1) bool shape-casts (build masks flat via 1-D iota +
div/mod), no 3-D `[:, None, :]` sublane broadcasts (use constant 0/1
expansion matmuls), no bf16 vector compares (compare f32 upcasts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5

_BLOCK_N = 8     # samples per tile
# points per tile (point axis padded to a multiple). 640 (not 128): the
# 1024-wide intermediates are recomputed in VMEM anyway, and an 80-step grid
# amortizes the ~13us per-step DMA/prologue latency that made the 400-step
# version run at ~20 GB/s effective (on-chip profile, docs/PERF.md r3).
_BLOCK_P = 640

# flipped by tests to run the kernels in interpreter mode on CPU
_INTERPRET = False


def _first_step():
    return jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)


def _row_mask(n_real, p_real, bn, bp):
    """(BN*BP, 1) bool: rows whose (sample, point) index is real (not pad).

    Built directly in the flattened layout via a 1-D iota + div/mod —
    Mosaic cannot shape-cast a (BN, BP) vector to (BN*BP, 1) (minor dim
    changes), so the 2-D iota formulation fails to compile."""
    i, j = pl.program_id(0), pl.program_id(1)
    r = jax.lax.broadcasted_iota(jnp.int32, (bn * bp, 1), 0)
    sid = r // bp + i * bn
    pid = r % bp + j * bp
    return jnp.logical_and(sid < n_real, pid < p_real)


def _dense(x, w_ref, b_ref, dtype):
    """Dense with the XLA rounding chain: f32-accumulated dot rounded to
    dtype, then +bias in dtype (bit-equal to flax nn.Dense(dtype=dtype))."""
    a = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    return a.astype(dtype) + b_ref[:].astype(dtype)


def _normalize(a, mu_ref, var_ref, sc_ref, bi_ref, dtype, relu):
    """flax _normalize parity: f32 arithmetic, rounded to dtype at the end."""
    y = a.astype(jnp.float32) - mu_ref[:]
    mul = lax.rsqrt(var_ref[:] + BN_EPS) * sc_ref[:]
    y = y * mul + bi_ref[:]
    y = y.astype(dtype)
    if relu:
        y = jnp.maximum(y, jnp.zeros((), dtype))
    return y


def _accum(ref, val):
    @pl.when(_first_step())
    def _():
        ref[:] = jnp.zeros_like(ref)

    ref[:] += val


def _accum_stats(a, mask, s_ref, q_ref):
    af = jnp.where(mask, a.astype(jnp.float32), 0.0)
    _accum(s_ref, jnp.sum(af, axis=0, keepdims=True))
    _accum(q_ref, jnp.sum(af * af, axis=0, keepdims=True))


# ---------------------------------------------------------------- forward
def _f1_kernel(n_real, p_real, pts_ref, w1_ref, b1_ref, s1_ref, q1_ref, *,
               dtype):
    bn, bp = pts_ref.shape[0], pts_ref.shape[1]
    x = pts_ref[:].reshape(bn * bp, 3).astype(dtype)
    a1 = _dense(x, w1_ref, b1_ref, dtype)
    _accum_stats(a1, _row_mask(n_real, p_real, bn, bp), s1_ref, q1_ref)


def _f2_kernel(n_real, p_real, pts_ref, w1_ref, b1_ref, mu1_ref, v1_ref,
               sc1_ref, bi1_ref, w2_ref, b2_ref, h1_ref, s2_ref, q2_ref, *,
               dtype):
    bn, bp = pts_ref.shape[0], pts_ref.shape[1]
    x = pts_ref[:].reshape(bn * bp, 3).astype(dtype)
    a1 = _dense(x, w1_ref, b1_ref, dtype)
    h1 = _normalize(a1, mu1_ref, v1_ref, sc1_ref, bi1_ref, dtype, relu=True)
    h1_ref[:] = h1.reshape(bn, bp, -1)
    a2 = _dense(h1, w2_ref, b2_ref, dtype)
    _accum_stats(a2, _row_mask(n_real, p_real, bn, bp), s2_ref, q2_ref)


def _f3_kernel(n_real, p_real, h1_ref, w2_ref, b2_ref, mu2_ref, v2_ref,
               sc2_ref, bi2_ref, w3_ref, b3_ref, h2_ref, s3_ref, q3_ref, *,
               dtype):
    bn, bp = h1_ref.shape[0], h1_ref.shape[1]
    h1 = h1_ref[:].reshape(bn * bp, -1)
    a2 = _dense(h1, w2_ref, b2_ref, dtype)
    h2 = _normalize(a2, mu2_ref, v2_ref, sc2_ref, bi2_ref, dtype, relu=True)
    h2_ref[:] = h2.reshape(bn, bp, -1)
    a3 = _dense(h2, w3_ref, b3_ref, dtype)
    _accum_stats(a3, _row_mask(n_real, p_real, bn, bp), s3_ref, q3_ref)


def _onehot_dot(a, b):
    """Exact-copy matmul for 0/1 expansion matrices.

    precision=HIGHEST is REQUIRED, not an optimization: the TPU default
    matmul precision is a single bf16 pass, which rounds the non-0/1
    operand to 8 mantissa bits — a row-copied index like 307 or a copied
    max value comes out changed, and every downstream == compare goes
    false. Measured on chip (kernel-parity r4): with default precision the
    max-backward's eq never fires and dy3 is silently all-zero."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _expand_mats(bn, bp):
    """Constant 0/1 matrices mapping (sample,) vectors <-> flattened
    (sample*point,) rows: E (BN*BP, BN) with E[r, r//bp]=1 and its
    transpose ET (BN, BN*BP). Mosaic has no sublane broadcast, so
    per-sample quantities are expanded to rows (E @ v) and row quantities
    reduced to samples (ET @ x) with cheap MXU matmuls instead of
    `v[:, None, :]`-style 3-D broadcasts. Use _onehot_dot with these."""
    r0 = jax.lax.broadcasted_iota(jnp.int32, (bn * bp, bn), 0)
    c0 = jax.lax.broadcasted_iota(jnp.int32, (bn * bp, bn), 1)
    e = (r0 // bp == c0).astype(jnp.float32)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (bn, bn * bp), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (bn, bn * bp), 1)
    et = (c1 // bp == r1).astype(jnp.float32)
    return e, et


def _segment_max(x, bn, bp):
    """Per-sample max over contiguous bp-row groups of x (BN*BP, D) ->
    (BN, D), via unrolled static sublane slices (no 3-D reshape)."""
    parts = [jnp.max(x[s * bp:(s + 1) * bp], axis=0, keepdims=True)
             for s in range(bn)]
    return jnp.concatenate(parts, axis=0)


def _f4_kernel(n_real, p_real, h2_ref, w3_ref, b3_ref, mu3_ref, v3_ref,
               sc3_ref, bi3_ref, out_ref, idx_ref, *, dtype):
    j = pl.program_id(1)
    bn, bp = h2_ref.shape[0], h2_ref.shape[1]
    h2 = h2_ref[:].reshape(bn * bp, -1)
    a3 = _dense(h2, w3_ref, b3_ref, dtype)
    y3 = _normalize(a3, mu3_ref, v3_ref, sc3_ref, bi3_ref, dtype, relu=False)
    mask = _row_mask(n_real, p_real, bn, bp)
    # large-negative, NOT -inf: bm feeds a 0/1 one-hot matmul below, and a
    # fully-padded sample's bm = -inf would turn every row of that product
    # into NaN (0 * -inf) — masking real rows' compares too
    neg = jnp.asarray(-1e30, jnp.float32).astype(dtype)
    y3 = jnp.where(mask, y3, neg)                              # (BN*BP, D)
    bm = _segment_max(y3, bn, bp)                              # (BN, D)

    # ARGMAX point index (as f32 — exact below 2^24), NOT tie counts: B1
    # recomputes y3, and a cross-kernel float compare against it is unsound
    # on real hardware — the two programs' matmuls may accumulate in
    # different orders (measured ~1e-3 rel divergence under the TPU f32
    # default matmul precision), so an exact == drops the true max row and
    # any workable tolerance mis-assigns g to near-max rows (both measured,
    # kernel-parity r4). The compare below is against THIS kernel's own y3 —
    # bitwise self-consistent on any backend.
    e, _ = _expand_mats(bn, bp)
    bm_rows = _onehot_dot(e, bm.astype(jnp.float32))
    r = jax.lax.broadcasted_iota(jnp.int32, (bn * bp, 1), 0)
    pidx = (r % bp + j * bp).astype(jnp.float32)               # (BN*BP, 1)
    cand = jnp.where(y3.astype(jnp.float32) == bm_rows, pidx, 1e9)
    bi = -_segment_max(-cand, bn, bp)                  # first-tie argmax

    @pl.when(j == 0)
    def _():
        out_ref[:] = bm
        idx_ref[:] = bi

    @pl.when(j > 0)
    def _():
        better = bm.astype(jnp.float32) > out_ref[:].astype(jnp.float32)
        idx_ref[:] = jnp.where(better, bi, idx_ref[:])
        out_ref[:] = jnp.maximum(out_ref[:], bm)


# ---------------------------------------------------------------- backward
def _b1_kernel(n_real, p_real, h1_ref, h2_ref, w2_ref, b2_ref, mu2_ref,
               v2_ref, w3_ref, b3_ref, mu3_ref, v3_ref, sc3_ref, bi3_ref,
               g_ref, idx_ref, c13_ref, c23_ref,
               dy2_ref, dw3_ref, db3_ref, s_ref, q_ref, *, dtype):
    j = pl.program_id(1)
    bn, bp = h2_ref.shape[0], h2_ref.shape[1]
    h2 = h2_ref[:].reshape(bn * bp, -1)
    a3 = _dense(h2, w3_ref, b3_ref, dtype)
    mask = _row_mask(n_real, p_real, bn, bp)

    # dy3: all of g to F4's stored argmax row, by EXACT integer compare on
    # the expanded point index — no cross-kernel float compare (see
    # _f4_kernel: the recomputed y3 here differs from F4's by ~1e-3 rel on
    # real hardware, so comparing values cannot work). Per-sample (idx, g)
    # vectors are expanded to rows with the 0/1 E matmul — Mosaic has no
    # sublane broadcast for `[:, None, :]` forms. jnp.max's VJP splits
    # exact float ties instead of picking the first; exact ties are
    # measure-zero in continuous activations, and on a tie the two rows are
    # identical in value, so which carries g is gradient-equivalent.
    e, _ = _expand_mats(bn, bp)
    ed = lambda v: _onehot_dot(e, v.astype(jnp.float32))
    r = jax.lax.broadcasted_iota(jnp.int32, (bn * bp, 1), 0)
    pidx = (r % bp + j * bp).astype(jnp.float32)
    eq = (pidx == ed(idx_ref[:])).astype(jnp.float32)
    dy3 = ed(g_ref[:]) * eq
    dy3 = jnp.where(mask, dy3, 0.0)

    # BN3 backward through the batch statistics
    inv3 = lax.rsqrt(v3_ref[:] + BN_EPS)
    xhat3 = (a3.astype(jnp.float32) - mu3_ref[:]) * inv3
    da3 = (sc3_ref[:] * inv3) * (dy3 - c13_ref[:] - xhat3 * c23_ref[:])
    da3 = jnp.where(mask, da3, 0.0)
    da3_c = da3.astype(dtype)

    _accum(dw3_ref, jnp.dot(h2.T, da3_c, preferred_element_type=jnp.float32))
    _accum(db3_ref, jnp.sum(da3, axis=0, keepdims=True))

    dh2 = jnp.dot(da3_c, w3_ref[:].T, preferred_element_type=jnp.float32)
    dy2 = jnp.where(h2.astype(jnp.float32) > 0, dh2, 0.0)  # relu2 mask
    dy2 = jnp.where(mask, dy2, 0.0)
    dy2_ref[:] = dy2.astype(dtype).reshape(bn, bp, -1)

    # BN2 bwd sums: sum(dy2), sum(dy2 * xhat2) — a2 recomputed from h1
    h1 = h1_ref[:].reshape(bn * bp, -1)
    a2 = _dense(h1, w2_ref, b2_ref, dtype)
    xhat2 = (a2.astype(jnp.float32) - mu2_ref[:]) * lax.rsqrt(v2_ref[:] + BN_EPS)
    _accum(s_ref, jnp.sum(dy2, axis=0, keepdims=True))
    _accum(q_ref, jnp.sum(dy2 * xhat2, axis=0, keepdims=True))


def _b2_kernel(n_real, p_real, pts_ref, h1_ref, dy2_ref, w1_ref, b1_ref,
               mu1_ref, v1_ref, w2_ref, b2_ref, mu2_ref, v2_ref, sc2_ref,
               c12_ref, c22_ref,
               dy1_ref, dw2_ref, db2_ref, s_ref, q_ref, *, dtype):
    bn, bp = h1_ref.shape[0], h1_ref.shape[1]
    mask = _row_mask(n_real, p_real, bn, bp)
    h1 = h1_ref[:].reshape(bn * bp, -1)
    a2 = _dense(h1, w2_ref, b2_ref, dtype)
    inv2 = lax.rsqrt(v2_ref[:] + BN_EPS)
    xhat2 = (a2.astype(jnp.float32) - mu2_ref[:]) * inv2
    dy2 = dy2_ref[:].reshape(bn * bp, -1).astype(jnp.float32)
    da2 = (sc2_ref[:] * inv2) * (dy2 - c12_ref[:] - xhat2 * c22_ref[:])
    da2 = jnp.where(mask, da2, 0.0)
    da2_c = da2.astype(dtype)

    _accum(dw2_ref, jnp.dot(h1.T, da2_c, preferred_element_type=jnp.float32))
    _accum(db2_ref, jnp.sum(da2, axis=0, keepdims=True))

    dh1 = jnp.dot(da2_c, w2_ref[:].T, preferred_element_type=jnp.float32)
    dy1 = jnp.where(h1.astype(jnp.float32) > 0, dh1, 0.0)
    dy1 = jnp.where(mask, dy1, 0.0)
    dy1_ref[:] = dy1.astype(dtype).reshape(bn, bp, -1)

    x = pts_ref[:].reshape(bn * bp, 3).astype(dtype)
    a1 = _dense(x, w1_ref, b1_ref, dtype)
    xhat1 = (a1.astype(jnp.float32) - mu1_ref[:]) * lax.rsqrt(v1_ref[:] + BN_EPS)
    _accum(s_ref, jnp.sum(dy1, axis=0, keepdims=True))
    _accum(q_ref, jnp.sum(dy1 * xhat1, axis=0, keepdims=True))


def _b3_kernel(n_real, p_real, pts_ref, dy1_ref, w1_ref, b1_ref, mu1_ref,
               v1_ref, sc1_ref, c11_ref, c21_ref, dw1_ref, db1_ref, *, dtype):
    bn, bp = dy1_ref.shape[0], dy1_ref.shape[1]
    mask = _row_mask(n_real, p_real, bn, bp)
    x = pts_ref[:].reshape(bn * bp, 3).astype(dtype)
    a1 = _dense(x, w1_ref, b1_ref, dtype)
    inv1 = lax.rsqrt(v1_ref[:] + BN_EPS)
    xhat1 = (a1.astype(jnp.float32) - mu1_ref[:]) * inv1
    dy1 = dy1_ref[:].reshape(bn * bp, -1).astype(jnp.float32)
    da1 = (sc1_ref[:] * inv1) * (dy1 - c11_ref[:] - xhat1 * c21_ref[:])
    da1 = jnp.where(mask, da1, 0.0)

    _accum(dw1_ref, jnp.dot(x.T, da1.astype(dtype),
                            preferred_element_type=jnp.float32))
    _accum(db1_ref, jnp.sum(da1, axis=0, keepdims=True))


# ------------------------------------------------------------ orchestration
def _row_spec(c):
    return pl.BlockSpec((_BLOCK_N, _BLOCK_P, c), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _sample_spec(c):
    return pl.BlockSpec((_BLOCK_N, c), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _call(kernel, grid, in_specs, out_specs, out_shape, args, n_real, p_real,
          dtype):
    return pl.pallas_call(
        functools.partial(kernel, n_real, p_real, dtype=dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_INTERPRET,
        # the (rows, 1024)-wide f32 intermediates exceed the default 16 MB
        # scoped-VMEM budget at the 640-point block size; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


def _pad_points(points):
    n, p, _ = points.shape
    pp = -(-p // _BLOCK_P) * _BLOCK_P
    if pp != p:
        points = jnp.pad(points, ((0, 0), (0, pp - p), (0, 0)))
    rem_n = (-n) % _BLOCK_N
    if rem_n:
        points = jnp.pad(points, ((0, rem_n), (0, 0), (0, 0)))
    return points, pp


def _finalize_stats(s, q, m):
    mu = s[0] / m
    var = jnp.maximum(0.0, q[0] / m - mu * mu)
    return mu, var


def _wb(dd, dtype):
    return dd["kernel"].astype(dtype), dd["bias"].astype(dtype)[None, :]


def _fwd_impl(points, params, dtype):
    (d1, bn1), (d2, bn2), (d3, bn3) = params
    n, p, _ = points.shape
    pts, pp = _pad_points(points)
    n_pad = pts.shape[0]
    grid = (n_pad // _BLOCK_N, pp // _BLOCK_P)
    m = float(n * p)
    c1, c2, c3 = d1["kernel"].shape[1], d2["kernel"].shape[1], d3["kernel"].shape[1]
    w1, b1 = _wb(d1, dtype)
    w2, b2 = _wb(d2, dtype)
    w3, b3 = _wb(d3, dtype)
    vec = lambda a: a[None, :]

    s1, q1 = _call(
        _f1_kernel, grid,
        [_row_spec(3), _full_spec(), _full_spec()],
        (_vec_spec(c1), _vec_spec(c1)),
        (jax.ShapeDtypeStruct((1, c1), jnp.float32),) * 2,
        (pts, w1, b1), n, p, dtype)
    mu1, v1 = _finalize_stats(s1, q1, m)

    h1, s2, q2 = _call(
        _f2_kernel, grid,
        [_row_spec(3)] + [_full_spec()] * 8,
        (_row_spec(c1), _vec_spec(c2), _vec_spec(c2)),
        (jax.ShapeDtypeStruct((n_pad, pp, c1), dtype),
         jax.ShapeDtypeStruct((1, c2), jnp.float32),
         jax.ShapeDtypeStruct((1, c2), jnp.float32)),
        (pts, w1, b1, vec(mu1), vec(v1), vec(bn1["scale"]), vec(bn1["bias"]),
         w2, b2), n, p, dtype)
    mu2, v2 = _finalize_stats(s2, q2, m)

    h2, s3, q3 = _call(
        _f3_kernel, grid,
        [_row_spec(c1)] + [_full_spec()] * 8,
        (_row_spec(c2), _vec_spec(c3), _vec_spec(c3)),
        (jax.ShapeDtypeStruct((n_pad, pp, c2), dtype),
         jax.ShapeDtypeStruct((1, c3), jnp.float32),
         jax.ShapeDtypeStruct((1, c3), jnp.float32)),
        (h1, w2, b2, vec(mu2), vec(v2), vec(bn2["scale"]), vec(bn2["bias"]),
         w3, b3), n, p, dtype)
    mu3, v3 = _finalize_stats(s3, q3, m)

    out, idx = _call(
        _f4_kernel, grid,
        [_row_spec(c2)] + [_full_spec()] * 6,
        (_sample_spec(c3), _sample_spec(c3)),
        (jax.ShapeDtypeStruct((n_pad, c3), dtype),
         jax.ShapeDtypeStruct((n_pad, c3), jnp.float32)),
        (h2, w3, b3, vec(mu3), vec(v3), vec(bn3["scale"]), vec(bn3["bias"])),
        n, p, dtype)
    out, idx = out[:n], idx[:n]
    stats = ((mu1, v1), (mu2, v2), (mu3, v3))
    return out, stats, (pts, h1, h2, idx)


def _bwd_impl(points, params, dtype, stats, caches, out, g):
    (d1, bn1), (d2, bn2), (d3, bn3) = params
    (mu1, v1), (mu2, v2), (mu3, v3) = stats
    pts, h1, h2, idx = caches
    n, p, _ = points.shape
    pp = h1.shape[1]
    n_pad = pts.shape[0]
    grid = (n_pad // _BLOCK_N, pp // _BLOCK_P)
    m = float(n * p)
    c1, c2, c3 = d1["kernel"].shape[1], d2["kernel"].shape[1], d3["kernel"].shape[1]
    w1, b1 = _wb(d1, dtype)
    w2, b2 = _wb(d2, dtype)
    w3, b3 = _wb(d3, dtype)
    vec = lambda a: a[None, :]

    g = g.astype(jnp.float32)
    # BN3 scalar sums come for free from the max structure: every tied max
    # position shares the same normalized value xhat3 = (out - beta)/gamma
    dbeta3 = jnp.sum(g, axis=0)
    xhat_max = (out.astype(jnp.float32) - bn3["bias"]) / jnp.where(
        bn3["scale"] == 0, 1.0, bn3["scale"])
    dgamma3 = jnp.sum(g * xhat_max, axis=0)
    c13, c23 = dbeta3 / m, dgamma3 / m

    g_pad = jnp.pad(g, ((0, n_pad - n), (0, 0)))
    # pad tail indices point nowhere (-1 matches no row): dy3 stays 0 there
    idx_pad = jnp.pad(idx, ((0, n_pad - n), (0, 0)), constant_values=-1.0)

    dy2, dw3, db3, s_dy2, q_dy2 = _call(
        _b1_kernel, grid,
        [_row_spec(c1), _row_spec(c2)] + [_full_spec()] * 10
        + [_sample_spec(c3)] * 2 + [_full_spec()] * 2,
        (_row_spec(c2), _full_spec(), _vec_spec(c3), _vec_spec(c2),
         _vec_spec(c2)),
        (jax.ShapeDtypeStruct((n_pad, pp, c2), dtype),
         jax.ShapeDtypeStruct((c2, c3), jnp.float32),
         jax.ShapeDtypeStruct((1, c3), jnp.float32),
         jax.ShapeDtypeStruct((1, c2), jnp.float32),
         jax.ShapeDtypeStruct((1, c2), jnp.float32)),
        (h1, h2, w2, b2, vec(mu2), vec(v2), w3, b3, vec(mu3), vec(v3),
         vec(bn3["scale"]), vec(bn3["bias"]),
         g_pad, idx_pad, vec(c13), vec(c23)), n, p, dtype)
    dbeta2, dgamma2 = s_dy2[0], q_dy2[0]
    c12, c22 = dbeta2 / m, dgamma2 / m

    dy1, dw2, db2, s_dy1, q_dy1 = _call(
        _b2_kernel, grid,
        [_row_spec(3), _row_spec(c1), _row_spec(c2)] + [_full_spec()] * 11,
        (_row_spec(c1), _full_spec(), _vec_spec(c2), _vec_spec(c1),
         _vec_spec(c1)),
        (jax.ShapeDtypeStruct((n_pad, pp, c1), dtype),
         jax.ShapeDtypeStruct((c1, c2), jnp.float32),
         jax.ShapeDtypeStruct((1, c2), jnp.float32),
         jax.ShapeDtypeStruct((1, c1), jnp.float32),
         jax.ShapeDtypeStruct((1, c1), jnp.float32)),
        (pts, h1, dy2, w1, b1, vec(mu1), vec(v1), w2, b2, vec(mu2), vec(v2),
         vec(bn2["scale"]), vec(c12), vec(c22)), n, p, dtype)
    dbeta1, dgamma1 = s_dy1[0], q_dy1[0]
    c11, c21 = dbeta1 / m, dgamma1 / m

    dw1, db1 = _call(
        _b3_kernel, grid,
        [_row_spec(3), _row_spec(c1)] + [_full_spec()] * 7,
        (_full_spec(), _vec_spec(c1)),
        (jax.ShapeDtypeStruct((3, c1), jnp.float32),
         jax.ShapeDtypeStruct((1, c1), jnp.float32)),
        (pts, dy1, w1, b1, vec(mu1), vec(v1), vec(bn1["scale"]),
         vec(c11), vec(c21)), n, p, dtype)

    d_params = (
        ({"kernel": dw1, "bias": db1[0]},
         {"scale": dgamma1, "bias": dbeta1}),
        ({"kernel": dw2, "bias": db2[0]},
         {"scale": dgamma2, "bias": dbeta2}),
        ({"kernel": dw3, "bias": db3[0]},
         {"scale": dgamma3, "bias": dbeta3}),
    )
    return jnp.zeros_like(points), d_params


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pointnet_train_fused(points, params, dtype=jnp.bfloat16):
    """Train-mode ShapeEncoderPC forward: (N, P, 3) + 3x(dense, bn) param
    dicts -> (out (N, D), ((mu, var) x 3) batch statistics). Differentiable
    w.r.t. params (points are data; their cotangent is zero); the stats
    outputs feed only the no-grad running-average update."""
    out, stats, _ = _fwd_impl(points, params, dtype)
    return out, stats


def _fused_fwd(points, params, dtype=jnp.bfloat16):
    out, stats, caches = _fwd_impl(points, params, dtype)
    return (out, stats), (points, params, stats, caches, out)


def _fused_bwd(dtype, res, cotangents):
    points, params, stats, caches, out = res
    g, _g_stats = cotangents
    return _bwd_impl(points, params, dtype, stats, caches, out, g)


pointnet_train_fused.defvjp(_fused_fwd, _fused_bwd)
