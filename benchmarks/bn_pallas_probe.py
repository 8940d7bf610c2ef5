"""On-chip probe: can Pallas beat XLA's BN stat/grad reduce fusions?

Round-3 teacher-train investigation (VERDICT r2 #1). The teacher step's
trace (benchmarks/profile_kd_step.py --piece teacher_step) shows 36.2 ms of
115 `convert_reduce` fusions; the worst run at 1.9-2.9x their pure HBM
bandwidth bound, e.g.:

  convert_reduce_fusion.11: (3x f32[256] sums + bf16[160,56,56,256] tensor)
  1.82 ms vs ~0.94 ms of unavoidable traffic (read g + read xhat + write dx).

This probe times, on the SAME shapes, in ISOLATION:
  A. XLA per-channel (sum, sumsq) of a bf16 NHWC tensor (the BN fwd stats);
  B. a Pallas one-pass (sum, sumsq) kernel with f32 VMEM accumulators;
  C. XLA BN-bwd reduce pair (sum g, sum g*xhat) + dx write;
  D. a Pallas two-output bwd kernel (sums in pass 1, dx in pass 2).

If B/D do not beat A/C by >=1.5x in isolation, the whole-block-Pallas-BN
avenue is closed with trace evidence (an in-context win would need at least
the isolated win, per the round-2 drop-in-BN lesson where an isolated 14x
became a full-step 1.00x).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bn_pallas_probe.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/pose3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _sync(x):
    leaves = jax.tree.leaves(x)
    np.asarray(leaves[0].ravel()[0])


def _time(fn, *args, steps=20):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


# ---------------------------------------------------------------- A: XLA fwd
@jax.jit
def xla_stats(x):
    xf = x.astype(jnp.float32)
    m = xf.reshape(-1, x.shape[-1])
    return jnp.sum(m, 0), jnp.sum(m * m, 0)


# ------------------------------------------------------------- B: Pallas fwd
def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    xf = x_ref[:].astype(jnp.float32)
    sum_ref[:] += jnp.sum(xf, axis=0, keepdims=True)
    sq_ref[:] += jnp.sum(xf * xf, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block",))
def pallas_stats(x, block=2048):
    c = x.shape[-1]
    m = x.reshape(-1, c)
    rows = m.shape[0]
    grid = pl.cdiv(rows, block)
    s, q = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
    )(m)
    return s[0], q[0]


# ---------------------------------------------------------------- C: XLA bwd
@jax.jit
def xla_bn_bwd(g, xhat, gamma, inv_std):
    gf = g.astype(jnp.float32)
    xf = xhat.astype(jnp.float32)
    c = g.shape[-1]
    n = g.size // c
    dbeta = jnp.sum(gf.reshape(-1, c), 0)
    dgamma = jnp.sum((gf * xf).reshape(-1, c), 0)
    dx = (gamma * inv_std) * (gf - dbeta / n - xf * (dgamma / n))
    return dbeta, dgamma, dx.astype(g.dtype)


# ------------------------------------------------------------- D: Pallas bwd
def _bwd_sums_kernel(g_ref, xh_ref, db_ref, dg_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        db_ref[:] = jnp.zeros_like(db_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)

    gf = g_ref[:].astype(jnp.float32)
    xf = xh_ref[:].astype(jnp.float32)
    db_ref[:] += jnp.sum(gf, axis=0, keepdims=True)
    dg_ref[:] += jnp.sum(gf * xf, axis=0, keepdims=True)


def _bwd_dx_kernel(g_ref, xh_ref, scale_ref, mb_ref, mg_ref, dx_ref):
    gf = g_ref[:].astype(jnp.float32)
    xf = xh_ref[:].astype(jnp.float32)
    dx = scale_ref[:] * (gf - mb_ref[:] - xf * mg_ref[:])
    dx_ref[:] = dx.astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block",))
def pallas_bn_bwd(g, xhat, gamma, inv_std, block=2048):
    c = g.shape[-1]
    gm = g.reshape(-1, c)
    xm = xhat.reshape(-1, c)
    rows = gm.shape[0]
    grid = pl.cdiv(rows, block)
    db, dg = pl.pallas_call(
        _bwd_sums_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, c), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((1, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
    )(gm, xm)
    n = rows
    scale = (gamma * inv_std)[None, :]
    dx = pl.pallas_call(
        _bwd_dx_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), g.dtype),
    )(gm, xm, scale, (db / n), (dg / n))
    return db[0], dg[0], dx.reshape(g.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="160x56x56x256,160x112x112x64,160x2500x1024")
    ap.add_argument("--block", type=int, default=2048)
    args = ap.parse_args()

    kind = jax.devices()[0].device_kind
    bw = 819e9  # v5e HBM
    print(f"device: {kind}")
    rng = np.random.default_rng(0)
    for spec in args.shapes.split(","):
        shape = tuple(int(s) for s in spec.split("x"))
        c = shape[-1]
        rows = int(np.prod(shape[:-1]))
        # largest dividing block <= requested, multiple of 16 sublanes
        block = args.block
        while block > 16 and (rows % block or block % 16):
            block -= 16
        args_block = block
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32),
                        jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32),
                        jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        inv_std = jnp.ones((c,), jnp.float32)
        nbytes = x.size * 2

        ta = _time(xla_stats, x)
        tb = _time(lambda x_: pallas_stats(x_, block=args_block), x)
        sa, qa = jax.tree.map(np.asarray, xla_stats(x))
        sb, qb = jax.tree.map(np.asarray, pallas_stats(x, block=args_block))
        err = max(np.abs(sa - sb).max() / (np.abs(sa).max() + 1e-9),
                  np.abs(qa - qb).max() / (np.abs(qa).max() + 1e-9))
        sol = nbytes / bw * 1e3
        print(f"{spec} stats: XLA {ta*1e3:.3f} ms | pallas {tb*1e3:.3f} ms | "
              f"SoL {sol:.3f} ms | rel err {err:.2e}")

        tc = _time(xla_bn_bwd, g, x, gamma, inv_std)
        td = _time(lambda *a: pallas_bn_bwd(*a, block=args_block),
                   g, x, gamma, inv_std)
        ca = jax.tree.map(np.asarray, xla_bn_bwd(g, x, gamma, inv_std))
        cb = jax.tree.map(np.asarray, pallas_bn_bwd(g, x, gamma, inv_std,
                                                    block=args_block))
        err = max(np.abs(np.asarray(ca[0]) - cb[0]).max() / (np.abs(ca[0]).max() + 1e-9),
                  float(np.abs(ca[2].astype(np.float32) - cb[2].astype(np.float32)).max()))
        sol = 5 * nbytes / bw * 1e3  # 4 reads + 1 write
        print(f"{spec} bwd:   XLA {tc*1e3:.3f} ms | pallas {td*1e3:.3f} ms | "
              f"SoL {sol:.3f} ms | err {err:.2e}")


if __name__ == "__main__":
    main()
