"""On-chip A/B: blocked-Gram NCE kernel vs XLA vs the single-block kernel.

Times value_and_grad of the same loss (losses.info_nce_kd, no dropout) at
global-batch widths the >16-chip DP regimes would reach (ROADMAP "blocked
Gram"): N x 200 f32 features. The single-block kernel is skipped where its
N^2 Gram exceeds VMEM (~2048+).

Usage: python benchmarks/nce_blocked_ab.py [--sizes 1024,2048,4096,8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("POSE3D_COMPILE_CACHE", "/tmp/pose3d_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _time(fn, *args, steps=30, repeats=7):
    """Median-of-`repeats` timing windows (docs/PERF.md round-3 protocol):
    single windows through the axon tunnel vary >4x under multi-tenant
    contention, so every number reported here is a window median."""
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a.ravel()[0]), out)
    windows = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a.ravel()[0]), out)
        windows.append((time.perf_counter() - t0) / steps * 1e3)  # ms
    return float(np.median(windows)), float(
        100.0 * (max(windows) - min(windows)) / np.median(windows))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=str, default="1024,2048,4096,8192")
    parser.add_argument("--block", type=int, default=1024,
                        help="measured-best v5e tile (docs/PERF.md round 4)")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--repeats", type=int, default=7)
    parser.add_argument("--masked", action="store_true",
                        help="pad-DP regime: last 10%% of rows invalid; "
                        "A/Bs the kernel's valid-mask path vs the masked "
                        "XLA loss")
    args = parser.parse_args(argv)

    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce
    from pose3d_tpu.ops.nce_fused import fused_info_nce

    rng = np.random.default_rng(0)
    for n in [int(x) for x in args.sizes.split(",")]:
        s = jnp.asarray(rng.standard_normal((n, 200)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((n, 200)).astype(np.float32))
        valid = None
        if args.masked:
            valid = jnp.asarray(np.arange(n) < int(n * 0.9))

        xla = jax.jit(jax.value_and_grad(
            lambda a, b: info_nce_kd(a, b, 0.1, dropout_rng=None,
                                     valid=valid),
            argnums=(0, 1)))
        blk = jax.jit(jax.value_and_grad(
            lambda a, b: blocked_info_nce(a, b, 0.1, args.block, False,
                                          valid=valid),
            argnums=(0, 1)))
        row = {"n": n, "block": args.block, "masked": bool(args.masked)}

        # the XLA lowering can exceed HBM outright at wide N (it
        # materializes the N^2 Gram + softmax); survive and still time the
        # blocked kernel — the surviving-the-wall case IS the result
        try:
            (lx, gx) = xla(s, t)
            row["xla_ms"], row["xla_spread_pct"] = (round(v, 3) for v in _time(
                xla, s, t, steps=args.steps, repeats=args.repeats))
        except Exception as e:
            lx, gx = None, None
            row["xla_oom"] = type(e).__name__
        (lb, gb) = blk(s, t)
        row["blocked_ms"], row["blocked_spread_pct"] = (round(v, 3) for v in _time(
            blk, s, t, steps=args.steps, repeats=args.repeats))
        if lx is not None:
            row["loss_rel_gap"] = abs(float(lx) - float(lb)) / abs(float(lx))
            row["grad_rel_gap"] = float(
                jnp.linalg.norm(gx[0] - gb[0]) / jnp.linalg.norm(gx[0]))
            row["blocked_vs_xla"] = round(row["xla_ms"] / row["blocked_ms"], 3)

        if n <= 1024 and not args.masked:  # single-block kernel VMEM limit
            single = jax.jit(jax.value_and_grad(
                lambda a, b: fused_info_nce(a, b, 0.1, False),
                argnums=(0, 1)))
            single(s, t)
            ms, sp = _time(single, s, t, steps=args.steps,
                           repeats=args.repeats)
            row["single_ms"], row["single_spread_pct"] = round(ms, 3), round(sp, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
