"""Probe: does XLA reach the v5e's 2x int8 MXU path for s8xs8->s32 convs?

Times the student's dominant conv shapes (VGG11 conv4/conv6 — the ops that
run at 99% of bf16 peak in the serving profile, docs/PERF.md) as bf16 vs
int8, plus a 4096^3 matmul control. If int8 lands near 2x, a post-training-
quantized student serving path is worth building; if it lands at/below 1x,
XLA is not lowering to the int8 systolic path and the avenue closes.

Usage: python benchmarks/int8_probe.py
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("POSE3D_COMPILE_CACHE", "/tmp/pose3d_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _time(fn, *args, steps=30):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / steps


def conv_case(name, n, h, w, cin, cout, k=3):
    rng = np.random.default_rng(0)
    flops = 2 * n * h * w * cin * cout * k * k  # same-padded
    rows = {}
    for dt, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        if dt == jnp.int8:
            x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)), jnp.int8)
            kk = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8)
        else:
            x = jnp.asarray(rng.standard_normal((n, h, w, cin)), dt)
            kk = jnp.asarray(rng.standard_normal((k, k, cin, cout)), dt)

        f = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
            a, b, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc))
        dt_s = _time(f, x, kk)
        rows[str(jnp.dtype(dt))] = {
            "ms": round(dt_s * 1e3, 3),
            "tops": round(flops / dt_s / 1e12, 1),
        }
    rows["int8_speedup"] = round(
        rows["bfloat16"]["ms"] / rows["int8"]["ms"], 3)
    print(json.dumps({name: rows}), flush=True)


def matmul_control(m=4096):
    rng = np.random.default_rng(0)
    flops = 2 * m**3
    rows = {}
    for dt, acc in ((jnp.bfloat16, jnp.float32), (jnp.int8, jnp.int32)):
        if dt == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
        else:
            a = jnp.asarray(rng.standard_normal((m, m)), dt)
        f = jax.jit(lambda x: jnp.dot(x, x, preferred_element_type=acc))
        dt_s = _time(f, a)
        rows[str(jnp.dtype(dt))] = {"ms": round(dt_s * 1e3, 3),
                                    "tops": round(flops / dt_s / 1e12, 1)}
    rows["int8_speedup"] = round(rows["bfloat16"]["ms"] / rows["int8"]["ms"], 3)
    print(json.dumps({"matmul_4096": rows}), flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    matmul_control()
    # student serving profile's two hot convs (bs 256)
    conv_case("conv4_56x56_256x256", 256, 56, 56, 256, 256)
    conv_case("conv6_28x28_512x512", 256, 28, 28, 512, 512)


if __name__ == "__main__":
    main()
