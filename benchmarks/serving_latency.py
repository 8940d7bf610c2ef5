"""Serving latency/throughput sweep over batch size (bf16 + int8 student).

The repo's serving evidence is bs-256 *throughput*; online serving also
cares about small-batch *latency*. For each (path, batch) this reports:

  * device_ms: per-batch device time via the two-window slope (cancels the
    axon tunnel's fixed per-window pipeline fill — same protocol as
    run_all.py / bench.py's contention proxy). This is the deployable
    steady-state latency on a co-located TPU host.
  * roundtrip_ms: median host-timed single-batch dispatch->sync THROUGH
    the tunnel — an upper bound that bundles the sandbox's remote-dispatch
    cost (~tens of ms); included so the two are never conflated.

Workload matches bench.py's serving metric: BaselineEstimator(2048) bf16
eval fwd + decode_predictions (reference testing.py config 1), and the
int8 PTQ path (pose3d_tpu/serving). Run:

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serving_latency.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/pose3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _sync(x):
    leaves = [a for a in jax.tree.leaves(x) if hasattr(a, "shape")]
    if leaves:
        np.asarray(leaves[0].ravel()[0])


def _slope_ms(fn, *args, steps=20):
    """Per-call device ms via the two-window slope (fixed fill cancels)."""
    _sync(fn(*args))

    def window(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        return time.perf_counter() - t0

    t1 = window(steps)
    t2 = window(3 * steps)
    return (t2 - t1) / (2 * steps) * 1000.0


def _trace_device_ms(fn, *args, steps=20):
    """Per-call device-busy ms from a jax.profiler xplane trace — the ground
    truth the slope protocol approximates. At tiny batch the slope measures
    dispatch-enqueue rate instead of device time (back-to-back dispatches
    pipeline completely once device work < enqueue cost), so small-batch
    rows should quote this number. Parse approach per
    benchmarks/profile_kd_step.py (the tensorboard converters in this image
    are broken; read the proto with tensorflow's generated schema)."""
    import glob
    import tempfile

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None
    d = tempfile.mkdtemp(prefix="pose3d_lat_prof_")
    _sync(fn(*args))
    jax.profiler.start_trace(d)
    o = None
    for _ in range(steps):
        o = fn(*args)
    _sync(o)
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        return None
    tot_ps = 0
    for line in planes[0].lines:
        if "Ops" not in line.name or "Async" in line.name:
            continue
        tot_ps += sum(e.duration_ps for e in line.events)
    return tot_ps / 1e9 / steps


def _roundtrip_ms(fn, *args, reps=15):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1, 4, 16, 64, 256])
    ap.add_argument("--width_mult", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--profile", action="store_true",
                    help="also report trace-derived device-busy ms "
                         "(trustworthy at tiny batch where the slope is "
                         "enqueue-bound)")
    args = ap.parse_args(argv)

    from pose3d_tpu import geometry
    from pose3d_tpu.models import BaselineEstimator
    from pose3d_tpu.serving import quantize_student, student_int8_infer

    rng = np.random.default_rng(0)
    model = BaselineEstimator(img_feature_dim=2048, dtype=jnp.bfloat16,
                              width_mult=args.width_mult)
    im_init = jnp.zeros((1, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), im_init, train=False)
    calib = rng.standard_normal((16, 224, 224, 3)).astype(np.float32)
    q = quantize_student(variables, [calib])

    @jax.jit
    def infer_bf16(v, x):
        outputs, _ = model.apply(v, x, train=False)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return geometry.decode_predictions(tuple(outputs[:3]),
                                           tuple(outputs[3:]))

    @jax.jit
    def infer_int8(qq, x):
        outputs = student_int8_infer(qq, x)
        return geometry.decode_predictions(tuple(outputs[:3]),
                                           tuple(outputs[3:]))

    for bs in args.batches:
        im = jnp.asarray(rng.standard_normal((bs, 224, 224, 3))
                         .astype(np.float32))
        for path, fn, v in (("bf16", infer_bf16, variables),
                            ("int8", infer_int8, q)):
            dev = _slope_ms(fn, v, im, steps=args.steps)
            rt = _roundtrip_ms(fn, v, im)
            row = {
                "metric": "serving_latency", "path": path, "batch": bs,
                "width_mult": args.width_mult,
                "device_ms": round(dev, 3),
                "roundtrip_ms": round(rt, 2),
                "img_per_s": round(bs / dev * 1000.0, 1)}
            if args.profile:
                tms = _trace_device_ms(fn, v, im, steps=args.steps)
                if tms is not None:
                    row["trace_device_ms"] = round(tms, 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
