"""Serving-row roofline closure (VERDICT r4 weak #5 / next-round #4).

Every train row in docs/PERF.md carries a binding-resource statement
(FLOPs floor, bytes floor, measured, and which resource saturates); the
bf16 student serving headline (~9.1k img/s at bs256) never got one. This
script produces it, with the same protocol:

  * workload: bench.py's serving metric exactly — BaselineEstimator(2048)
    bf16 eval fwd + decode_predictions, bs 256 @224 (reference
    testing.py:16 config);
  * measured: two-window slope (fill-cancelling) + xplane device-busy
    corroboration;
  * floors: compiled cost_analysis flops/bytes -> T_mxu = F/197e12,
    T_hbm = B/819e9. max(T_mxu, T_hbm) is the overlapped floor; their SUM
    is the fully-serialized floor. A phase-alternating program (conv
    segments MXU-saturated moving few bytes; pool/elementwise segments
    HBM-saturated doing few FLOPs) lands between the two, and lands AT the
    sum when the phases overlap not at all;
  * attribution: per-op device table from the trace, aggregated into
    MXU-dominated (conv/dot fusions) vs other, so the floor split is
    checked against where the time actually goes.

Also runs the int8 path (--int8) for the same statement.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serving_roofline.py
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
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

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_HBM = 819e9

_MXU_RE = re.compile(r"conv|dot|einsum|matmul", re.I)


def _sync(x):
    leaves = [a for a in jax.tree.leaves(x) if hasattr(a, "shape")]
    if leaves:
        np.asarray(leaves[0].ravel()[0])


def _slope_ms(fn, *args, steps=20):
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


def _trace_op_table(fn, *args, steps=20):
    """(total_ms_per_call, [(op_name, ms_per_call)]) from an xplane trace."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        return None, []
    d = tempfile.mkdtemp(prefix="pose3d_roofline_prof_")
    _sync(fn(*args))
    jax.profiler.start_trace(d)
    o = None
    for _ in range(steps):
        o = fn(*args)
    _sync(o)
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None, []
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        return None, []
    plane = planes[0]
    md = plane.event_metadata
    agg = collections.Counter()
    for line in plane.lines:
        if "Ops" not in line.name or "Async" in line.name:
            continue
        for e in line.events:
            agg[md[e.metadata_id].name] += e.duration_ps
    table = [(name, ps / 1e9 / steps) for name, ps in agg.most_common()]
    return sum(ms for _, ms in table), table


def build_serving_fn(batch: int, int8: bool, width_mult: float = 1.0):
    from pose3d_tpu import geometry
    from pose3d_tpu.models import BaselineEstimator

    model = BaselineEstimator(img_feature_dim=2048, dtype=jnp.bfloat16,
                              width_mult=width_mult)
    im = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    variables = model.init(jax.random.key(0), im, train=False)
    x = jnp.asarray(np.random.default_rng(0).random((batch, 224, 224, 3)),
                    jnp.float32)

    if int8:
        from pose3d_tpu.serving import quantize_student, student_int8_infer

        q = quantize_student(variables, [np.asarray(x[:16])])

        def fn(qq, x):
            outputs = student_int8_infer(qq, x)
            return geometry.decode_predictions(tuple(outputs[:3]),
                                               tuple(outputs[3:]))

        return jax.jit(fn), (q, x)

    def fn(variables, x):
        outputs, _ = model.apply(variables, x, train=False)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return geometry.decode_predictions(tuple(outputs[:3]),
                                           tuple(outputs[3:]))

    return jax.jit(fn), (variables, x)


def analyze(name: str, batch: int, int8: bool, top: int = 12,
            trace: bool = True) -> dict:
    fn, args = build_serving_fn(batch, int8)
    compiled = fn.lower(*args).compile()
    cost = compiled.cost_analysis()
    F = float(cost.get("flops", 0.0))
    B = float(cost.get("bytes accessed", 0.0))
    t_mxu = F / PEAK_FLOPS * 1e3
    t_hbm = B / PEAK_HBM * 1e3
    ms = _slope_ms(fn, *args)
    row = {"name": name, "batch": batch,
           "measured_ms": round(ms, 3),
           "img_per_s": round(batch / ms * 1e3, 1),
           "tflops": round(F / 1e12, 3), "bytes_gb": round(B / 1e9, 2),
           "t_mxu_ms": round(t_mxu, 2), "t_hbm_ms": round(t_hbm, 2),
           "overlapped_floor_ms": round(max(t_mxu, t_hbm), 2),
           "serialized_floor_ms": round(t_mxu + t_hbm, 2),
           "mfu": round(F / (ms / 1e3) / PEAK_FLOPS, 3),
           "hbm_frac": round(B / (ms / 1e3) / PEAK_HBM, 3)}
    print(f"\n== {name} bs{batch} ==")
    print(f"measured (slope): {ms:.3f} ms  ({row['img_per_s']:.0f} img/s)")
    print(f"cost_analysis: {row['tflops']} TFLOP, {row['bytes_gb']} GB")
    print(f"floors: MXU {t_mxu:.2f} ms, HBM {t_hbm:.2f} ms; "
          f"overlapped max {row['overlapped_floor_ms']} ms, "
          f"serialized sum {row['serialized_floor_ms']} ms")
    print(f"global: {100 * row['mfu']:.1f}% MFU, "
          f"{100 * row['hbm_frac']:.1f}% HBM")

    if trace:
        tot_ms, table = _trace_op_table(fn, *args)
        if tot_ms:
            mxu_ms = sum(m for n, m in table if _MXU_RE.search(n))
            other_ms = tot_ms - mxu_ms
            row["trace_ms"] = round(tot_ms, 3)
            row["trace_mxu_ms"] = round(mxu_ms, 3)
            row["trace_other_ms"] = round(other_ms, 3)
            print(f"trace: {tot_ms:.3f} ms device-busy "
                  f"(slope agrees to {abs(tot_ms - ms) / ms:.1%}); "
                  f"conv/dot ops {mxu_ms:.2f} ms, other {other_ms:.2f} ms")
            print(f"  -> conv/dot phase vs MXU floor: "
                  f"{100 * t_mxu / max(mxu_ms, 1e-9):.0f}% of MXU peak")
            print(f"  -> other phase vs its bytes: assuming the non-conv "
                  f"ops move the non-conv bytes at HBM speed, "
                  f"{other_ms:.2f} ms explains "
                  f"{other_ms * PEAK_HBM / 1e6:.1f} MB-equivalents")
            print(f"  top {top} ops:")
            for n, m in table[:top]:
                cls = "MXU " if _MXU_RE.search(n) else "    "
                print(f"   {m:8.3f} ms {cls} {n[:80]}")
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--int8", action="store_true", help="also run int8 PTQ")
    ap.add_argument("--no_trace", action="store_true")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args(argv)
    print(f"devices: {jax.devices()}")
    rows = [analyze("student bf16", args.batch, False, trace=not args.no_trace)]
    if args.int8:
        rows.append(analyze("student int8", args.batch, True,
                            trace=not args.no_trace))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=2)
        print(f"\nwritten to {args.json}")
    return rows


if __name__ == "__main__":
    main()
