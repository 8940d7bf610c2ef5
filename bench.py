"""Benchmark harness for the driver: headline numbers on the local chip.

Default (`--metric all`) runs BOTH headline workloads and prints one JSON
line per metric; the LAST line keeps the driver contract
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
and carries the other headline inline:
  {"metric": "student_infer_img_per_s", "value": N, "unit": "img/s",
   "vs_baseline": N/5000, "kd_train_samples_per_s": M,
   "kd_vs_baseline": M/132}

vs_baseline divisors (BASELINE.md): 5,000 img/s north-star for the RGB-only
student serving path (the reference publishes no numbers); 132 samples/s
derived-A100 for the KD --crd train step (config 4).

Outage resilience: the axon tunnel's documented failure mode (CLAUDE.md —
"UNAVAILABLE: TPU backend setup/compile error" or device-init hangs for
30+ min) is absorbed by a bounded retry/backoff probe before any jax device
work; rc=0 with captured numbers whenever the tunnel returns within the
budget (~30 min, POSE3D_BENCH_MAX_WAIT_S to override).

Run on TPU via the default axon platform. Accepts --batch/--steps overrides.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench invocations skip the 1-3 min compile
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("POSE3D_COMPILE_CACHE", "/tmp/pose3d_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _wait_for_backend() -> None:
    """Bounded retry/backoff around backend init (VERDICT r3 weak #3).

    Probes device init in a SUBPROCESS so both outage modes are survivable:
    the UNAVAILABLE error (a subprocess failure we can retry) and the
    init-hang (a subprocess timeout we can kill — in-process there is no way
    to abort a hung PJRT client init). Backoff 60s -> 480s, total budget
    ~30 min (the documented outage scale); on exhaustion exits rc=1 with the
    last backend error on stderr so the driver artifact says WHY."""
    import subprocess
    import sys

    max_wait = float(os.environ.get("POSE3D_BENCH_MAX_WAIT_S", "1800"))
    deadline, delay, attempt = time.time() + max_wait, 60.0, 0
    while True:
        attempt += 1
        err = ""
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert len(jax.devices()) > 0"],
                timeout=420, capture_output=True)
            if r.returncode == 0:
                return
            err = r.stderr.decode(errors="replace")[-1500:]
        except subprocess.TimeoutExpired:
            err = "device init exceeded 420s (tunnel hang mode)"
        if time.time() + delay > deadline:
            print(f"[bench] backend unavailable after {attempt} attempts; "
                  f"last error:\n{err}", file=sys.stderr)
            raise SystemExit(1)
        print(f"[bench] backend unavailable (attempt {attempt}); retrying "
              f"in {delay:.0f}s", file=sys.stderr)
        time.sleep(delay)
        delay = min(delay * 2, 480.0)


# Derived A100 baseline for the reference KD --crd step (BASELINE.md
# "Baseline derivation"): reference-workload FLOPs (teacher fwd+bwd included —
# the reference does NOT detach the teacher, base_class.py:363) at the
# NGC-published ResNet-50 TF32 utilization of an A100 gives ~132 samples/s.
A100_KD_SAMPLES_PER_S = 132.0


def _mfu(flops_per_step: float, step_seconds: float) -> float:
    """Model FLOPs utilization against the chip's bf16 peak (v5e: 197 TFLOP/s,
    v4: 275; detected crudely from the device kind, defaulting to v5e)."""
    kind = jax.devices()[0].device_kind.lower()
    peak = 275e12 if "v4" in kind else 197e12
    return flops_per_step / step_seconds / peak


def _contention_proxy(reps: int = 3, m: int = 8192) -> float:
    """Chip-load proxy for the measurement protocol (docs/PERF.md round 3):
    per-matmul time of a bf16 m^3 matmul (1.1 TFLOP at m=8192, pure-MXU)
    over speed-of-light. The axon tunnel adds a ~35 ms fixed pipeline-fill
    per sync window (a single-dispatch probe measures the tunnel, not the
    chip: ~50x SoL), so the estimate is the SLOPE between a short and a long
    dispatch chain — (t_long - t_short) / (n_long - n_short) — which cancels
    the fixed fill cost exactly like it cancels compile warmup. ~1.0-1.2 on
    a quiet chip; >1.4 means multi-tenant contention is inflating every
    number measured in this invocation."""
    kind = jax.devices()[0].device_kind.lower()
    peak = 275e12 if "v4" in kind else 197e12
    a = jnp.ones((m, m), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    np.asarray(f(a).ravel()[0])  # compile + warm

    def window(chain: int) -> float:
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f(a)
        np.asarray(out.ravel()[0])
        return time.perf_counter() - t0

    n_short, n_long = 5, 25
    best = float("inf")
    for _ in range(reps):
        slope = (window(n_long) - window(n_short)) / (n_long - n_short)
        best = min(best, slope)
    sol = 2 * m**3 / peak
    return best / sol


def _bench_kd_step(args) -> dict:
    """KD --crd train step (BASELINE config 4: bs 46, 3 contrast views,
    frozen PointCloud teacher). vs_baseline divides by the DERIVED A100
    reference throughput above; FLOPs come from XLA's own cost analysis, so
    the reported MFU is not hand-counted."""
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, torch_style_adam
    from pose3d_tpu.train import steps as steps_lib

    rng = np.random.default_rng(0)
    bk = args.batch if args.batch != 256 else 46
    student = BaselineEstimator(img_feature_dim=2048, dtype=jnp.bfloat16,
                                fold_deep_pools=args.fold_deep_pools)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=1024,
                            shape_feature_dim=1024, dtype=jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((bk, args.img, args.img, 3)).astype(np.float32))
    pc = jnp.asarray(rng.random((bk, 2500, 3)).astype(np.float32))
    label = jnp.asarray(np.stack([rng.integers(0, 360, bk), rng.integers(0, 180, bk),
                                  rng.integers(0, 360, bk)], 1).astype(np.int32))
    tv = teacher.init(jax.random.key(1), im[:1], pc[:1], train=False)
    sstate = create_train_state(student, (im[:1],), jax.random.key(3),
                                torch_style_adam(1e-4))
    batch = {"im": im, "im_flip": im, "im_rot": im, "shape": pc,
             "label": label, "label_flip": label, "label_rot": label}
    if args.int8_teacher:
        from pose3d_tpu.serving import quantize_teacher_resnet

        tv = {"variables": tv,
              "q8": quantize_teacher_resnet(tv, [np.asarray(im[:16])])}
    # donate the train state exactly as the trainer's jits do (trainer.py)
    kstep = jax.jit(steps_lib.make_kd_crd_step(
        student, teacher, int8_teacher=args.int8_teacher),
        donate_argnums=(0,))

    try:
        cost = kstep.lower(sstate, tv, batch).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception:
        step_flops = 0.0

    for _ in range(args.warmup):
        sstate, m = kstep(sstate, tv, batch)
        np.asarray(m["loss"])

    # measurement protocol (docs/PERF.md round 3, slope refinement round 4):
    # --repeats>1 runs R timing samples and reports the MEDIAN, plus the
    # spread and a chip-load proxy, so a single pass/fail number survives
    # multi-tenant noise. Each sample is the SLOPE between a `steps`- and a
    # `3*steps`-step sync window — the axon tunnel adds a ~35 ms fixed
    # pipeline-fill per sync window (the same artifact the contention proxy
    # cancels the same way) which a single-window mean smears over the
    # steps (~0.9 ms/step at 40-step windows = ~1.3% on this step). The
    # slope is the true back-to-back device step time; corroborated by the
    # profiler op-time sums (docs/PERF.md round 4).
    def window(n):
        nonlocal sstate
        t0 = time.perf_counter()
        for _ in range(n):
            sstate, m = kstep(sstate, tv, batch)
        np.asarray(m["loss"])
        return time.perf_counter() - t0

    runs = []
    for _ in range(max(args.repeats, 1)):
        dt = (window(3 * args.steps) - window(args.steps)) / (2 * args.steps)
        runs.append(bk / dt)

    samples_per_s = float(np.median(runs))
    dt_step = bk / samples_per_s
    out = {
        "metric": "kd_train_samples_per_s",
        "value": round(samples_per_s, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / A100_KD_SAMPLES_PER_S, 3),
    }
    if args.int8_teacher:
        out["int8_teacher"] = True
    if step_flops:
        out["step_tflops"] = round(step_flops / 1e12, 3)
        out["mfu"] = round(_mfu(step_flops, dt_step), 3)
    if args.repeats > 1:
        out["protocol"] = {
            "repeats": args.repeats,
            "steps_per_window": args.steps,
            "window_pair": [args.steps, 3 * args.steps],  # slope cancels fill
            "runs_samples_per_s": [round(r, 1) for r in runs],
            "spread_pct": round(100 * (max(runs) - min(runs)) / samples_per_s, 2),
            "contention_proxy": round(_contention_proxy(), 3),
        }
    return out


def _bench_student_infer(args) -> dict:
    from pose3d_tpu.models import BaselineEstimator
    from pose3d_tpu import geometry

    model = BaselineEstimator(img_feature_dim=2048, dtype=jnp.bfloat16,
                              width_mult=args.width_mult)
    im = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, args.img, args.img, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), im[:1], train=False)

    if args.metric == "student_infer_int8":
        # int8 PTQ serving path (pose3d_tpu/serving): same decode, same
        # batch; calibrated on one batch (random init — this measures
        # THROUGHPUT; accuracy-agreement evidence lives in the tests and
        # benchmarks/int8_student_eval.py on a trained checkpoint)
        from pose3d_tpu.serving import quantize_student, student_int8_infer

        q = quantize_student(variables, [np.asarray(im[:16])])

        @jax.jit
        def infer(qq, x):
            outputs = student_int8_infer(qq, x)
            return geometry.decode_predictions(tuple(outputs[:3]),
                                               tuple(outputs[3:]))

        variables = q  # reuse the timing loop below

    else:
        @jax.jit
        def infer(v, x):
            outputs, _ = model.apply(v, x, train=False)
            outputs = [o.astype(jnp.float32) for o in outputs]
            return geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]))

    # warmup / compile (np.asarray forces a full device->host sync;
    # block_until_ready returns early through the axon tunnel)
    for _ in range(args.warmup):
        np.asarray(infer(variables, im))

    # two-window slope: cancels the tunnel's fixed per-window pipeline fill
    # (same protocol as the kd_step metric / run_all.py; at bs 256 the fill
    # was depressing this number by ~4% vs the profiler's device time)
    def window(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = infer(variables, im)
        np.asarray(out)
        return time.perf_counter() - t0

    dt = (window(3 * args.steps) - window(args.steps)) / (2 * args.steps)
    img_per_s = args.batch / dt
    name = ("student_infer_int8_img_per_s"
            if args.metric == "student_infer_int8" else
            "student_infer_img_per_s")
    return {
        "metric": name,
        "value": round(img_per_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / 5000.0, 3),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--repeats", type=int, default=1,
                        help="timing windows for the median-of-N protocol "
                             "(kd_step only; 1 = single window, driver default)")
    parser.add_argument("--img", type=int, default=224)
    parser.add_argument("--metric", type=str, default="all",
                        choices=["all", "student_infer", "student_infer_int8",
                                 "kd_step"],
                        help="all (driver default): kd_step + student_infer,"
                             " one JSON line each, last line = serving line"
                             " carrying the KD headline inline")
    parser.add_argument("--width_mult", type=float, default=1.0,
                        help="student width multiplier (serving metrics; "
                             "the narrow-student KD extension)")
    parser.add_argument("--int8_teacher", action="store_true",
                        help="kd_step A/B: frozen teacher's resnet50 through "
                             "the int8 serving path (--int8_teacher regime "
                             "of trainingKD; serving/quant_teacher.py)")
    parser.add_argument("--fold_deep_pools", type=int, default=0,
                        help="kd_step A/B: fold deep conv+pool pairs with "
                             "conv index <= N (models/vgg.py; 0 = off)")
    args = parser.parse_args(argv)

    _wait_for_backend()

    if args.metric == "kd_step":
        print(json.dumps(_bench_kd_step(args)))
        return
    if args.metric in ("student_infer", "student_infer_int8"):
        print(json.dumps(_bench_student_infer(args)))
        return

    # --metric all (driver default): KD headline first (its line is visible
    # in the artifact on its own), then serving; the LAST line keeps the
    # {metric, value, unit, vs_baseline} contract and carries the KD number
    # inline so one parsed line holds both headlines (VERDICT r3 weak #3).
    args.repeats = max(args.repeats, 3)  # median-of-N for the headline
    kd = _bench_kd_step(args)
    print(json.dumps(kd), flush=True)
    args.metric = "student_infer"
    serving = _bench_student_infer(args)
    serving["kd_train_samples_per_s"] = kd["value"]
    serving["kd_vs_baseline"] = kd["vs_baseline"]
    print(json.dumps(serving))


if __name__ == "__main__":
    main()
