"""Benchmark matrix runner: measures every BASELINE.md workload on the local
chip and emits one JSON line per metric (bench.py stays the single-line
headline for the driver; this is the full matrix).

Usage: python benchmarks/run_all.py [--quick]
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


def _sync(x):
    jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") and a.size <= 16
                 else None, x)
    # always force at least one scalar transfer
    leaves = [a for a in jax.tree.leaves(x) if hasattr(a, "shape")]
    if leaves:
        np.asarray(leaves[0].ravel()[0])


def _time(fn, *args, steps=10):
    """Per-step device time via the two-window slope: time a `steps`-step
    and a `3*steps`-step sync window and divide the difference by the extra
    steps. The axon tunnel adds a ~35 ms fixed pipeline-fill per sync window
    (PERF.md round-3 protocol note) which a single-window mean smears over
    the steps — at 10-step windows that inflated every fast train-step row
    by ~3.5 ms/step (stage-1 by ~9%). The slope cancels the fixed cost
    exactly, same technique as bench.py's contention proxy."""
    out = fn(*args)
    _sync(out)

    def window(n):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        return time.perf_counter() - t0

    t1 = window(steps)
    t2 = window(3 * steps)
    return (t2 - t1) / (2 * steps)


def emit(metric, value, unit, baseline=None, **extra):
    rec = {"metric": metric, "value": round(value, 2), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(value / baseline, 3)
    rec.update(extra)
    print(json.dumps(rec), flush=True)


def _peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    return 275e12 if "v4" in kind else 197e12


def _step_flops(jitted, *args):
    """XLA's own cost analysis for a compiled step (not hand-counted).
    Returns (flops, bytes_accessed) — bytes/time vs the ~819 GB/s v5e HBM
    peak is the roofline check that explains sub-35% MFU rows (PERF.md
    round 3: every train step with batch-stat BN is bandwidth-bound)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args(argv)
    steps = 5 if args.quick else 10

    from pose3d_tpu import geometry
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, torch_style_adam
    from pose3d_tpu.train import steps as steps_lib

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16

    # 1. student RGB inference (BASELINE config 1; target 5k img/s/chip)
    student = BaselineEstimator(img_feature_dim=2048, dtype=dtype)
    bi = 256
    im = jnp.asarray(rng.standard_normal((bi, 224, 224, 3)).astype(np.float32))
    sv = student.init(jax.random.key(0), im[:1], train=False)

    @jax.jit
    def infer(v, x):
        outputs, _ = student.apply(v, x, train=False)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]))

    dt = _time(infer, sv, im, steps=steps)
    emit("student_infer_img_per_s", bi / dt, "img/s", baseline=5000.0)

    # 2. teacher eval fwd (BASELINE config 2)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=1024,
                            shape_feature_dim=1024, dtype=dtype)
    bt = 160
    imt = jnp.asarray(rng.standard_normal((bt, 224, 224, 3)).astype(np.float32))
    pct = jnp.asarray(rng.random((bt, 2500, 3)).astype(np.float32))
    tv = teacher.init(jax.random.key(1), imt[:1], pct[:1], train=False)

    @jax.jit
    def teacher_fwd(v, x, p):
        outputs, _, _ = teacher.apply(v, x, p, train=False)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]))

    dt = _time(teacher_fwd, tv, imt, pct, steps=steps)
    teacher_eval_bf16 = bt / dt
    emit("teacher_eval_img_per_s", teacher_eval_bf16, "img/s")

    # 2b. teacher int8 serving (serving extension, not a reference workload:
    # resnet50 image encoder s8xs8->s32 with BN folded into the dequant
    # affine, shape/fusion tail bf16 — pose3d_tpu/serving/quant_teacher.py).
    # vs_baseline here = speedup over the bf16 teacher eval row above.
    from pose3d_tpu.serving import make_teacher_int8_infer, quantize_teacher_resnet

    q8 = quantize_teacher_resnet(tv, [np.asarray(imt[:16])])
    t8_infer = make_teacher_int8_infer(teacher)

    @jax.jit
    def teacher_int8_fwd(qq, v, x, p):
        outputs = t8_infer(qq, v, x, p)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]))

    dt = _time(teacher_int8_fwd, q8, tv, imt, pct, steps=steps)
    emit("teacher_eval_int8_img_per_s", bt / dt, "img/s",
         baseline=teacher_eval_bf16)

    # 3. teacher train step (BASELINE config 3: bs 160)
    tstate = create_train_state(teacher, (imt[:1], pct[:1]), jax.random.key(2),
                                torch_style_adam(1e-4))
    label = jnp.asarray(np.stack([rng.integers(0, 360, bt), rng.integers(0, 180, bt),
                                  rng.integers(0, 360, bt)], 1).astype(np.int32))
    # donate the train state exactly as the trainer's jits do (trainer.py)
    tstep = jax.jit(steps_lib.make_teacher_train_step(teacher),
                    donate_argnums=(0,))
    batch = {"im": imt, "shape": pct, "label": label}
    tbox = [tstate]

    def run_tstep(b):
        tbox[0], m = tstep(tbox[0], b)
        return m["loss"]

    tflops, tbytes = _step_flops(tstep, tbox[0], batch)
    dt = _time(run_tstep, batch, steps=steps)
    emit("teacher_train_img_per_s", bt / dt, "img/s")
    emit("teacher_train_step_ms", dt * 1000, "ms",
         step_tflops=round(tflops / 1e12, 3),
         mfu=round(tflops / dt / _peak_flops(), 3),
         bytes_gb=round(tbytes / 1e9, 1),
         hbm_gb_per_s=round(tbytes / dt / 1e9, 0))

    # 4. KD train step (BASELINE config 4: bs 46, 3x views)
    bk = 46
    imk = jnp.asarray(rng.standard_normal((bk, 224, 224, 3)).astype(np.float32))
    pck = jnp.asarray(rng.random((bk, 2500, 3)).astype(np.float32))
    labk = label[:bk]
    kd_batch = {"im": imk, "im_flip": imk, "im_rot": imk, "shape": pck,
                "label": labk, "label_flip": labk, "label_rot": labk}
    sstate = create_train_state(student, (imk[:1],), jax.random.key(3),
                                torch_style_adam(1e-4))
    kstep = jax.jit(steps_lib.make_kd_crd_step(student, teacher),
                    donate_argnums=(0,))
    sbox = [sstate]

    def run_kstep(tv_, b):
        sbox[0], m = kstep(sbox[0], tv_, b)
        return m["loss"]

    kflops, kbytes = _step_flops(kstep, sbox[0], tv, kd_batch)
    dt = _time(run_kstep, tv, kd_batch, steps=steps)
    emit("kd_train_samples_per_s", bk / dt, "samples/s",
         step_tflops=round(kflops / 1e12, 3),
         mfu=round(kflops / dt / _peak_flops(), 3),
         bytes_gb=round(kbytes / 1e9, 1),
         hbm_gb_per_s=round(kbytes / dt / 1e9, 0))
    emit("kd_train_step_ms", dt * 1000, "ms")

    # 5. stage-1 step (both models training, base_class.py:451-569; bs 46)
    from pose3d_tpu.models import PoseEstimatorVanilla

    vanilla = PoseEstimatorVanilla(shape="PointCloud", img_feature_dim=1024,
                                   shape_feature_dim=1024, dtype=dtype)
    vstate = create_train_state(vanilla, (imk[:1], pck[:1]), jax.random.key(4),
                                torch_style_adam(1e-4))
    s1state = create_train_state(student, (imk[:1],), jax.random.key(5),
                                 torch_style_adam(1e-4))
    s1_batch = {"im": imk, "shape": pck, "label": labk}
    s1step = jax.jit(steps_lib.make_stage1_step(vanilla, student),
                     donate_argnums=(0, 1))
    s1box = [vstate, s1state]

    def run_s1(b):
        s1box[0], s1box[1], m = s1step(s1box[0], s1box[1], b)
        return m["loss"]

    s1flops, s1bytes = _step_flops(s1step, s1box[0], s1box[1], s1_batch)
    dt = _time(run_s1, s1_batch, steps=steps)
    emit("stage1_train_samples_per_s", bk / dt, "samples/s",
         step_tflops=round(s1flops / 1e12, 3),
         mfu=round(s1flops / dt / _peak_flops(), 3),
         bytes_gb=round(s1bytes / 1e9, 1),
         hbm_gb_per_s=round(s1bytes / dt / 1e9, 0))
    emit("stage1_train_step_ms", dt * 1000, "ms")

    # 6. stage-2 step (frozen vanilla teacher, 3 views, base_class.py:571-688)
    v_eval_vars = {"params": s1box[0].params, "batch_stats": s1box[0].batch_stats}
    s2state = create_train_state(student, (imk[:1],), jax.random.key(6),
                                 torch_style_adam(1e-4))
    s2step = jax.jit(steps_lib.make_stage2_step(student, vanilla),
                     donate_argnums=(0,))
    s2box = [s2state]

    def run_s2(v_, b):
        s2box[0], m = s2step(s2box[0], v_, b)
        return m["loss"]

    s2flops, s2bytes = _step_flops(s2step, s2box[0], v_eval_vars, kd_batch)
    dt = _time(run_s2, v_eval_vars, kd_batch, steps=steps)
    emit("stage2_train_samples_per_s", bk / dt, "samples/s",
         step_tflops=round(s2flops / 1e12, 3),
         mfu=round(s2flops / dt / _peak_flops(), 3),
         bytes_gb=round(s2bytes / 1e9, 1),
         hbm_gb_per_s=round(s2bytes / dt / 1e9, 0))
    emit("stage2_train_step_ms", dt * 1000, "ms")


if __name__ == "__main__":
    main()
