"""Capture + parse a jax.profiler trace of the KD --crd train step on-chip.

Produces the op-level time breakdown the round-1 MFU work was missing
(VERDICT r1 item #3): which HLO ops the 80-90 ms actually goes to. Uses
tensorboard_plugin_profile's converters to read the xplane without a
tensorboard server.

  python benchmarks/profile_kd_step.py            # bs=46 reference workload
  python benchmarks/profile_kd_step.py --piece student_fwdbwd
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
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


def build_step(piece: str, bk: int, img: int):
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, torch_style_adam
    from pose3d_tpu.train import steps as steps_lib

    rng = np.random.default_rng(0)
    student = BaselineEstimator(img_feature_dim=2048, dtype=jnp.bfloat16)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=1024,
                            shape_feature_dim=1024, dtype=jnp.bfloat16)
    im = jnp.asarray(rng.standard_normal((bk, img, img, 3)).astype(np.float32))
    pc = jnp.asarray(rng.random((bk, 2500, 3)).astype(np.float32))
    label = jnp.asarray(np.stack(
        [rng.integers(0, 360, bk), rng.integers(0, 180, bk),
         rng.integers(0, 360, bk)], 1).astype(np.int32))

    if piece == "kd_step":
        tv = teacher.init(jax.random.key(1), im[:1], pc[:1], train=False)
        sstate = create_train_state(student, (im[:1],), jax.random.key(3),
                                    torch_style_adam(1e-4))
        batch = {"im": im, "im_flip": im, "im_rot": im, "shape": pc,
                 "label": label, "label_flip": label, "label_rot": label}
        kstep = jax.jit(steps_lib.make_kd_crd_step(student, teacher),
                        donate_argnums=(0,))

        def run(state):
            state, m = kstep(state, tv, batch)
            return state, m["loss"]

        return run, sstate
    if piece in ("teacher_step", "teacher_step_fused"):
        # BASELINE config 3: teacher train step, bs 160 (override with --batch)
        if piece == "teacher_step_fused":
            teacher = PoseEstimator(shape="PointCloud", img_feature_dim=1024,
                                    shape_feature_dim=1024, dtype=jnp.bfloat16,
                                    use_fused_pointnet=True)
        bt = bk if bk != 46 else 160
        imt = jnp.asarray(rng.standard_normal((bt, img, img, 3)).astype(np.float32))
        pct = jnp.asarray(rng.random((bt, 2500, 3)).astype(np.float32))
        labt = jnp.asarray(np.stack(
            [rng.integers(0, 360, bt), rng.integers(0, 180, bt),
             rng.integers(0, 360, bt)], 1).astype(np.int32))
        tstate = create_train_state(teacher, (imt[:1], pct[:1]),
                                    jax.random.key(2), torch_style_adam(1e-4))
        tstep = jax.jit(steps_lib.make_teacher_train_step(teacher),
                        donate_argnums=(0,))
        batch = {"im": imt, "shape": pct, "label": labt}

        def run(state):
            state, m = tstep(state, batch)
            return state, m["loss"]

        return run, tstate
    if piece == "stage1_step":
        # run_all.py row 5: both models train (base_class.py:451-569), bs 46
        from pose3d_tpu.models import PoseEstimatorVanilla

        vanilla = PoseEstimatorVanilla(shape="PointCloud", img_feature_dim=1024,
                                       shape_feature_dim=1024,
                                       dtype=jnp.bfloat16)
        vstate = create_train_state(vanilla, (im[:1], pc[:1]),
                                    jax.random.key(4), torch_style_adam(1e-4))
        s1state = create_train_state(student, (im[:1],), jax.random.key(5),
                                     torch_style_adam(1e-4))
        batch = {"im": im, "shape": pc, "label": label}
        s1step = jax.jit(steps_lib.make_stage1_step(vanilla, student),
                         donate_argnums=(0, 1))

        def run(state):
            vs, ss, m = s1step(state[0], state[1], batch)
            return (vs, ss), m["loss"]

        return run, (vstate, s1state)
    if piece == "student_fwdbwd":
        b3 = 3 * bk
        im3 = jnp.concatenate([im] * 3, axis=0)
        lab3 = jnp.concatenate([label] * 3, axis=0)
        sstate = create_train_state(student, (im[:1],), jax.random.key(3),
                                    torch_style_adam(1e-4))
        from pose3d_tpu.losses import pose_loss

        def loss_fn(params, bs, rng_):
            (out, feat), mut = student.apply(
                {"params": params, "batch_stats": bs}, im3, train=True,
                rngs={"dropout": rng_}, mutable=["batch_stats"])
            out = [o.astype(jnp.float32) for o in out]
            return pose_loss(out, lab3), mut["batch_stats"]

        @jax.jit
        def run(state):
            (l, new_bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, state.rng)
            state = state.apply_gradients(g, new_batch_stats=new_bs,
                                          new_rng=state.rng)
            return state, l

        return run, sstate
    raise SystemExit(f"unknown piece {piece}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--piece", default="kd_step",
                    choices=["kd_step", "student_fwdbwd", "stage1_step",
                             "teacher_step",
                             "teacher_step_fused"])
    ap.add_argument("--batch", type=int, default=46)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    run, state = build_step(args.piece, args.batch, args.img)
    # compile + warm
    for _ in range(3):
        state, loss = run(state)
        np.asarray(loss)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="pose3d_prof_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        state, loss = run(state)
    np.asarray(loss)
    jax.profiler.stop_trace()
    dt = (time.perf_counter() - t0) / args.steps
    print(f"{args.piece}: {dt * 1e3:.1f} ms/step (host-timed incl. dispatch)")

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print(f"no xplane found under {trace_dir}")
        return
    print(f"trace: {xplanes[0]}")
    summarize_xplane(xplanes[0], args.steps, args.top)


def summarize_xplane(path: str, n_steps: int, top: int) -> None:
    """Direct XSpace parse: per-op device time on the TPU plane.

    The tensorboard_plugin_profile converters in this image are broken
    (protobuf descriptor mismatch + missing TF pywrap symbol), so read the
    xplane proto with tensorflow's generated schema instead."""
    import collections

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    planes = [p for p in xs.planes if p.name.startswith("/device:TPU")]
    if not planes:
        print("no TPU plane in trace")
        return
    plane = planes[0]
    md = plane.event_metadata
    for line in plane.lines:
        if "Ops" not in line.name or "Async" in line.name:
            continue
        agg = collections.Counter()
        for e in line.events:
            agg[md[e.metadata_id].name] += e.duration_ps
        tot = sum(agg.values())
        print(f"\n== {line.name}: {tot / 1e9 / n_steps:.2f} ms/step, "
              f"top {top} ==")
        for name, ps in agg.most_common(top):
            print(f"  {ps / 1e9 / n_steps:8.3f} ms {100 * ps / tot:5.1f}%  "
                  f"{name[:95]}")


if __name__ == "__main__":
    main()
