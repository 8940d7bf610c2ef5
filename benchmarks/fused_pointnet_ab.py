"""On-chip A/B: teacher train step (bs=160, bf16) across variants:
xla (baseline), fused (Pallas train-mode PointNet), remat (ResNet block
rematerialization), remat+fused.

Round-3 context (docs/PERF.md): the teacher step is HBM-traffic bound
(XLA cost analysis: 65.3 GB @ 79 ms ~= v5e bandwidth roofline). The PointNet
branch materializes (160, 2500, 1024) activations that exist only to be
max-reduced; the fused path keeps them in VMEM.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fused_pointnet_ab.py
"""

from __future__ import annotations

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

from pose3d_tpu.models import PoseEstimator
from pose3d_tpu.train import create_train_state, torch_style_adam
from pose3d_tpu.train import steps as steps_lib


def _time(fn, *args, steps=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="xla,fused",
                    help="comma list of: xla fused remat remat_fused")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    bt = 160
    imt = jnp.asarray(rng.standard_normal((bt, 224, 224, 3)).astype(np.float32))
    pct = jnp.asarray(rng.random((bt, 2500, 3)).astype(np.float32))
    label = jnp.asarray(np.stack([rng.integers(0, 360, bt),
                                  rng.integers(0, 180, bt),
                                  rng.integers(0, 360, bt)], 1).astype(np.int32))
    batch = {"im": imt, "shape": pct, "label": label}

    results = {}
    variants = {"xla": {}, "fused": {"use_fused_pointnet": True},
                "remat": {"remat": "full"},
                "remat_ew": {"remat": "elementwise"},
                "remat_fused": {"remat": "full", "use_fused_pointnet": True}}
    for name in args.variants.split(","):
        kw = variants[name]
        teacher = PoseEstimator(shape="PointCloud", img_feature_dim=1024,
                                shape_feature_dim=1024, dtype=jnp.bfloat16,
                                **kw)
        tstate = create_train_state(teacher, (imt[:1], pct[:1]),
                                    jax.random.key(2), torch_style_adam(1e-4))
        tstep = jax.jit(steps_lib.make_teacher_train_step(teacher),
                        donate_argnums=(0,))
        box = [tstate]

        def run(b):
            box[0], m = tstep(box[0], b)
            return m["loss"]

        t_c0 = time.perf_counter()
        loss0 = float(run(batch))
        print(f"[{name}] first step (compile) {time.perf_counter()-t_c0:.1f}s "
              f"loss {loss0:.4f}", flush=True)
        dt = _time(run, batch, steps=args.steps)
        try:
            cost = tstep.lower(box[0], batch).compile().cost_analysis()
            gb = float(cost.get("bytes accessed", 0.0)) / 1e9
            tf = float(cost.get("flops", 0.0)) / 1e12
        except Exception:
            gb = tf = 0.0
        results[name] = dict(step_ms=dt * 1e3, img_per_s=bt / dt,
                             bytes_gb=gb, tflops=tf,
                             mfu=tf * 1e12 / (dt or 1) / 197e12)
        print(json.dumps({name: {k: round(v, 3) for k, v in results[name].items()}}),
              flush=True)

    if "xla" in results:
        for name, r in results.items():
            if name != "xla":
                print(json.dumps({
                    f"speedup_{name}": round(results["xla"]["step_ms"] / r["step_ms"], 4),
                }), flush=True)


if __name__ == "__main__":
    main()
