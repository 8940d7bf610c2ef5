"""Benchmark harness: student RGB inference throughput on the local chip.

Prints ONE JSON line:
  {"metric": "student_infer_img_per_s", "value": N, "unit": "img/s",
   "vs_baseline": N / 5000.0}

The baseline divisor is the BASELINE.md north-star target of 5,000 images/s
per chip for the RGB-only student (the reference repo publishes no numbers —
BASELINE.md 'Published numbers': none).

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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--img", type=int, default=224)
    args = parser.parse_args(argv)

    from pose3d_tpu.models import BaselineEstimator
    from pose3d_tpu import geometry

    model = BaselineEstimator(img_feature_dim=2048, dtype=jnp.bfloat16)
    im = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (args.batch, args.img, args.img, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), im[:1], train=False)

    @jax.jit
    def infer(v, x):
        outputs, _ = model.apply(v, x, train=False)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return geometry.decode_predictions(tuple(outputs[:3]), tuple(outputs[3:]))

    # warmup / compile (np.asarray forces a full device->host sync;
    # block_until_ready returns early through the axon tunnel)
    for _ in range(args.warmup):
        np.asarray(infer(variables, im))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = infer(variables, im)
    np.asarray(out)
    dt = time.perf_counter() - t0

    img_per_s = args.batch * args.steps / dt
    print(json.dumps({
        "metric": "student_infer_img_per_s",
        "value": round(img_per_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / 5000.0, 3),
    }))


if __name__ == "__main__":
    main()
