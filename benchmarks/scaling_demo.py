"""Data-parallel scaling demo on a virtual CPU mesh (no TPU pod needed).

Runs the full KD train step over meshes of 1/2/4/8 devices at a FIXED global
batch and checks the loss is identical to 4 decimal places — demonstrating
that gradient psum, global-batch KL/NCE and sync-BN all hold under sharding
(the property that makes multi-chip training a drop-in change).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scaling_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() != "cpu" and len(jax.devices()) < 8:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pose3d_tpu.models import BaselineEstimator, PoseEstimator
from pose3d_tpu.parallel import make_mesh, replicate, shard_batch
from pose3d_tpu.train import create_train_state, steps, torch_style_adam


def main():
    img, pts, n = 32, 64, 8  # global batch 8 so every mesh size divides it
    student = BaselineEstimator(img_feature_dim=64)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=64,
                            shape_feature_dim=64)
    state = create_train_state(student, (jnp.zeros((1, img, img, 3)),),
                               jax.random.key(0), torch_style_adam(1e-4))
    t_vars = teacher.init(jax.random.key(1), jnp.zeros((1, img, img, 3)),
                          jnp.zeros((1, pts, 3)), train=False)
    rng = np.random.default_rng(0)
    batch = {
        "im": rng.standard_normal((n, img, img, 3)).astype(np.float32),
        "im_flip": rng.standard_normal((n, img, img, 3)).astype(np.float32),
        "im_rot": rng.standard_normal((n, img, img, 3)).astype(np.float32),
        "shape": rng.random((n, pts, 3)).astype(np.float32),
        "label": np.stack([rng.integers(0, 360, n), rng.integers(0, 180, n),
                           rng.integers(0, 360, n)], 1).astype(np.int32),
    }
    batch["label_flip"] = batch["label"]
    batch["label_rot"] = batch["label"]

    step = jax.jit(steps.make_kd_crd_step(student, teacher))
    losses = {}
    for n_dev in (1, 2, 4, 8):
        if len(jax.devices()) < n_dev:
            print(f"{n_dev} devices unavailable, skipping")
            continue
        mesh = make_mesh(jax.devices()[:n_dev])
        _, metrics = step(replicate(state, mesh), replicate(t_vars, mesh),
                          shard_batch(batch, mesh))
        losses[n_dev] = float(metrics["loss"])
        print(f"devices={n_dev}  per-device batch={n // n_dev}  "
              f"loss={losses[n_dev]:.6f}  acc={float(metrics['acc_rot']):.2f}")

    base = losses[min(losses)]
    for n_dev, loss in losses.items():
        assert abs(loss - base) < 1e-4, (n_dev, loss, base)
    print("OK: loss identical across mesh sizes at fixed global batch")


if __name__ == "__main__":
    main()
