"""PointNet-lite shape encoder (ShapeEncoderPC).

Capability parity with /root/reference/auxiliary/model.py:154-180:
Conv1d 3 -> 64 -> 128 -> feature_dim with BatchNorm1d on each, ReLU on the
first two, then a global max-pool over the point axis.

TPU-first design: a pointwise Conv1d is exactly a Dense applied per point, so
the encoder is three batched matmuls on a (N, P, C) channels-last tensor —
ideal MXU shape (P=2500 points ride the 8x128 VPU lanes / 128x128 MXU tiles
after XLA tiling). BatchNorm1d over (N, C, L) in torch normalizes per channel
across (N, L); flax BatchNorm on (N, P, C) with feature axis -1 does the same.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.common import dense_init_1e3, bn_mask
from jax.nn.initializers import zeros


class ShapeEncoderPC(nn.Module):
    """Input (N, P, 3) point cloud (channels last), output (N, feature_dim)."""

    feature_dim: int = 1024
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        x = points
        for i, (width, relu) in enumerate(((64, True), (128, True), (self.feature_dim, False))):
            x = nn.Dense(width, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=dense_init_1e3, bias_init=zeros)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             axis_name=self.axis_name if train else None)(
                x, mask=bn_mask(mask, x) if train else None)
            if relu:
                x = nn.relu(x)
        return jnp.max(x, axis=1)  # global max over points -> (N, feature_dim)
