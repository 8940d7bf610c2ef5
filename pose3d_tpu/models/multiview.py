"""Multi-view render shape encoders.

Capability parity with /root/reference/auxiliary/model.py:103-150:
ShapeEncoderMV folds the K view axis into the batch, encodes each render with
a ResNet-18, and concatenates the K per-view fc features per sample (flat
(N, K*D)); ShapeEncoderMVRaw keeps (N, K, D).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.resnet import resnet18


class ShapeEncoderMV(nn.Module):
    """Input (N, K, H, W, C) renders, output (N, K * feature_dim)."""

    feature_dim: int = 256
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, renders: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        n, k = renders.shape[0], renders.shape[1]
        x = renders.reshape((n * k,) + renders.shape[2:])
        if mask is not None:  # fold the mask with the view axis: (N,) -> (N*K,)
            mask = jnp.repeat(mask, k, axis=0)
        _, feat = resnet18(num_classes=self.feature_dim, dtype=self.dtype,
                           axis_name=self.axis_name)(x, train, mask)
        return feat.reshape(n, -1)


class ShapeEncoderMVRaw(nn.Module):
    """Input (N, K, H, W, C) renders, output (N, K, feature_dim)."""

    feature_dim: int = 256
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, renders: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        n, k = renders.shape[0], renders.shape[1]
        x = renders.reshape((n * k,) + renders.shape[2:])
        if mask is not None:
            mask = jnp.repeat(mask, k, axis=0)
        _, feat = resnet18(num_classes=self.feature_dim, dtype=self.dtype,
                           axis_name=self.axis_name)(x, train, mask)
        return feat.reshape(n, k, -1)
