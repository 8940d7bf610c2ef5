"""DeformNet fusion head.

Capability parity with /root/reference/auxiliary/model.py:183-203: the
reference runs a Conv1d MLP over a length-1 "sequence" —
bottleneck -> bottleneck -> bottleneck/2 -> bottleneck/4 -> 200 with
BatchNorm1d + ReLU between and tanh on the output. A Conv1d over length 1 IS
a Dense layer, and BatchNorm1d over (N, C, 1) reduces over the batch only, so
the TPU-native form is a plain Dense+BN MLP — no fake sequence axis.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.common import DenseBNRelu, head_dense


class DeformNet(nn.Module):
    bottleneck_size: int = 1024
    out_dim: int = 200
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        b = self.bottleneck_size
        for width in (b, b // 2, b // 4):
            x = DenseBNRelu(width, dtype=self.dtype,
                            axis_name=self.axis_name)(x, train, mask)
        x = head_dense(self.out_dim, self.dtype)(x)
        return jnp.tanh(x)
