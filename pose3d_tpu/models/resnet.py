"""Flax ResNet with the reference's two-output forward.

Capability parity with /root/reference/auxiliary/resnet.py: a torchvision-
style ResNet parameterized by `input_channel`, `num_classes` and `features`,
whose forward returns BOTH the pre-fc globally-pooled feature and the fc
output (resnet.py:148-151) — the teacher uses the fc output as its 1024-d
image feature while checkpointing code wants the raw pooled feature.

TPU-first design: NHWC layout, compute dtype configurable (bfloat16 for the
MXU), all shapes static, no Python control flow on traced values.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.common import ConvBN, head_dense


class BasicBlock(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    axis_name: str | None = None

    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train, mask)
        y = ConvBN(self.features, (3, 3), use_relu=False, dtype=self.dtype,
                   axis_name=self.axis_name)(y, train, mask)
        if residual.shape != y.shape:
            residual = ConvBN(self.features * self.expansion, (1, 1), self.strides,
                              use_relu=False, dtype=self.dtype,
                              axis_name=self.axis_name)(x, train, mask)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    axis_name: str | None = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        residual = x
        y = ConvBN(self.features, (1, 1), dtype=self.dtype,
                   axis_name=self.axis_name)(x, train, mask)
        y = ConvBN(self.features, (3, 3), self.strides, dtype=self.dtype,
                   axis_name=self.axis_name)(y, train, mask)
        y = ConvBN(self.features * self.expansion, (1, 1), use_relu=False,
                   dtype=self.dtype, axis_name=self.axis_name)(y, train, mask)
        if residual.shape != y.shape:
            residual = ConvBN(self.features * self.expansion, (1, 1), self.strides,
                              use_relu=False, dtype=self.dtype,
                              axis_name=self.axis_name)(x, train, mask)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns (pooled_feature, fc_output) like the reference forward."""

    stage_sizes: Sequence[int]
    block_cls: type
    num_classes: int = 1000
    features: int = 64
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # rematerialize per residual block in the backward pass. The bs-160
    # teacher train step is HBM-bandwidth bound (~99% of the v5e roofline:
    # 65.3 GB / 80.6 ms — docs/PERF.md round 3), so recomputing COULD beat
    # re-reading; measured on-chip it does not: "full" (save only block
    # inputs) = 96.4 ms / 74.4 GB (0.84x — XLA re-writes the recomputed
    # activations), "elementwise" (save conv outputs, recompute the BN/relu
    # chains via the checkpoint_name anchors in ConvBN) = 136.6 ms / 114 GB
    # (0.59x). Kept flag-gated OFF as a tested experiment record; may help
    # at batch sizes that otherwise OOM. None | "full" | "elementwise".
    remat: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None):
        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool. relu and max-pool
        # commute (both monotone), so relu runs AFTER the pool at 1/4
        # resolution — bit-identical output (relu(pool(x)) == pool(relu(x))),
        # and the backward's full-res relu mask/recompute at 112x112x64
        # disappears (same trick as models/vgg.py; docs/PERF.md round 2).
        x = ConvBN(self.features, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                   use_relu=False, dtype=self.dtype,
                   axis_name=self.axis_name)(x, train, mask)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = nn.relu(x)

        # (self=0, x=1, train=2): train is python control flow, so static.
        # Explicit names pin the auto-naming of the non-remat path
        # (Bottleneck_k / BasicBlock_k), so checkpoints are interchangeable.
        if self.remat:
            policy = (None if self.remat == "full" else
                      jax.checkpoint_policies.save_anything_except_these_names(
                          "convbn_act"))
            block_cls = nn.remat(self.block_cls, static_argnums=(2,),
                                 policy=policy)
        else:
            block_cls = self.block_cls
        k = 0
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = block_cls(self.features * (2**i), strides,
                              dtype=self.dtype, axis_name=self.axis_name,
                              name=f"{self.block_cls.__name__}_{k}")(
                                  x, train, mask)
                k += 1

        feat = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, C)
        out = head_dense(self.num_classes, self.dtype)(feat)
        return feat, out


def _make(stage_sizes, block_cls):
    def ctor(num_classes: int = 1000, input_channel: int = 3, features: int = 64,
             dtype: Any = jnp.float32, axis_name: str | None = None,
             remat: str | None = None) -> ResNet:
        del input_channel  # NHWC input channel count is inferred from the input
        return ResNet(stage_sizes=stage_sizes, block_cls=block_cls,
                      num_classes=num_classes, features=features, dtype=dtype,
                      axis_name=axis_name, remat=remat)

    return ctor


resnet18 = _make([2, 2, 2, 2], BasicBlock)
resnet34 = _make([3, 4, 6, 3], BasicBlock)
resnet50 = _make([3, 4, 6, 3], Bottleneck)
resnet101 = _make([3, 4, 23, 3], Bottleneck)
resnet152 = _make([3, 8, 36, 3], Bottleneck)
