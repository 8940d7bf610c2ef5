"""Shared building blocks for the Flax models.

Initialization parity notes (vs /root/reference/auxiliary/utils.py:23-36
`KaiMingInit`, which every from-scratch run applies):
  * Conv kernels:  kaiming_normal with leaky-relu slope a=0.2, fan_in
                   (torch.nn.init.kaiming_normal_(w, a=0.2) defaults).
  * Dense kernels: normal(std=1e-3).
  * All biases:    zeros. BatchNorm: scale=1, bias=0 (flax default).

Dtype policy: `dtype` is the compute dtype (bfloat16 on TPU for speed),
`param_dtype` stays float32. BatchNorm statistics are always computed in
float32 regardless of compute dtype (flax does the right thing via
`dtype=None` promotion; we pass dtype explicitly for the affine output).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name
from jax.nn.initializers import variance_scaling, normal, zeros

Dtype = Any

# torch kaiming_normal_(a=0.2): gain^2 = 2 / (1 + a^2), mode fan_in
kaiming_leaky02 = variance_scaling(2.0 / (1.0 + 0.2**2), "fan_in", "truncated_normal")
dense_init_1e3 = normal(stddev=1e-3)


def bn_mask(mask: jnp.ndarray | None, x: jnp.ndarray,
            axis_name: str | None = None) -> jnp.ndarray | None:
    """Broadcast a per-sample validity mask (N,) to x's rank for
    flax BatchNorm's `mask` argument, so PADDED batch rows are excluded
    from the batch statistics (mean/var computed over valid rows only).

    Used when the global batch is padded up to a device-count multiple
    (parallel/mesh.pad_batch): with the mask, the padded run's BN stats —
    and therefore every downstream activation of the valid rows — are
    bit-identical to the unpadded batch's.

    Exact ONLY under the GSPMD jit path (axis_name=None), where the masked
    reduction sees the whole global batch. Under per-shard sync-BN
    (axis_name set, shard_map/pmap), flax pmean-averages per-shard masked
    means UNWEIGHTED, which biases the stats whenever valid counts differ
    across shards — exactly the padded-batch case — so that combination is
    rejected."""
    if mask is None:
        return None
    if axis_name is not None:
        raise ValueError(
            "bn_mask with axis_name sync-BN is unsupported: flax averages "
            "per-shard masked means unweighted across shards, biasing BN "
            "stats when shards hold different valid counts. Use the GSPMD "
            "jit path (axis_name=None) for padded batches.")
    return mask.reshape(mask.shape[:1] + (1,) * (x.ndim - 1))


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ optional ReLU) in NHWC.

    BatchNorm semantics match torch BatchNorm2d: momentum 0.1 (flax
    `momentum` is the decay of the running average = 1 - torch momentum),
    eps 1e-5.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = None  # None -> torch-style symmetric ((k-1)//2): for
    # stride-2 convs XLA "SAME" places the pad asymmetrically (low=0, high=1),
    # which misaligns windows vs torch padding=1 and breaks ckpt-import parity
    use_relu: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None  # set for sync-BN across data shards (shard_map)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        padding = self.padding
        if padding is None:
            padding = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel_size]
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=padding,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_leaky02,
        )(x)
        # remat-policy anchor: under ResNet(remat_policy="conv_out"), only
        # tensors named here survive to the backward; the BN/relu elementwise
        # chain is recomputed from them instead of being stored (no-op
        # otherwise)
        x = checkpoint_name(x, "conv_out")
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name if train else None,
        )(x, mask=bn_mask(mask, x, self.axis_name) if train else None)
        if self.use_relu:
            x = nn.relu(x)
        # second anchor: the post-BN/relu activation — the tensor the
        # "elementwise" remat policy chooses to recompute rather than store
        x = checkpoint_name(x, "convbn_act")
        return x


class DenseBNRelu(nn.Module):
    """Linear + BatchNorm1d + ReLU, the reference's MLP block
    (e.g. `compress`, auxiliary/model.py:34-36)."""

    features: int
    use_relu: bool = True
    dtype: Dtype = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        x = nn.Dense(
            self.features,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=dense_init_1e3,
            bias_init=zeros,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name if train else None,
        )(x, mask=bn_mask(mask, x, self.axis_name) if train else None)
        if self.use_relu:
            x = nn.relu(x)
        return x


def head_dense(features: int, dtype: Dtype = jnp.float32) -> nn.Dense:
    """A plain Linear head (fc_cls_* / fc_reg_*), KaiMingInit'ed std=1e-3."""
    return nn.Dense(
        features,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=dense_init_1e3,
        bias_init=zeros,
    )
