"""PointNet-lite shape encoder (ShapeEncoderPC).

Capability parity with /root/reference/auxiliary/model.py:154-180:
Conv1d 3 -> 64 -> 128 -> feature_dim with BatchNorm1d on each, ReLU on the
first two, then a global max-pool over the point axis.

TPU-first design: a pointwise Conv1d is exactly a Dense applied per point, so
the encoder is three batched matmuls on a (N, P, C) channels-last tensor —
ideal MXU shape (P=2500 points ride the 8x128 VPU lanes / 128x128 MXU tiles
after XLA tiling). BatchNorm1d over (N, C, L) in torch normalizes per channel
across (N, L); flax BatchNorm on (N, P, C) with feature axis -1 does the same.

Round-3 rewrite: the Dense/BatchNorm params are declared MANUALLY with the
same variable tree as the previous nn.Dense/nn.BatchNorm submodules
(params/Dense_i/{kernel,bias}, params/BatchNorm_i/{scale,bias},
batch_stats/BatchNorm_i/{mean,var} — checkpoints, torch import/export and the
eval-mode fused kernel are untouched), and the forward is an explicit
replication of the flax semantics, pinned BIT-EXACT against nn.Dense +
nn.BatchNorm in tests/test_models.py::test_pointnet_manual_forward_bit_parity
(f32/bf16 x train/eval x masked/unmasked, including the running-stat update).

Why: owning the forward lets the train step swap in the fused Pallas
train-mode encoder (ops/pointnet_train_fused) that never materializes the
(N, P, 1024) activations in HBM — the teacher train step is HBM-bandwidth
bound and these tensors are ~25% of its traffic (docs/PERF.md round 3).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from pose3d_tpu.models.common import dense_init_1e3

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def dense_bn_forward(x, dense_p, bn_p, bn_stats, train: bool,
                     dtype, mask=None, axis_name: str | None = None,
                     relu: bool = True):
    """One Dense + BatchNorm (+ ReLU) layer, bit-exact vs flax
    nn.Dense(dtype=dtype) -> nn.BatchNorm(momentum=0.9, eps=1e-5,
    dtype=dtype). Returns (y, (batch_mean, batch_var) or None).

    `mask` is a bool (N,) row-validity mask (see models.common.bn_mask for
    why it excludes padded rows from the statistics)."""
    w = dense_p["kernel"].astype(dtype)
    b = dense_p["bias"].astype(dtype)
    x = jnp.dot(x.astype(dtype), w) + b

    if train:
        xf = x.astype(jnp.float32)
        if mask is None:
            mu = xf.mean((0, 1))
            mu2 = (xf * xf).mean((0, 1))
        else:
            m = jnp.broadcast_to(mask.reshape(-1, 1, 1), xf.shape)
            mu = jnp.mean(xf, (0, 1), where=m)
            mu2 = jnp.mean(xf * xf, (0, 1), where=m)
        if axis_name is not None:
            mu, mu2 = lax.pmean(jnp.stack([mu, mu2]), axis_name)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        stats = (mu, var)
    else:
        mu = bn_stats["mean"]
        var = bn_stats["var"]
        stats = None

    y = x - mu.reshape(1, 1, -1)
    mul = lax.rsqrt(var.reshape(1, 1, -1) + BN_EPS) * bn_p["scale"].reshape(1, 1, -1)
    y = y * mul
    y = y + bn_p["bias"].reshape(1, 1, -1)
    y = jnp.asarray(y, dtype)
    if relu:
        y = jax.nn.relu(y)
    return y, stats


class ShapeEncoderPC(nn.Module):
    """Input (N, P, 3) point cloud (channels last), output (N, feature_dim).

    use_fused_train=True routes the train-mode forward (unmasked, no
    axis_name) through the Pallas fused encoder
    (ops/pointnet_train_fused.pointnet_train_fused) — identical math, the
    (N, P, C) activations never touch HBM; masked/sync-BN calls fall back to
    the explicit XLA path.
    """

    feature_dim: int = 1024
    dtype: Any = jnp.float32
    axis_name: str | None = None
    use_fused_train: bool = False

    @nn.compact
    def __call__(self, points: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        dims = ((3, 64, True), (64, 128, True), (128, self.feature_dim, False))
        params, stats_vars = [], []
        for i, (din, dout, _) in enumerate(dims):
            params.append((
                self.param(f"Dense_{i}",
                           lambda k, din=din, dout=dout: {
                               "kernel": dense_init_1e3(k, (din, dout), jnp.float32),
                               "bias": jnp.zeros((dout,), jnp.float32)}),
                self.param(f"BatchNorm_{i}",
                           lambda k, dout=dout: {
                               "scale": jnp.ones((dout,), jnp.float32),
                               "bias": jnp.zeros((dout,), jnp.float32)}),
            ))
            stats_vars.append(self.variable(
                "batch_stats", f"BatchNorm_{i}",
                lambda dout=dout: {"mean": jnp.zeros((dout,), jnp.float32),
                                   "var": jnp.ones((dout,), jnp.float32)}))

        use_fused = (self.use_fused_train and train and mask is None
                     and self.axis_name is None and not self.is_initializing()
                     and jax.devices()[0].platform == "tpu")
        if use_fused:
            from pose3d_tpu.ops.pointnet_train_fused import pointnet_train_fused

            out, batch_stats = pointnet_train_fused(
                points, tuple((dict(d), dict(b)) for d, b in params),
                self.dtype)
        else:
            x = points
            batch_stats = []
            for (dense_p, bn_p), sv, (_, _, relu) in zip(params, stats_vars, dims):
                x, st = dense_bn_forward(
                    x, dense_p, bn_p, sv.value, train, self.dtype, mask=mask,
                    axis_name=self.axis_name if train else None, relu=relu)
                batch_stats.append(st)
            out = jnp.max(x, axis=1)  # global max over points

        if train and not self.is_initializing():
            for sv, (mu, var) in zip(stats_vars, batch_stats):
                sv.value = {
                    "mean": BN_MOMENTUM * sv.value["mean"] + (1 - BN_MOMENTUM) * mu,
                    "var": BN_MOMENTUM * sv.value["var"] + (1 - BN_MOMENTUM) * var,
                }
        return out
