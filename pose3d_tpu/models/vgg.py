"""Flax VGG (the student backbone).

Capability parity with /root/reference/auxiliary/vgg.py: torchvision-style
VGG with config A/B/D/E, classifier 512*7*7 -> 4096 -> 4096 -> num_classes
with dropout after the first two ReLUs (vgg.py:39-55). The student uses
vgg11(num_classes=2048) (auxiliary/model.py:28) and forward returns a single
tensor.

TPU-first: NHWC, static shapes, dtype-parameterized for bf16 MXU compute.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.common import kaiming_leaky02, dense_init_1e3, bn_mask
from jax.nn.initializers import zeros

CFG = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M",
          512, 512, 512, 512, "M"],
}


class _ConvPool2x2(nn.Module):
    """SAME 3x3 conv + 2x2/2 max pool, folded into 4 stride-2 phase convs
    and an elementwise max — the TPU form of the VGG stem.

    conv[h] = sum_u x[h-1+u] K[u]; pooled y[p] = max_{dy,dx} conv[2p+dy, 2q+dx].
    Each phase (dy, dx) is a stride-2 conv with K zero-embedded into a 4x4
    kernel at offset (dy, dx) and padding (1, 1): out_dy[p] = conv[2p+dy]
    exactly. The max over the 4 phase outputs runs at 1/4 resolution and its
    backward is an elementwise select — no select-and-scatter, no 224x224
    intermediate in fwd OR bwd (the XLA pool-form spent ~11 ms/step there;
    docs/PERF.md round-2 trace table). The bias is added AFTER the max
    (per-channel constant commutes with max), so its gradient reduce is also
    1/4-size.

    First-tie-wins across phases in row-major (dy, dx) order via the
    `where(a >= b, a, b)` chain — gradient routing identical to torch's
    MaxPool2d scan order (reference student, auxiliary/vgg.py:60).

    Param tree matches nn.Conv ({kernel (3,3,C,F), bias (F,)}) and callers
    pass name="Conv_i", so checkpoints and the torch import/export maps are
    unchanged.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", kaiming_leaky02,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        f = self.features
        # one conv with 4F output channels instead of 4 separate convs: 4x
        # the output-channel tile utilization on the MXU and a single weight
        # gradient over the image (4 separate phase convs measured ~4.4 ms of
        # phase wgrads at bs=138)
        k4 = jnp.concatenate(
            [jnp.pad(k, ((dy, 1 - dy), (dx, 1 - dx), (0, 0), (0, 0)))
             for dy in (0, 1) for dx in (0, 1)], axis=3)
        dn = jax.lax.conv_dimension_numbers(x.shape, k4.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y4 = jax.lax.conv_general_dilated(
            x, k4, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
        # max over the 4 phase channel-groups via a where-chain (autodiff
        # backward). A custom VJP storing a u8 argmax residual instead of the
        # three pred tensors measured ~3% SLOWER (612.8 vs 630.3 samples/s):
        # u8's (32,128) tiling pads worse than the preds XLA keeps.
        p0, p1, p2, p3 = (y4[..., i * f:(i + 1) * f] for i in range(4))
        m01 = jnp.where(p0 >= p1, p0, p1)
        m23 = jnp.where(p2 >= p3, p2, p3)
        y = jnp.where(m01 >= m23, m01, m23)
        return y + bias.astype(self.dtype)


class _ConvPool2x2Deep(nn.Module):
    """SAME 3x3 conv + 2x2/2 max pool folded as FOUR stride-2 phase convs
    that SHARE the original 3x3 kernel, with per-phase padding — the
    MAC-preserving deep-layer variant of _ConvPool2x2.

    The stem fold zero-embeds the 3x3 taps in a 4x4 kernel (16/9 the MACs),
    which only pays at C_in=3 where the MXU is idle anyway. Here instead each
    phase (dy, dx) is `conv(x, K, stride 2, padding ((1-dy, dy), (1-dx, dx)))`
    so out_dydx[p, q] = conv[2p+dy, 2q+dx] exactly with the ORIGINAL kernel:
    total MACs across the 4 phases equal the unfolded conv's (each phase
    computes a quarter of the positions), and the four weight gradients sum
    to the one wgrad by linearity. What changes is the backward: the pool's
    select-and-scatter over the full-resolution conv output disappears in
    favor of an elementwise where-select chain at 1/4 resolution (the
    remaining ~3 ms of deep-pool SAS in the KD step profile — docs/PERF.md
    round 2). First-tie-wins across phases in row-major (dy, dx) order
    matches torch MaxPool2d scan order, like the stem. Bias added after the
    max (commutes). Param tree matches nn.Conv ({kernel (3,3,C,F), bias});
    callers pass name="Conv_i" — checkpoints and torch import/export are
    unchanged."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", kaiming_leaky02,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        phases = [
            jax.lax.conv_general_dilated(
                x, k, (2, 2), ((1 - dy, dy), (1 - dx, dx)),
                dimension_numbers=dn)
            for dy in (0, 1) for dx in (0, 1)]
        p0, p1, p2, p3 = phases
        m01 = jnp.where(p0 >= p1, p0, p1)
        m23 = jnp.where(p2 >= p3, p2, p3)
        y = jnp.where(m01 >= m23, m01, m23)
        return y + bias.astype(self.dtype)


class _PrePoolConv(nn.Module):
    """SAME 3x3 conv whose bias is returned instead of added: a per-channel
    constant commutes with max-pool (max(x+b) = max(x)+b), so the caller adds
    it AFTER the following 2x2 pool — the bias add, its gradient reduce and
    the fused cotangent pass then run at 1/4 resolution (the full-res
    bias-grad tuple fusions were ~3 ms/step of the KD step; docs/PERF.md).
    Param tree matches nn.Conv ({kernel, bias}); callers pass name="Conv_i"."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        kernel = self.param("kernel", kaiming_leaky02,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)
        return y, bias.astype(self.dtype)


class VGG(nn.Module):
    cfg: Sequence
    num_classes: int = 1000
    batch_norm: bool = False
    dropout_rate: float = 0.5
    dtype: Any = jnp.float32
    axis_name: str | None = None
    width_mult: float = 1.0  # extension: narrower students for faster
    # inference — the natural target of the KD pipeline (not in the reference)
    # fold DEEP conv+pool pairs with conv index <= this into 4 shared-kernel
    # stride-2 phase convs (_ConvPool2x2Deep; exact, MAC-preserving) —
    # removes those pools' select-and-scatter backwards. 0 = stem fold only.
    # Measured on-chip at the KD workload: NEGATIVE at every depth (all-four
    # 0.92x, conv2-only 0.97x vs the SAS baseline on a quiet chip) — the 4
    # separate dgrads/input re-reads cost more than SAS; kept as a tested
    # experiment record. docs/PERF.md round 3.
    fold_deep_pools: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
        cfg = list(self.cfg)
        conv_i = 0
        i = 0
        while i < len(cfg):
            v = cfg[i]
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.relu(x)  # deferred from the preceding conv (see below)
                i += 1
                continue
            if self.width_mult != 1.0:
                v = max(16, int(round(v * self.width_mult / 16)) * 16)
            # conv immediately followed by a pool, no BN in between: fold the
            # pool into the conv as stride-2 phase convolutions + an
            # elementwise max (_ConvPool2x2) — removes XLA's select-and-
            # scatter backward and the whole full-resolution stem cluster
            # (~11 ms of the 75 ms KD step at 224x224x64; docs/PERF.md).
            # Only done for the stem (conv_i == 0): the folded kernel embeds
            # 3x3 taps in a 4x4 window (16/9 the MACs), which only pays where
            # MXU utilization is hopeless anyway (C_in=3); the deeper convs
            # run near full tile utilization and their SAS ops are <2 ms
            # combined, so the +78% MACs would be a net loss there.
            fold = ((conv_i == 0 or conv_i <= int(self.fold_deep_pools))
                    and not self.batch_norm
                    and i + 1 < len(cfg) and cfg[i + 1] == "M"
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            if fold:
                fold_cls = _ConvPool2x2 if conv_i == 0 else _ConvPool2x2Deep
                x = fold_cls(features=v, dtype=self.dtype,
                             name=f"Conv_{conv_i}")(x)
                i += 2  # consumed the "M" as well
            elif (not self.batch_norm and i + 1 < len(cfg)
                  and cfg[i + 1] == "M"):
                # pre-pool conv: bias deferred past the pool (commutes with
                # max), pool + bias + relu all at 1/4 resolution
                y, b = _PrePoolConv(features=v, dtype=self.dtype,
                                    name=f"Conv_{conv_i}")(x)
                x = nn.max_pool(y, (2, 2), strides=(2, 2)) + b
                i += 2  # consumed the "M" as well
                conv_i += 1
                x = nn.relu(x)
                continue
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=kaiming_leaky02, bias_init=zeros,
                            name=f"Conv_{conv_i}")(x)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     axis_name=self.axis_name if train else None)(
                        x, mask=bn_mask(mask, x, self.axis_name) if train else None)
                i += 1
            conv_i += 1
            # relu and max-pool are both monotone, so they commute:
            # pool(relu(x)) == relu(pool(x)). When a pool follows, apply
            # relu AFTER it — the elementwise op and its backward mask
            # then run at 1/4 resolution, and the full-res relu recompute
            # in the KD step's backward (broadcast_maximum_fusion,
            # ~5 ms/step at 224x224x64) disappears. Same outputs as the
            # reference order (torchvision vgg, auxiliary/vgg.py:60).
            if fold or not (i < len(cfg) and cfg[i] == "M"):
                x = nn.relu(x)

        # classifier: flatten 7x7x512 -> 4096 -> 4096 -> num_classes
        x = x.reshape(x.shape[0], -1)
        for _ in range(2):
            x = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32,
                         kernel_init=dense_init_1e3, bias_init=zeros)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=dense_init_1e3, bias_init=zeros)(x)
        return x


def _make(cfg_key: str, batch_norm: bool = False):
    def ctor(num_classes: int = 1000, dtype: Any = jnp.float32,
             axis_name: str | None = None, width_mult: float = 1.0,
             dropout_rate: float = 0.5, fold_deep_pools: int = 0) -> VGG:
        return VGG(cfg=CFG[cfg_key], num_classes=num_classes, batch_norm=batch_norm,
                   dtype=dtype, axis_name=axis_name, width_mult=width_mult,
                   dropout_rate=dropout_rate, fold_deep_pools=fold_deep_pools)

    return ctor


vgg11 = _make("A")
vgg11_bn = _make("A", batch_norm=True)
vgg13 = _make("B")
vgg13_bn = _make("B", batch_norm=True)
vgg16 = _make("D")
vgg16_bn = _make("D", batch_norm=True)
vgg19 = _make("E")
vgg19_bn = _make("E", batch_norm=True)
