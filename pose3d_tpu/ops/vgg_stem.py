"""Fused VGG stem: conv3x3(3->64, SAME) + ReLU + maxpool2x2 in one pass.

STATUS: EXPERIMENTAL — numerically exact in interpret mode (A/B-tested vs
the XLA reference below), but the current Mosaic compiler rejects the
im2col concatenation ("result/input offset mismatch on non-concat
dimension": concatenating 8-lane operands along the 128-lane axis needs
lane-offset support). Not wired into the model. Round-2 plan: build the
patch matrix in (9C, W) sublane-major layout (sublane offsets are
8-granular, which Mosaic does support) or via a scratch buffer + explicit
copies. The motivation stands — see the measured stem roofline below.

Roofline motivation (measured, docs/PERF.md): the stem writes a
(N, 224, 224, 64) activation to HBM (1.6 GB bf16 at N=256), re-reads it for
the pool, and writes the pooled half — ~3.9 GB of traffic for 44 GFLOP of
math, 6.6 ms of the 30 ms student forward at 3.4% MFU. Fusing keeps the conv
rows in VMEM and writes only the pooled (N, 112, 112, 64) output (~0.4 GB).

Strategy: grid over (image, pooled-row). Each step loads the 4 input rows
feeding one pooled output row (2 conv rows), builds the im2col patch matrix
by concatenating 9 shifted (W, C) slices, runs ONE (2W, 9C) x (9C, 64) MXU
matmul, applies bias+ReLU, max-pools 2x2 and writes (1, W/2, 64).

The input is pre-padded on the host side of the op: +1 row/col of zeros on
each border (SAME padding) and channels padded 3 -> 8 so the patch matrix
lane dim is 72 (vs 27), which the MXU tiles far better. Weights are packed
accordingly by `pack_stem_params`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CPAD = 8  # input channels padded 3 -> 8


def pack_stem_params(kernel, bias):
    """(3, 3, 3, 64) conv kernel -> (9 * _CPAD, 64) packed matmul weight."""
    k = jnp.asarray(kernel, jnp.float32)
    k = jnp.pad(k, ((0, 0), (0, 0), (0, _CPAD - k.shape[2]), (0, 0)))
    w = k.reshape(9 * _CPAD, -1)  # (dy, dx, c) raveled row-major
    return w, jnp.asarray(bias, jnp.float32)


def _kernel(x_ref, w_ref, b_ref, out_ref):
    # x_ref: (1, Hp, Wp, C) one padded image; out_ref: (1, H//2, W//2, F)
    # one pooled output row per loop step keeps the live window at 4 rows;
    # blocks can't express overlapping row windows, hence in-kernel ref
    # slicing with pl.ds (Mosaic has no dynamic_slice on values)
    hp, wp, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    w_out = wp - 2
    h_out = (hp - 2) // 2
    w_mat = w_ref[:]
    bias = b_ref[:]

    def body(r, _):
        rows = x_ref[0, pl.ds(2 * r, 4)]  # (4, Wp, C)

        def conv_row(off):
            # column shifts via roll keep every operand lane/sublane-aligned
            # (Mosaic rejects concats of differently-offset slices); the two
            # wrapped tail positions fall outside the [0, W) output slice
            cols = []
            for dy in range(3):
                row = rows[off + dy]  # (Wp, C)
                for dx in range(3):
                    # roll requires non-negative shift: -dx == wp - dx (mod wp)
                    cols.append(row if dx == 0 else pltpu.roll(row, wp - dx, 0))
            patches = jnp.concatenate(cols, axis=-1)  # (Wp, 9C)
            y = jnp.dot(patches, w_mat, preferred_element_type=jnp.float32)
            return jnp.maximum(y + bias, 0.0)[:w_out]

        y = jnp.maximum(conv_row(0), conv_row(1))  # vertical pool max
        f = y.shape[-1]
        y = jnp.max(y.reshape(w_out // 2, 2, f), axis=1)  # horizontal pool max
        out_ref[0, pl.ds(r, 1)] = y[None].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h_out, body, 0)


def fused_vgg_stem(x, kernel, bias, interpret: bool | None = None):
    """(N, H, W, 3) float -> (N, H//2, W//2, 64): conv3x3 SAME + ReLU + pool2x2."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    packed_w, b = pack_stem_params(kernel, bias)
    # SAME padding + channel pad (host-side of the kernel, fused by XLA)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (1, 1), (1, 1), (0, _CPAD - c)))
    h_out, w_out = h // 2, w // 2

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, f), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, _CPAD), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, f), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * _CPAD * f,
            bytes_accessed=n * h * w * _CPAD * 4 + n * h_out * w_out * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, packed_w, b[None, :])
    return out


def xla_vgg_stem(x, kernel, bias):
    """Reference semantics for A/B testing."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(kernel, jnp.float32),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y + jnp.asarray(bias, jnp.float32))
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID").astype(x.dtype)
