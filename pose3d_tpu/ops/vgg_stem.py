"""Fused VGG stem: conv3x3(3->64, SAME) + ReLU + maxpool2x2 in one pass.

STATUS: EXPERIMENTAL, measured NEGATIVE — kept as documentation of the
investigation. Two formulations:
  * `fused_vgg_stem` (NHWC): exact in interpret mode; Mosaic rejects the
    lane-axis im2col concat (8-lane operands on the 128-lane axis).
  * `fused_vgg_stem_cf` (channels-first, H untiled, dx-shift applied to the
    matmul results via lane rolls): compiles AND runs on TPU v5e, exact to
    bf16 rounding — but measured 23.6 ms vs 12.0 ms for the XLA path at
    batch 256, because the (N,Hp,Wp,C)->(N,Hp,C,Wp) relayout transposes cost
    more HBM traffic than the fusion saves, and the per-row (F x 3C x Wp)
    matmuls are too small to amortize the 112-iteration loop.
Conclusion: XLA's stem (6.6 ms pure, without the cast/pad overhead counted
above) is near the achievable bound once mandatory layout changes are
priced in; stem fusion is NOT a win on this hardware generation. The 23%
MFU student forward therefore needs algorithmic changes (e.g. a BN-variant
student or quantization), not kernel surgery — see docs/ROADMAP.md.

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


# ---------------------------------------------------------------------------
# v2: sublane-major (channels-first) formulation using only Mosaic-safe ops:
# lane rolls, 8-granular sublane concats, and matmuls (incl. a 0/1 selection
# matmul for the horizontal pool — no lane reshapes/strided slices).
# ---------------------------------------------------------------------------
def pack_stem_params_cf(kernel, bias):
    """(3,3,3,F) -> 3 per-dx (F, 3*_CPAD) weights (patch order [dy, c]) plus
    (F, 1) bias. The dx shift is applied to the matmul RESULTS via lane
    rolls, so the in-kernel concat only ever sees offset-0 operands."""
    k = jnp.asarray(kernel, jnp.float32)
    k = jnp.pad(k, ((0, 0), (0, 0), (0, _CPAD - k.shape[2]), (0, 0)))
    # k[dy, dx, c, f] -> w_dx[f, dy*C + c]
    w_per_dx = [k[:, dx].reshape(3 * _CPAD, -1).T for dx in range(3)]
    return jnp.stack(w_per_dx), jnp.asarray(bias, jnp.float32)[:, None]


def _kernel_cf(x_ref, w_ref, b_ref, sel_ref, out_ref):
    # x_ref: (1, Hp, C, Wp) — H on an UNTILED leading dim so dynamic row
    # indexing needs no 8-alignment and row reads are native (C, Wp) tiles.
    # out_ref: (1, H//2, F, W//2), same trick for the write.
    wp = x_ref.shape[3]
    h_out = out_ref.shape[1]
    w_dx = [w_ref[dx] for dx in range(3)]  # 3 x (F, 3C)
    bias = b_ref[:]  # (F, 1)
    sel = sel_ref[:]  # (Wp, W//2) 0/1 even-column selector

    def body(r, _):
        def conv_row(off):
            # stack the 3 input rows (all lane-offset 0 -> clean concat),
            # one matmul per dx, then lane-roll the RESULTS and sum:
            # y[., w] = sum_dx (Wdx @ P)[., w + dx]
            pieces = [x_ref[0, 2 * r + off + dy] for dy in range(3)]  # (C, Wp)
            patches = jnp.concatenate(pieces, axis=0)  # (3C, Wp)
            y = jnp.dot(w_dx[0], patches, preferred_element_type=jnp.float32)
            for dx in (1, 2):
                ydx = jnp.dot(w_dx[dx], patches, preferred_element_type=jnp.float32)
                y = y + pltpu.roll(ydx, wp - dx, 1)
            return jnp.maximum(y + bias, 0.0)  # (F, Wp)

        y = jnp.maximum(conv_row(0), conv_row(1))  # vertical pool
        # horizontal pool: adjacent-pair max then even-column extraction
        z = jnp.maximum(y, pltpu.roll(y, wp - 1, 1))
        pooled = jnp.dot(z, sel, preferred_element_type=jnp.float32)  # (F, W//2)
        out_ref[0, r] = pooled.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h_out, body, 0)


def fused_vgg_stem_cf(x, kernel, bias, interpret: bool | None = None):
    """Channels-first fused stem: (N, H, W, 3) -> (N, H//2, W//2, F)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n, h, w, c = x.shape
    f = kernel.shape[-1]
    packed_w, b = pack_stem_params_cf(kernel, bias)
    h_out, w_out = h // 2, w // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, _CPAD - c)))
    xp = jnp.transpose(xp, (0, 1, 3, 2))  # (N, Hp, C, Wp)
    # 0/1 selector: column j of z maps to pooled column k iff j == 2k
    sel = (jnp.arange(w + 2)[:, None] == 2 * jnp.arange(w_out)[None, :]).astype(
        jnp.float32)

    out = pl.pallas_call(
        _kernel_cf,
        out_shape=jax.ShapeDtypeStruct((n, h_out, f, w_out), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, _CPAD, w + 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_out, f, w_out), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * _CPAD * f,
            bytes_accessed=n * h * w * _CPAD * 4 + n * f * h_out * w_out * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, packed_w, b, sel)
    return jnp.transpose(out, (0, 1, 3, 2))  # (N, H//2, W//2, F) NHWC


def xla_vgg_stem(x, kernel, bias):
    """Reference semantics for A/B testing."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), jnp.asarray(kernel, jnp.float32),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y + jnp.asarray(bias, jnp.float32))
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID").astype(x.dtype)
