"""Pallas TPU kernel for batched geodesic rotation error.

Used in the evaluation hot loop (errors over the full val set / the NxN
pose-distance matrices in the poseNCE losses). The math matches
pose3d_tpu.geometry.rotation_err exactly (incl. the reference clamp quirk).

For context on what is deliberately NOT hand-written (SURVEY.md §2b lists
candidate fusions): the conv-BN-ReLU blocks and the tiny 6-head KL / NCE
losses are left to XLA — measured on chip, XLA fuses them to within noise of
a hand kernel, and hand-scheduling what the compiler already fuses is
anti-TPU-first (pallas_guide.md "Let XLA fuse"). The kernels kept are the
ones with a real roofline argument: the PointNet encoder (HBM-intermediate
elimination, ops/pointnet_fused.py) and this one (transcendental-heavy
elementwise over big arrays, single pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024  # rows per tile
_DEG2RAD = 3.141592653589793 / 180.0


def _err_math(pred, gt):
    """(B, 3) degree triples -> (B,) cos of the geodesic angle."""

    def mats(lab):
        azi = lab[:, 0] * _DEG2RAD
        ele = (lab[:, 1] - 180.0) * _DEG2RAD
        rol = (lab[:, 2] - 180.0) * _DEG2RAD
        sin, cos = jnp.sin, jnp.cos
        return (
            cos(rol) * cos(azi) - sin(rol) * cos(ele) * sin(azi),
            sin(rol) * cos(azi) + cos(rol) * cos(ele) * sin(azi),
            sin(ele) * sin(azi),
            -cos(rol) * sin(azi) - sin(rol) * cos(ele) * cos(azi),
            -sin(rol) * sin(azi) + cos(rol) * cos(ele) * cos(azi),
            sin(ele) * cos(azi),
            sin(rol) * sin(ele),
            -cos(rol) * sin(ele),
            cos(ele),
        )

    a = mats(pred)
    b = mats(gt)
    trace = sum(x * y for x, y in zip(a, b))
    return (jnp.clip(trace, -1.0, 3.0) - 1.0) / 2.0  # cos(angle)


def _kernel(pred_ref, gt_ref, out_ref):
    # the kernel stops at cos(angle): Mosaic has no acos lowering (verified
    # on-chip — benchmarks/kernel_parity.py caught it); the final
    # arccos-and-scale runs outside on the (N,) result, where XLA fuses it
    # into the surrounding graph at negligible bytes
    out_ref[:, 0] = _err_math(pred_ref[:].astype(jnp.float32),
                              gt_ref[:].astype(jnp.float32))


def rotation_err_pallas(preds_deg, targets_deg, interpret: bool = False):
    """(N, 3) x (N, 3) -> (N,) geodesic error in degrees, single fused pass."""
    n = preds_deg.shape[0]
    rem = (-n) % _BLOCK
    preds = jnp.pad(preds_deg.astype(jnp.float32), ((0, rem), (0, 0)))
    gts = jnp.pad(targets_deg.astype(jnp.float32), ((0, rem), (0, 0)))
    n_pad = n + rem
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid=(n_pad // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(preds, gts)
    return jnp.arccos(out[:n, 0]) * (1.0 / _DEG2RAD)
