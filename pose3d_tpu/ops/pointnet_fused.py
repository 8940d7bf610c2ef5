"""Fused PointNet encoder (eval mode) as a Pallas TPU kernel.

Why: the ShapeEncoderPC hot path (teacher forward inside KD training, where
the teacher runs in eval mode on the 3x-augmented batch — base_class.py:363)
expands each point cloud to a (N, P, 1024) activation before the max-pool.
At the reference KD recipe (3x46 batch, P=2500, bf16) that is ~700 MB of HBM
traffic per direction that exists only to be max-reduced. This kernel tiles
points into VMEM, runs the three (BN-folded) matmuls per tile on the MXU and
keeps a running (1, 1024) max — the big intermediate never touches HBM.

Eval-mode BatchNorm is an affine transform, so each Dense+BN pair folds into
one matmul: W' = W * g, b' = b * g + c with g = scale/sqrt(var+eps),
c = bias - mean * g (`fold_pointnet_params`).

The XLA fallback (`_xla_pointnet_eval`) is the reference semantics; the
pallas path is A/B-tested against it in tests/test_ops.py. On non-TPU
platforms the wrapper transparently uses the fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_P = 512  # points per VMEM tile (multiple of 8 sublanes)


def fold_pointnet_params(params: dict, batch_stats: dict, eps: float = 1e-5):
    """Fold ShapeEncoderPC Dense+BatchNorm params (flax trees produced by
    pose3d_tpu.models.pointnet) into 3 plain (W, b) pairs."""
    folded = []
    for i in range(3):
        w = params[f"Dense_{i}"]["kernel"]
        b = params[f"Dense_{i}"]["bias"]
        bn_p = params[f"BatchNorm_{i}"]
        bn_s = batch_stats[f"BatchNorm_{i}"]
        g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
        c = bn_p["bias"] - bn_s["mean"] * g
        folded.append((w * g[None, :], b * g + c))
    return folded


def _xla_pointnet_eval(points, w1, b1, w2, b2, w3, b3):
    """Reference semantics: Dense+ReLU, Dense+ReLU, Dense, max over points."""
    h = jax.nn.relu(points @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    h = h @ w3 + b3
    return jnp.max(h, axis=1)


_BLOCK_N = 8  # batch rows per tile (TPU sublane alignment for the output)


def _kernel(pts_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
    j = pl.program_id(1)
    bn, bp = pts_ref.shape[0], pts_ref.shape[1]
    x = pts_ref[:].reshape(bn * bp, 3)
    h = jnp.maximum(
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
    h = jnp.maximum(
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:], 0.0)
    h = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
    tile_max = jnp.max(h.reshape(bn, bp, -1), axis=1)  # (BLOCK_N, D)

    @pl.when(j == 0)
    def _():
        out_ref[:] = tile_max

    @pl.when(j > 0)
    def _():
        out_ref[:] = jnp.maximum(out_ref[:], tile_max)


def _pallas_pointnet_eval(points, w1, b1, w2, b2, w3, b3, interpret=False):
    n, p, _ = points.shape
    d = w3.shape[1]
    # pad the point axis to a BLOCK_P multiple by repeating the final point
    # (duplicates cannot change a max) and the batch axis to a BLOCK_N multiple
    rem_p = (-p) % _BLOCK_P
    if rem_p:
        points = jnp.concatenate(
            [points, jnp.broadcast_to(points[:, -1:, :], (n, rem_p, 3))], axis=1)
        p += rem_p
    rem_n = (-n) % _BLOCK_N
    if rem_n:
        points = jnp.concatenate(
            [points, jnp.zeros((rem_n, p, 3), points.dtype)], axis=0)
    n_pad = n + rem_n
    num_blocks = p // _BLOCK_P

    grid = (n_pad // _BLOCK_N, num_blocks)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK_N, _BLOCK_P, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_N, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * p * (3 * 64 + 64 * 128 + 128 * d),
            bytes_accessed=n_pad * p * 3 * 4 + n_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(points, w1, b1[None, :], w2, b2[None, :], w3, b3[None, :])
    return out[:n]


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def fused_pointnet_eval(points, folded_params, use_pallas: bool | None = None):
    """Eval-mode ShapeEncoderPC forward: (N, P, 3) -> (N, feature_dim).

    folded_params: list of 3 (W, b) pairs from `fold_pointnet_params`.
    use_pallas: force the pallas path (True), the XLA fallback (False), or
    auto-select by platform (None).
    """
    (w1, b1), (w2, b2), (w3, b3) = folded_params
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        return _pallas_pointnet_eval(points, w1, b1, w2, b2, w3, b3)
    return _xla_pointnet_eval(points, w1, b1, w2, b2, w3, b3)


def pallas_pointnet_interpret(points, folded_params):
    """Interpreter-mode pallas path (for CPU A/B tests)."""
    (w1, b1), (w2, b2), (w3, b3) = folded_params
    return _pallas_pointnet_eval(points, w1, b1, w2, b2, w3, b3, interpret=True)
