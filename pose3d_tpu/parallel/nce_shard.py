"""Data-parallel infoNCE-KD via shard_map + the blocked Pallas kernel.

A Pallas call does not GSPMD-partition: under the DP mesh the XLA lowering
of losses.info_nce_kd auto-inserts the feature all-gather, but a kernel must
be given its shard and its collectives explicitly. This module is that
wiring (the scaling-book recipe — explicit collectives around a local
kernel):

    per device:  t_all = all_gather(t_local)      # (N, D), D=200 — cheap
                 v_all = all_gather(valid_local)
                 lsum  = blocked_rect(s_local, t_all,
                                      offset = axis_index * local_n)
    loss = psum(lsum) / psum(valid_count)

The rectangular kernel (ops/nce_blocked.blocked_info_nce_partial) computes
each shard's rows against the GLOBAL column set with the shard's row offset
as the positive diagonal, so the math is exactly the global-batch in-batch
NCE of model_utils.py:277-285 (double-counted positive included) — proven
value+grad against the XLA global-batch loss on the 8-device CPU mesh in
tests/test_ops.py and on-chip in benchmarks/kernel_parity.py. Gradients need
no hand-written collectives: ds stays local, and the all_gather transposes
to a psum-scatter for dt.

Per-device cost at global batch N over W shards: compute O(N²·D/W) (vs the
replicated-XLA O(N²·D) Gram every device builds under GSPMD today), memory
O(N·D + block²) streamed — the reason the >16-chip wide-DP regime routes
here (docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_info_nce(
    s: jnp.ndarray,
    t: jnp.ndarray,
    tau: float,
    mesh: Mesh,
    axis: str = "data",
    valid: jnp.ndarray | None = None,
    block: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Global-batch infoNCE-KD over a DP mesh (no dropout — apply it to the
    key features first, exactly like steps.route_info_nce does).

    `s`/`t` are the GLOBAL (N, D) arrays as seen inside jit (batch-sharded
    over `axis` by GSPMD); N must divide the axis size — parallel/mesh.
    pad_batch guarantees that, and its mask rides in as `valid`. Returns the
    replicated scalar mean over valid rows, identical to
    losses.info_nce_kd(s, t, tau, valid=valid)."""
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce_partial

    n = s.shape[0]
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (
        f"global batch {n} must divide the '{axis}' axis ({n_shards}); "
        "pad with parallel.mesh.pad_batch + valid mask")
    validf = (jnp.ones((n,), jnp.float32) if valid is None
              else valid.astype(jnp.float32))
    # narrow global batches don't need the full wide-DP tile: clamp the block
    # to the global width rounded to the 128-lane grain so the kernel's
    # internal padding stays bounded (local rows pad to one block)
    block = min(block, max(-(-n // 128) * 128, 8))

    def local_fn(s_l, t_l, v_l):
        t_all = jax.lax.all_gather(t_l, axis, tiled=True)
        v_all = jax.lax.all_gather(v_l, axis, tiled=True)
        off = jax.lax.axis_index(axis) * s_l.shape[0]
        lsum = blocked_info_nce_partial(s_l, t_all, v_l, v_all, off,
                                        tau=tau, block=block,
                                        interpret=interpret)
        total = jax.lax.psum(lsum, axis)
        count = jax.lax.psum(jnp.sum(v_l), axis)
        return total / jnp.maximum(count, 1.0)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the checker (jax >= 0.9) rejects inside shard_map
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(s, t, validf)
