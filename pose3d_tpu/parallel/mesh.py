"""Device mesh + sharding helpers (the reference has no parallelism at all —
SURVEY.md §2c; this layer is the TPU-native addition).

Strategy: pure data parallelism over the `data` mesh axis for these model
sizes (ResNet-50 ~26M params). Params/batch_stats are replicated; the batch
is sharded along its leading axis. Everything runs under `jit` with GSPMD:

  * gradients      — XLA inserts the psum (all-reduce over ICI) because the
    loss is a mean over the *global* batch;
  * in-batch NCE   — the (N, N) Gram matrices in pose3d_tpu.losses.nce contract
    over the global batch, so XLA inserts the all-gather of the 200-d
    features; loss parity with single-device global batch is automatic;
  * BatchNorm      — batch statistics reduce over the global batch (sync-BN
    semantics) for free under GSPMD.

The axis layout deliberately leaves room for a `model` axis (TP) even though
these models don't need it; pass axis_shapes=(dp, mp).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    axis_shapes: tuple[int, ...] = (-1,),
    axis_names: tuple[str, ...] = ("data",),
) -> Mesh:
    """Build a Mesh over the given (default: all) devices.

    axis_shapes may contain one -1 which absorbs the remaining devices,
    mirroring numpy reshape semantics.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    shapes = list(axis_shapes)
    if -1 in shapes:
        known = int(np.prod([s for s in shapes if s != -1]))
        shapes[shapes.index(-1)] = n // known
    grid = np.asarray(devices).reshape(shapes)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place every leaf of a batch pytree with its leading axis sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
