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


def shard_host_local_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Multi-process (multi-host) batch placement: every process passes the
    rows ITS loader produced (pose3d_tpu.data.loader shards the dataset by
    jax.process_index()), and the result is a global array whose leading axis
    is the concatenation over processes, sharded over `axis`.

    Single-process fallback is exactly `shard_batch`. This is the host data
    parallelism of SURVEY.md §2c: each TPU host feeds only its local chips;
    XLA's collectives (grad psum, NCE feature all-gather, sync-BN) then ride
    ICI/DCN over the global batch."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sharding = batch_sharding(mesh, axis)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree.map(put, batch)


def pad_batch(
    batch: dict, valid: np.ndarray, multiple: int
) -> tuple[dict, np.ndarray]:
    """Pad every array's leading axis up to the next multiple of `multiple`.

    Padded rows replicate real samples (cyclically) and are marked invalid;
    the train steps exclude them from BatchNorm statistics, every loss term,
    gradients and metrics (steps._valid_of), so a padded run's numerics on the
    valid rows are identical to the unpadded batch. This is how a global batch
    that doesn't divide the device count (e.g. the reference KD recipe's
    bs=46 on a v4-8) still uses EVERY chip instead of shrinking the mesh.
    """
    valid = np.asarray(valid, bool)
    b = valid.shape[0]
    pad = (-b) % multiple
    if pad == 0:
        return batch, valid
    idx = np.arange(pad) % b
    padded = {k: np.concatenate([np.asarray(v), np.asarray(v)[idx]])
              for k, v in batch.items()}
    return padded, np.concatenate([valid, np.zeros(pad, bool)])


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh.

    Works on multi-process (multi-host) global meshes too: device_put cannot
    target non-addressable devices, so there each process materializes only
    its addressable shards (every process must hold the same host values —
    true for seeded inits and restored checkpoints)."""
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(data.shape, sharding,
                                               lambda idx: data[idx])
            return jax.random.wrap_key_data(arr, impl=jax.random.key_impl(x))
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree.map(put, tree)
