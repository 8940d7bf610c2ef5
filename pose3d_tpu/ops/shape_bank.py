"""Device-resident point-cloud bank: clouds live in HBM, sampled in-step.

The reference loads + subsamples a point cloud from disk for EVERY sample of
EVERY epoch on the host (dataset.py: `point_cloud_path` -> pymesh.load_mesh ->
random subset inside `__getitem__`; our host path mirrors it in
datasets._load_shape -> transforms.sample_pointcloud). But the set of
DISTINCT clouds is tiny (one per (category, CAD model) — tens to hundreds),
so the TPU-first layout is an embedding-table-like bank:

  * all distinct clouds are padded to one (S, V, 3) f32 array resident in
    HBM (S clouds, V = max vertex count), uploaded ONCE;
  * the loader emits 3 scalars per sample — `shape_id` (row), `shape_rot`
    (z-rotation deg, the canonical-frame mutation), `shape_seed` (host-drawn
    u32) — instead of a (point_num, 3) cloud;
  * the train step gathers the rows and draws the fixed-size random subset
    ON DEVICE (uniform WITHOUT replacement via the top-k-of-uniform-keys
    trick), then applies the same rotate + global min-max normalize as
    transforms.sample_pointcloud.

Wins: removes the per-sample host cloud work and the per-batch cloud
transfer (bs46 x 2500 x 3 f32 = 1.4 MB/step through a ~38 MB/s tunnel =
~60 ms/step wall — docs/PERF.md "sustained training"), in exchange for a
~5 MB/step HBM gather + a (b, V) sort, both noise next to the conv FLOPs.

Semantics match the host path distributionally, not bitwise: the random
subset comes from a jax PRNG keyed by the host-drawn `shape_seed` (one u32
replaces the host path's rng.choice draw), and the rotate/normalize run in
f32 instead of float64. Sampling WITH replacement (vertex count < point_num)
selects `point_num` independent uniform indices like np.random.choice.
Reference behavior being replaced: dataset.py point-cloud branch
(load_mesh + `np.random.choice(vertices, 2500)`), model input contract at
auxiliary/model.py (PointCloud encoder consumes the sampled cloud).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# the batch keys that replace "shape" when a dataset runs device_shapes=True
SHAPE_ID_KEYS = ("shape_id", "shape_rot", "shape_seed")  # PointCloud bank
RENDER_ID_KEYS = ("shape_id", "shape_mut")               # MultiView bank


@dataclass(frozen=True)
class ShapeBank:
    """verts: (S, V, 3) f32, zero-padded rows beyond counts[s].
    counts: (S,) i32 true vertex counts. point_num: subset size."""

    verts: jnp.ndarray
    counts: jnp.ndarray
    point_num: int

    batch_keys = SHAPE_ID_KEYS

    @classmethod
    def from_arrays(cls, verts: np.ndarray, counts: np.ndarray, point_num: int):
        return cls(jnp.asarray(verts, jnp.float32),
                   jnp.asarray(counts, jnp.int32), int(point_num))


jax.tree_util.register_dataclass(ShapeBank, data_fields=("verts", "counts"),
                                 meta_fields=("point_num",))


def _sample_one(verts, count, rot_deg, seed, point_num: int):
    """(V, 3) + scalars -> (point_num, 3); transforms.sample_pointcloud on
    device (rotate about z AFTER subset, then global min-max to [0, 1])."""
    v = verts.shape[0]
    k_wor, k_wr = jax.random.split(jax.random.key(seed))
    # without replacement: top-k of uniform keys over the valid prefix is a
    # uniform random k-subset (pad rows get key -1 and can never win while
    # at least point_num valid rows exist)
    keys = jax.random.uniform(k_wor, (v,))
    keys = jnp.where(jnp.arange(v) < count, keys, -1.0)
    _, idx_wor = jax.lax.top_k(keys, point_num)
    # with replacement (count < point_num): independent uniforms, like
    # np.random.Generator.choice(..., replace=True)
    idx_wr = jax.random.randint(k_wr, (point_num,), 0, jnp.maximum(count, 1))
    idx = jnp.where(count >= point_num, idx_wor, idx_wr)
    pts = jnp.take(verts, idx, axis=0)

    # z-rotation; rot_deg == 0 gives the exact identity (cos 0 = 1, sin 0 = 0,
    # and x*1 + y*0 + z*0 is exact in f32), so no branch is needed
    a = rot_deg * (jnp.pi / 180.0)
    c, s = jnp.cos(a), jnp.sin(a)
    row0 = jnp.stack([c, -s, jnp.zeros_like(c)])
    row1 = jnp.stack([s, c, jnp.zeros_like(c)])
    row2 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    pts = pts @ jnp.stack([row0, row1, row2]).T

    pts = pts - pts.min()
    m = pts.max()
    return jnp.where(m > 0, pts / jnp.maximum(m, 1e-30), pts)


def sample_from_bank(bank: ShapeBank, ids, rot_deg, seeds) -> jnp.ndarray:
    """ids (b,) i32, rot_deg (b,) f32, seeds (b,) u32 -> (b, point_num, 3).

    Per-sample PRNG keys come from the host-drawn seeds, so the subset a
    sample sees is a pure function of its (seed) — independent of batch
    composition, device count, or step order."""
    verts = bank.verts[ids]          # (b, V, 3) HBM gather
    counts = bank.counts[ids]        # (b,)
    return jax.vmap(
        lambda v, c, r, s: _sample_one(v, c, r, s, bank.point_num)
    )(verts, counts, rot_deg.astype(jnp.float32), seeds.astype(jnp.uint32))


@dataclass(frozen=True)
class RenderBank:
    """MultiView analogue: the full render set per CAD model lives in HBM as
    uint8 (4x smaller than f32) and the view subset is a deterministic table
    lookup — `multiview_ids(view_num, tour, mutation)` depends only on
    mutation in [0, 72), so all 72 outcomes are precomputed host-side into
    id_table and the step does renders[shape_id][id_table[mutation]].

    renders: (S, R, H, W, 3) u8, R = full render count (e.g. 144).
    id_table: (72, K) i32, K = view_num (tour-strided ids).
    Replaces: per-sample host decode of K render JPEGs + the (K, H, W, 3)
    f32 wire transfer (reference dataset.py render branch) — at bs46 x 12
    views x 224 px that is 331 MB/step on the wire."""

    renders: jnp.ndarray
    id_table: jnp.ndarray

    batch_keys = RENDER_ID_KEYS

    @classmethod
    def from_arrays(cls, renders: np.ndarray, id_table: np.ndarray):
        return cls(jnp.asarray(renders, jnp.uint8),
                   jnp.asarray(id_table, jnp.int32))


jax.tree_util.register_dataclass(RenderBank,
                                 data_fields=("renders", "id_table"),
                                 meta_fields=())


def gather_renders(bank: RenderBank, ids, mutation) -> jnp.ndarray:
    """ids (b,) i32, mutation (b,) i32 -> (b, K, H, W, 3) f32 in [0, 1].

    One flat gather of exactly the b*K selected renders — never the
    (b, R, ...) intermediate (that would be ~1 GB at bs46 x 144 renders)."""
    from pose3d_tpu.ops.augment import dewire

    s, r = bank.renders.shape[:2]
    view_ids = bank.id_table[mutation]              # (b, K)
    flat = ids[:, None] * r + view_ids              # (b, K) into (S*R, ...)
    sel = jnp.take(bank.renders.reshape(s * r, *bank.renders.shape[2:]),
                   flat, axis=0)                    # (b, K, H, W, 3) u8
    return dewire(sel)


def resolve(bank, batch) -> jnp.ndarray:
    """Dispatch a bank reference batch to the right gather."""
    if isinstance(bank, RenderBank):
        return gather_renders(bank, batch["shape_id"], batch["shape_mut"])
    return sample_from_bank(bank, batch["shape_id"], batch["shape_rot"],
                            batch["shape_seed"])
