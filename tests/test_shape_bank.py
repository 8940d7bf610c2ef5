"""Device-resident point-cloud bank (ops/shape_bank.py + device_shapes mode).

Replaces the reference's per-sample host cloud load+subsample
(dataset.py point-cloud branch: load_mesh + np.random.choice(2500)) with a
device gather + in-step sampling; these tests pin the sampling semantics,
the dataset's 3-scalar emission, and end-to-end equivalence of the KD step
(exact when vertex count == point_num, where the subset is the whole cloud
and the PointNet encoder is permutation-invariant)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pose3d_tpu.data import datasets, synthetic
from pose3d_tpu.data import transforms as T
from pose3d_tpu.ops import shape_bank as sb


@pytest.fixture(scope="module")
def bank_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("o3d_bank"))
    synthetic.make_objectnet3d_fixture(root, categories=("bed", "chair"),
                                       n_train_per_cat=4, n_val_per_cat=2,
                                       image_size=72, n_vertices=64)
    return root


def _make_bank(n_shapes=3, v=50, point_num=20, seed=0):
    rng = np.random.default_rng(seed)
    verts = np.zeros((n_shapes, v, 3), np.float32)
    counts = np.array([v, 30, 10], np.int32)[:n_shapes]
    for s in range(n_shapes):
        verts[s, : counts[s]] = rng.normal(size=(counts[s], 3))
    return sb.ShapeBank.from_arrays(verts, counts, point_num), verts, counts


def test_sample_without_replacement_valid_and_distinct():
    bank, verts, counts = _make_bank()
    ids = jnp.array([0, 1], jnp.int32)  # counts 50, 30 >= 20 -> WOR
    out = sb.sample_from_bank(bank, ids, jnp.zeros(2), jnp.array([7, 8], jnp.uint32))
    assert out.shape == (2, 20, 3)
    out = np.asarray(out)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # every sampled point must be one of the source's VALID vertices
    # (compare against the same rotate=0 + min-max normalize applied to all)
    for row, sid in zip(out, (0, 1)):
        src = verts[sid, : counts[sid]].astype(np.float64)
        # normalization is subset-dependent; instead invert by matching
        # pairwise structure: distinct rows == 20 (no repeats under WOR)
        assert len({tuple(np.round(p, 6)) for p in row}) == 20


def test_sample_with_replacement_when_short():
    bank, verts, counts = _make_bank()  # shape 2 has 10 < 20 verts
    out = sb.sample_from_bank(bank, jnp.array([2], jnp.int32), jnp.zeros(1),
                              jnp.array([3], jnp.uint32))
    out = np.asarray(out)[0]
    assert out.shape == (20, 3)
    # with replacement from 10 valid rows: at most 10 distinct points,
    # and never a padded (zero) row — normalized values stay in [0,1]
    assert len({tuple(np.round(p, 5)) for p in out}) <= 10


def test_seed_determinism_and_batch_independence():
    bank, _, _ = _make_bank()
    ids = jnp.array([0, 0], jnp.int32)
    seeds = jnp.array([5, 9], jnp.uint32)
    a = np.asarray(sb.sample_from_bank(bank, ids, jnp.zeros(2), seeds))
    # same seed -> same subset regardless of batch position/composition
    b = np.asarray(sb.sample_from_bank(bank, jnp.array([0], jnp.int32),
                                       jnp.zeros(1), jnp.array([9], jnp.uint32)))
    np.testing.assert_array_equal(a[1], b[0])
    assert not np.array_equal(a[0], a[1])  # different seeds differ


def test_full_subset_matches_host_math():
    """count == point_num: the subset is the whole cloud (any order), so the
    sorted device output must equal the sorted host sample_pointcloud output
    (f32 vs float64 rotate/normalize -> tolerance)."""
    rng = np.random.default_rng(1)
    cloud = rng.normal(size=(24, 3)).astype(np.float32)
    bank = sb.ShapeBank.from_arrays(cloud[None], np.array([24]), 24)
    for rot in (0.0, 37.0):
        dev = np.asarray(sb.sample_from_bank(
            bank, jnp.array([0], jnp.int32), jnp.array([rot], jnp.float32),
            jnp.array([11], jnp.uint32)))[0]
        host = T.sample_pointcloud(cloud, 24, rot, np.random.default_rng(0))
        np.testing.assert_allclose(np.sort(dev, axis=0), np.sort(host, axis=0),
                                   atol=2e-6, err_msg=f"rot={rot}")


def test_dataset_device_shapes_emission(bank_fixture):
    ds = datasets.Pascal3DContrast(
        bank_fixture, "ObjectNet3D.txt", train=True, shape="PointCloud",
        shape_dir="pointcloud", point_num=64, input_dim=48, device_views=True,
        device_shapes=True)
    s = ds.get(0, np.random.default_rng(0))
    assert "shape" not in s
    assert s["shape_id"].dtype == np.int32
    assert s["shape_rot"].dtype == np.float32 and float(s["shape_rot"]) == 0.0
    assert s["shape_seed"].dtype == np.uint32
    verts, counts = ds.build_shape_bank()
    assert verts.shape[0] == len(ds._ensure_shape_index())
    assert verts.shape[2] == 3 and counts.max() <= verts.shape[1]
    assert 0 <= int(s["shape_id"]) < verts.shape[0]
    # the bank row must hold the same cloud _load_shape reads
    row = ds.frame.iloc[0]
    sid = ds._ensure_shape_index()[(str(row["cat"]), int(row["cad_index"]))]
    from pose3d_tpu.data import ply

    src = np.asarray(ply.load_vertices(os.path.join(
        bank_fixture, "pointcloud", str(row["cat"]),
        "%02d" % int(row["cad_index"]), "compressed.ply")), np.float32)
    np.testing.assert_array_equal(verts[sid, : counts[sid]], src)


def test_kd_step_equivalence_full_subset(bank_fixture):
    """n_vertices == point_num: device_shapes and host-shape batches carry
    the same point SET (different order), and the PointNet encoder is
    permutation-invariant -> the KD loss must match to f32 tolerance."""
    from pose3d_tpu.models.estimators import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import steps
    from pose3d_tpu.train.state import create_train_state, torch_style_adam

    kw = dict(train=True, shape="PointCloud", shape_dir="pointcloud",
              point_num=64, input_dim=48, device_views=True)
    ds_host = datasets.Pascal3DContrast(bank_fixture, "ObjectNet3D.txt", **kw)
    ds_dev = datasets.Pascal3DContrast(bank_fixture, "ObjectNet3D.txt",
                                       device_shapes=True, **kw)

    def batch_of(ds, keys):
        samples = [ds.get(i, np.random.default_rng((46, 0, i))) for i in range(4)]
        return {k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in keys}

    host_keys = ("im", "label", "label_flip", "label_rot", "rot_sign", "shape")
    dev_keys = ("im", "label", "label_flip", "label_rot", "rot_sign",
                "shape_id", "shape_rot", "shape_seed")
    b_host = batch_of(ds_host, host_keys)
    b_dev = batch_of(ds_dev, dev_keys)
    # identical images/labels: the shape draw is the last rng consumer
    np.testing.assert_array_equal(np.asarray(b_host["im"]),
                                  np.asarray(b_dev["im"]))

    student = BaselineEstimator(img_feature_dim=64, azi_classes=24,
                                ele_classes=12, inp_classes=24)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=64,
                            shape_feature_dim=64, azi_classes=24,
                            ele_classes=12, inp_classes=24)
    key = jax.random.key(0)
    im_ex = jnp.zeros((1, 48, 48, 3))
    state = create_train_state(student, (im_ex,), key,
                               torch_style_adam(1e-4, 5e-4))
    tvars = teacher.init(jax.random.key(1), im_ex,
                         jnp.zeros((1, 64, 3)), train=False)

    verts, counts = ds_dev.build_shape_bank()
    bank = sb.ShapeBank.from_arrays(verts, counts, 64)
    step_host = steps.make_kd_crd_step(student, teacher, bin_size=15,
                                       device_views=True)
    step_dev = steps.make_kd_crd_step(student, teacher, bin_size=15,
                                      device_views=True, with_shape_bank=True)
    _, m_host = step_host(state, tvars, b_host)
    _, m_dev = step_dev(bank, state, tvars, b_dev)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=2e-5)
    assert np.isfinite(float(m_dev["loss"]))


def test_multidevice_bank_step_matches_single_device():
    """Bank sampling is seed-pure per sample, so GSPMD over 8 devices must
    reproduce the single-device loss exactly like the host-shape path does
    (the bank is the step's first traced argument, replicated over the
    mesh like any other state — see steps._shape_of)."""
    import optax

    from pose3d_tpu.models.estimators import BaselineEstimator, PoseEstimator
    from pose3d_tpu.parallel import make_mesh, replicate, shard_batch
    from pose3d_tpu.train import steps
    from pose3d_tpu.train.state import create_train_state

    assert jax.device_count() >= 8
    rng = np.random.default_rng(0)
    n, img, pts = 8, 32, 24
    bank_np = rng.random((3, 40, 3)).astype(np.float32)
    bank = sb.ShapeBank.from_arrays(bank_np, np.array([40, 33, 24]), pts)
    batch = {
        "im": jnp.asarray(rng.standard_normal((n, img, img, 3)), jnp.float32),
        "label": jnp.asarray(np.stack([rng.integers(0, 360, n),
                                       rng.integers(0, 180, n),
                                       rng.integers(0, 360, n)], 1), jnp.int32),
        "shape_id": jnp.asarray(rng.integers(0, 3, n), jnp.int32),
        "shape_rot": jnp.zeros((n,), jnp.float32),
        "shape_seed": jnp.asarray(rng.integers(0, 2**32, n), jnp.uint32),
    }
    student = BaselineEstimator(img_feature_dim=64, azi_classes=24,
                                ele_classes=12, inp_classes=24)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=64,
                            shape_feature_dim=64, azi_classes=24,
                            ele_classes=12, inp_classes=24)
    state = create_train_state(student, (jnp.zeros((1, img, img, 3)),),
                               jax.random.key(0), optax.sgd(0.1))
    tvars = teacher.init(jax.random.key(1), jnp.zeros((1, img, img, 3)),
                         jnp.zeros((1, pts, 3)), train=False)
    step = jax.jit(steps.make_teacher_train_step(teacher, with_shape_bank=True))
    t_state = create_train_state(
        teacher, (jnp.zeros((1, img, img, 3)), jnp.zeros((1, pts, 3))),
        jax.random.key(2), optax.sgd(0.1))
    ref_state, ref_metrics = step(bank, t_state, batch)

    mesh = make_mesh(jax.devices()[:8])
    out_state, out_metrics = step(replicate(bank, mesh),
                                  replicate(t_state, mesh),
                                  shard_batch(batch, mesh))
    assert float(ref_metrics["loss"]) == pytest.approx(
        float(out_metrics["loss"]), rel=1e-4)
    del state, tvars


# ----------------------------- MultiView render bank ------------------------


@pytest.fixture(scope="module")
def mv_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("o3d_mv_bank"))
    synthetic.make_objectnet3d_fixture(root, categories=("bed",),
                                       n_train_per_cat=3, n_val_per_cat=1,
                                       image_size=48, with_renders=True,
                                       n_renders=144, render_size=24)
    return root


def _mv_ds(root, device_shapes):
    return datasets.Pascal3DContrast(
        root, "ObjectNet3D.txt", train=True, shape="MultiView",
        shape_dir="Renders_semi_sphere", view_num=12, tour=2, input_dim=24,
        device_views=True, device_shapes=device_shapes)


def test_render_bank_gather_matches_host(mv_fixture):
    """Deterministic id-table gather: device output == host _load_shape for
    the same (model, mutation), up to the pinned 1-ULP dewire delta."""
    ds = _mv_ds(mv_fixture, device_shapes=True)
    renders, id_table = ds.build_render_bank()
    assert renders.dtype == np.uint8 and id_table.shape == (72, 12)
    bank = sb.RenderBank.from_arrays(renders, id_table)
    ds_host = _mv_ds(mv_fixture, device_shapes=False)
    for mut in (0, 7, 71):
        row = ds_host.frame.iloc[1]
        host = ds_host._load_shape(row["cat"], row["cad_index"], mut,
                                   np.random.default_rng(0))
        sid = ds._ensure_shape_index()[(str(row["cat"]), int(row["cad_index"]))]
        dev = np.asarray(sb.gather_renders(
            bank, jnp.array([sid], jnp.int32), jnp.array([mut], jnp.int32)))[0]
        np.testing.assert_allclose(dev, host, atol=1e-6, err_msg=f"mut={mut}")


def test_mv_dataset_emission_and_teacher_step(mv_fixture):
    """device_shapes MV emission + teacher-step loss parity vs the host
    render path (the gather is deterministic, so the losses must agree)."""
    import optax

    from pose3d_tpu.models.estimators import PoseEstimator
    from pose3d_tpu.train import steps
    from pose3d_tpu.train.state import create_train_state

    ds_dev = _mv_ds(mv_fixture, device_shapes=True)
    ds_host = _mv_ds(mv_fixture, device_shapes=False)
    s = ds_dev.get(0, np.random.default_rng(3))
    assert set(s) >= {"shape_id", "shape_mut"} and "shape" not in s
    assert int(s["shape_mut"]) == 0  # contrast pins mutation to 0

    def batch_of(ds, keys, n=2):
        samples = [ds.get(i, np.random.default_rng((46, 0, i))) for i in range(n)]
        return {k: jnp.asarray(np.stack([x[k] for x in samples])) for k in keys}

    b_host = batch_of(ds_host, ("im", "label", "shape"))
    b_dev = batch_of(ds_dev, ("im", "label", "shape_id", "shape_mut"))
    np.testing.assert_array_equal(np.asarray(b_host["im"]),
                                  np.asarray(b_dev["im"]))

    teacher = PoseEstimator(shape="MultiView", view_num=12, img_feature_dim=64,
                            shape_feature_dim=64, azi_classes=24,
                            ele_classes=12, inp_classes=24)
    state = create_train_state(
        teacher, (jnp.zeros((1, 24, 24, 3)), jnp.zeros((1, 12, 24, 24, 3))),
        jax.random.key(0), optax.sgd(0.1))
    renders, id_table = ds_dev.build_render_bank()
    bank = sb.RenderBank.from_arrays(renders, id_table)
    step_host = steps.make_teacher_train_step(teacher)
    step_dev = steps.make_teacher_train_step(teacher, with_shape_bank=True)
    _, m_host = step_host(state, b_host)
    _, m_dev = step_dev(bank, state, b_dev)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=2e-5)


def test_eval_step_render_bank_matches_host(mv_fixture):
    """Teacher eval with the render bank must reproduce the host render
    path's predictions (deterministic gather; 1-ULP dewire delta only)."""
    from pose3d_tpu.models.estimators import PoseEstimator
    from pose3d_tpu.train import steps

    ds_host = _mv_ds(mv_fixture, device_shapes=False)
    ds_host.train = False
    ds_dev = _mv_ds(mv_fixture, device_shapes=True)
    ds_dev.train = False

    def batch_of(ds, keys, n=2):
        samples = [ds.get(i, np.random.default_rng((1, 0, i))) for i in range(n)]
        return {k: jnp.asarray(np.stack([x[k] for x in samples])) for k in keys}

    b_host = batch_of(ds_host, ("im", "label", "shape"))
    b_dev = batch_of(ds_dev, ("im", "label", "shape_id", "shape_mut"))

    teacher = PoseEstimator(shape="MultiView", view_num=12, img_feature_dim=64,
                            shape_feature_dim=64, azi_classes=24,
                            ele_classes=12, inp_classes=24)
    variables = teacher.init(jax.random.key(0), jnp.zeros((1, 24, 24, 3)),
                             jnp.zeros((1, 12, 24, 24, 3)), train=False)
    renders, id_table = ds_dev.build_render_bank()
    bank = sb.RenderBank.from_arrays(renders, id_table)
    m_host = steps.make_eval_step(teacher, "teacher")(variables, b_host)
    m_dev = steps.make_eval_step(teacher, "teacher", with_shape_bank=True)(
        bank, variables, b_dev)
    np.testing.assert_allclose(np.asarray(m_dev["pred"]),
                               np.asarray(m_host["pred"]), atol=1e-3)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=2e-5)
