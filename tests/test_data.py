"""Data-layer tests: label algebra goldens, PLY roundtrip (numpy + native),
annotation filter parity semantics, dataset sample shapes, loader behavior."""

import os

import numpy as np
import pytest

from pose3d_tpu.data import annotations as anno
from pose3d_tpu.data import datasets, loader, ply, synthetic
from pose3d_tpu.data import transforms as T


# ----------------------------- label algebra --------------------------------


def test_process_viewpoint_label_golden():
    # dataset.py:428-434 semantics
    lab = T.process_viewpoint_label(np.array([30.0, -10.0, -90.0]))
    assert lab.tolist() == [330, 80, 90]
    lab = T.process_viewpoint_label(np.array([0.0, 0.0, 0.0]))
    assert lab.tolist() == [0, 90, 180]
    lab = T.process_viewpoint_label(np.array([30.0, -10.0, -90.0]), offset=40)
    assert lab.tolist() == [10, 80, 90]


def test_flip_label_golden():
    # flip: azi -> 360 - azi, inp -> -inp (dataset.py:570-572)
    raw = np.array([30.0, 20.0, 45.0])
    flipped = T.flip_label(raw)
    assert flipped.tolist() == [330.0, 20.0, -45.0]
    # composed with canonicalization: azi=(360-330)%360=30, ele=110, inp=(-45+180)%360=135
    lab = T.process_viewpoint_label(flipped)
    assert lab.tolist() == [30, 110, 135]


def test_rotate_label_wraparound():
    assert T.rotate_label(np.array([0.0, 0.0, 175.0]), 15)[2] == pytest.approx(-170.0)
    assert T.rotate_label(np.array([0.0, 0.0, -175.0]), -15)[2] == pytest.approx(170.0)
    assert T.rotate_label(np.array([0.0, 0.0, 10.0]), 15)[2] == pytest.approx(25.0)


def test_multiview_ids_golden():
    # view_num=12, tour=2, mutation=0: every 12th of two 72-rings
    ids = T.multiview_ids(12, 2, 0)
    assert ids.tolist() == [0, 12, 24, 36, 48, 60, 72, 84, 96, 108, 120, 132]
    # mutation rolls the ring start
    ids_m = T.multiview_ids(12, 2, 3)
    assert ids_m.tolist() == [3, 15, 27, 39, 51, 63, 75, 87, 99, 111, 123, 135]
    ids_t1 = T.multiview_ids(12, 1, 0)
    assert ids_t1.tolist() == [72 + 6 * i for i in range(12)]


def test_sample_pointcloud_normalized(rng):
    verts = rng.standard_normal((500, 3)).astype(np.float32) * 7 + 3
    pts = T.sample_pointcloud(verts, 250, rotation_deg=30, rng=rng)
    assert pts.shape == (250, 3)
    assert pts.min() == pytest.approx(0.0, abs=1e-6)
    assert pts.max() == pytest.approx(1.0, abs=1e-6)


def test_resize_pad_square():
    from PIL import Image

    im = Image.new("RGB", (100, 50), (255, 0, 0))
    out = T.resize_pad(im, 224)
    assert out.size == (224, 224)
    arr = np.asarray(out)
    assert arr[112, 112].tolist() == [255, 0, 0]  # center is image
    assert arr[5, 112].tolist() == [0, 0, 0]  # top is pad


# ----------------------------- PLY ------------------------------------------


def test_ply_roundtrip_binary_and_ascii(tmp_path, rng):
    verts = rng.standard_normal((123, 3)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"m_{binary}.ply")
        ply.write_ply(p, verts, binary=binary)
        out = ply.load_vertices(p, cache=False)
        np.testing.assert_allclose(out, verts, rtol=1e-6)


def test_ply_native_matches_numpy(tmp_path, rng):
    lib = ply._find_native()
    if lib is None:
        pytest.skip("native ply reader not built")
    verts = rng.standard_normal((257, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    ply.write_ply(p, verts, binary=True)
    native = ply._load_native(p)
    numpy_ = ply._load_numpy(p)
    np.testing.assert_allclose(native, numpy_, rtol=1e-6)


def test_ply_cache(tmp_path, rng):
    verts = rng.standard_normal((50, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    ply.write_ply(p, verts)
    a = ply.load_vertices(p)
    b = ply.load_vertices(p)
    assert a is b  # cached object identity
    ply.clear_cache()


# ----------------------------- fixtures + datasets --------------------------


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("objectnet3d"))
    synthetic.make_objectnet3d_fixture(root, n_train_per_cat=6, n_val_per_cat=4)
    return root


def test_annotation_filtering(fixture_root):
    train = anno.pascal3d_frame(fixture_root, "ObjectNet3D.txt", train=True)
    val = anno.pascal3d_frame(fixture_root, "ObjectNet3D.txt", train=False)
    assert len(train) == 12 and len(val) == 8
    assert set(train.set) == {"train"} and set(val.set) == {"val"}
    # azimuth wrapped non-negative for ObjectNet3D
    assert (train.azimuth >= 0).all()
    # novel-category exclusion drops the chosen cats from TRAIN only
    novel = anno.pascal3d_frame(fixture_root, "ObjectNet3D.txt", train=True,
                                novel=True, cat_choice=["bed"])
    assert "bed" not in set(novel.cat)
    # eval keeps only the chosen cats
    only = anno.pascal3d_frame(fixture_root, "ObjectNet3D.txt", train=False,
                               cat_choice=["bed"])
    assert set(only.cat) == {"bed"}


def test_real_objectnet3d_column_order_parses(fixture_root, tmp_path):
    """Real-data pre-wiring (VERDICT r2 #7): the PUBLISHED ObjectNet3D.txt
    column ORDER differs from the synthetic fixture's — the reference reads
    labels positionally (`iloc[idx, 9:12]`, dataset.py:237), which pins the
    real file to azimuth/elevation/inplane at columns 9:12:

      im_path,cat,source,set,has_keypoints,truncated,occluded,difficult,
      cad_index,azimuth,elevation,inplane_rotation,left,upper,right,lower

    This framework reads every column BY NAME, so the real file must parse
    to the same frame as the fixture order — asserted here by rewriting the
    fixture's annotation CSV into the real order (plus the real 'source'
    column that this framework ignores) and comparing filter output."""
    import pandas as pd

    fixture = pd.read_csv(os.path.join(fixture_root, "ObjectNet3D.txt"))
    real_order = ["im_path", "cat", "source", "set", "has_keypoints",
                  "truncated", "occluded", "difficult", "cad_index",
                  "azimuth", "elevation", "inplane_rotation",
                  "left", "upper", "right", "lower"]
    real = fixture.copy()
    real["source"] = "real"
    real = real[real_order]
    # the reference's positional invariant holds in this order
    assert list(real.columns[9:12]) == anno.LABEL_COLS
    real_root = str(tmp_path / "real")
    os.makedirs(real_root)
    real.to_csv(os.path.join(real_root, "ObjectNet3D.txt"), index=False)

    got = anno.pascal3d_frame(real_root, "ObjectNet3D.txt", train=True)
    want = anno.pascal3d_frame(fixture_root, "ObjectNet3D.txt", train=True)
    assert len(got) == len(want)
    for col in ("im_path", "cat", "cad_index", "left", "upper", "right",
                "lower", *anno.LABEL_COLS):
        assert (got[col].values == want[col].values).all(), col


def test_fewshot_sampling(fixture_root):
    fs = anno.pascal3d_frame(fixture_root, "ObjectNet3D.txt", train=True, shot=2, seed=0)
    counts = fs.groupby("cat").size()
    assert (counts == 2).all()


def test_pascal3d_contrast_train_sample(fixture_root):
    ds = datasets.Pascal3DContrast(
        fixture_root, "ObjectNet3D.txt", train=True, shape="PointCloud",
        shape_dir="pointcloud", point_num=100, input_dim=64,
    )
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["im"].shape == (64, 64, 3) and s["im"].dtype == np.float32
    assert s["im_flip"].shape == (64, 64, 3) and s["im_rot"].shape == (64, 64, 3)
    assert s["shape"].shape == (100, 3)
    for k in ("label", "label_flip", "label_rot"):
        lab = s[k]
        assert lab.shape == (3,)
        assert 0 <= lab[0] < 360 and 0 <= lab[1] < 180 and 0 <= lab[2] < 360


def test_pascal3d_contrast_val_sample(fixture_root):
    ds = datasets.Pascal3DContrast(
        fixture_root, "ObjectNet3D.txt", train=False, shape=None, input_dim=64,
    )
    s = ds.get(0, np.random.default_rng(0))
    assert set(s.keys()) == {"im", "label", "cat_id"}
    assert s["cat_id"] >= 0


def test_pascal3d_train_sample(fixture_root):
    ds = datasets.Pascal3D(
        fixture_root, "ObjectNet3D.txt", train=True, shape="PointCloud",
        shape_dir="pointcloud", point_num=64, input_dim=64, random=True,
        novel=False,
    )
    s = ds.get(1, np.random.default_rng(3))
    assert s["im"].shape == (64, 64, 3)
    assert s["shape"].shape == (64, 3)


def test_loader_batches_and_padding(fixture_root):
    ds = datasets.Pascal3DContrast(
        fixture_root, "ObjectNet3D.txt", train=False, shape=None, input_dim=32,
    )
    dl = loader.DataLoader(ds, batch_size=3, shuffle=False, num_workers=2, seed=1)
    batches = list(dl)
    assert len(batches) == len(dl)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert total_valid == len(ds)
    for b in batches:
        assert b["im"].shape == (3, 32, 32, 3)
        assert b["label"].shape == (3, 3)


def test_loader_determinism(fixture_root):
    ds = datasets.Pascal3DContrast(
        fixture_root, "ObjectNet3D.txt", train=True, shape=None, input_dim=32,
    )
    dl1 = loader.DataLoader(ds, batch_size=4, shuffle=True, num_workers=0, seed=7)
    dl2 = loader.DataLoader(ds, batch_size=4, shuffle=True, num_workers=3, seed=7)
    b1 = next(iter(dl1))
    b2 = next(iter(dl2))
    np.testing.assert_allclose(b1["im"], b2["im"])
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_loader_host_sharding(fixture_root):
    ds = datasets.Pascal3DContrast(
        fixture_root, "ObjectNet3D.txt", train=False, shape=None, input_dim=32,
    )
    dl0 = loader.DataLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                            process_index=0, process_count=2)
    dl1 = loader.DataLoader(ds, batch_size=2, shuffle=False, num_workers=0,
                            process_index=1, process_count=2)
    n0 = sum(int(b["valid"].sum()) for b in dl0)
    n1 = sum(int(b["valid"].sum()) for b in dl1)
    assert n0 + n1 == len(ds)


def test_multiview_train_sample(tmp_path):
    root = str(tmp_path / "o3d")
    synthetic.make_objectnet3d_fixture(root, categories=("bed",), n_train_per_cat=2,
                                       n_val_per_cat=1, with_renders=True,
                                       n_renders=144, render_size=24)
    ds = datasets.Pascal3DContrast(
        root, "ObjectNet3D.txt", train=True, shape="MultiView",
        shape_dir="Renders_semi_sphere", view_num=12, tour=2, input_dim=24,
    )
    s = ds.get(0, np.random.default_rng(0))
    assert s["shape"].shape == (12, 24, 24, 3)  # (K, H, W, C) channels-last
    assert s["im"].shape == (24, 24, 3)


def test_linemod_dataset(tmp_path):
    root = str(tmp_path)
    synthetic.make_linemod_fixture(root)
    ds = datasets.Linemod(root, "LineMod.txt", cat_choice=[1], shape=None,
                          input_dim=32)
    assert len(ds) == 4
    s = ds.get(0, np.random.default_rng(0))
    assert s["im"].shape == (32, 32, 3)
    lab = s["label"]
    # LineMod label units: ele+90, inp=(-inp+180)%360 (dataset.py:735-737)
    assert 0 <= lab[1] < 180 and 0 <= lab[2] < 360


def test_shapenet_dataset(tmp_path):
    root = str(tmp_path / "shapenet")
    bg_root = str(tmp_path / "sun")
    synthetic.make_shapenet_fixture(root, bg_root, image_size=240)
    ds = datasets.ShapeNet(root, "ShapeNetCore.txt", bg_dir=bg_root,
                           shape=None, train=True)
    assert len(ds) == 6
    s = ds.get(0, np.random.default_rng(0))
    assert s["im"].shape == (224, 224, 3)
    assert s["label"].shape == (3,)


def test_pix3d_eval_dataset(tmp_path):
    root = str(tmp_path)
    synthetic.make_pix3d_eval_fixture(root)
    ds = datasets.Pix3D(root, "Pix3D.txt", shape=None, input_dim=32,
                        cat_choice=["bed"])
    assert len(ds) == 3
    s = ds.get(0, np.random.default_rng(0))
    assert s["im"].shape == (32, 32, 3)
    lab = s["label"]
    # unit conversion happened upstream: ele+90, inplane rad->deg+180
    assert 0 <= lab[1] < 180 and 0 <= lab[2] <= 360


def test_shapenet_multiview_sample(tmp_path):
    root = str(tmp_path / "shapenet")
    bg_root = str(tmp_path / "sun")
    synthetic.make_shapenet_fixture(root, bg_root, image_size=240,
                                    with_shape_renders=True)
    ds = datasets.ShapeNet(root, "ShapeNetCore.txt", bg_dir=bg_root,
                           shape="MultiView", view_num=12, tour=2, train=True,
                           random=True)
    s = ds.get(0, np.random.default_rng(0))
    assert s["shape"].shape == (12, 24, 24, 3)
    assert s["im"].shape == (224, 224, 3)


def test_pix3d_contrast_pose_batch(tmp_path):
    root = str(tmp_path)
    synthetic.make_pix3d_fixture(root, n_per_cat=8)
    ds = datasets.Pix3DContrast(root, "Pix3D.txt", train=True, pose_batch=True,
                                bs=4, rot=15, input_dim=32)
    s = ds.get(5, np.random.default_rng(0))
    assert s["im"].shape == (32, 32, 3)
    assert "im_pos" in s and "cls_index" in s


# -------------------- KD CLI dataset-regime selection -----------------------


def _kd_opt(data_root, dataset, **over):
    from pose3d_tpu.cli import trainingKD

    args = ["--dataset", dataset, "--shape", "PointCloud", "--shape_dir",
            "pointcloud", "--data_root", data_root, "--input_dim", "32",
            "--point_num", "16"]
    for k, v in over.items():
        args.append(f"--{k}")
        if v is not True:
            args.append(str(v))
    return trainingKD.parse_args(args)


@pytest.fixture(scope="module")
def pascal3d_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kd_roots"))
    synthetic.make_objectnet3d_fixture(
        os.path.join(root, "Pascal3D"), n_train_per_cat=3, n_val_per_cat=2,
        image_size=48, dataset_name="Pascal3D")
    synthetic.make_objectnet3d_fixture(
        os.path.join(root, "ObjectNet3D"), n_train_per_cat=3, n_val_per_cat=2,
        image_size=48)
    return root


def test_kd_dataset_regimes(pascal3d_root):
    """build_kd_datasets mirrors trainingKD.py:148-200: Contrast for the
    3-view regimes (--contrast/--crd/--stage 2), plain Pascal3D for stage 1,
    on both ObjectNet3D and Pascal3D."""
    from pose3d_tpu.cli import common as cli_common

    for name in ("ObjectNet3D", "Pascal3D"):
        for over, want in (
            (dict(crd=True), datasets.Pascal3DContrast),
            (dict(contrast=True), datasets.Pascal3DContrast),
            (dict(stage=2), datasets.Pascal3DContrast),
            (dict(stage=1), datasets.Pascal3D),
        ):
            tr, ev = cli_common.build_kd_datasets(_kd_opt(pascal3d_root, name, **over))
            assert type(tr) is want, (name, over)
            assert type(ev) is want, (name, over)
            # 3-view regimes emit the 7-key contrast sample; stage 1 the
            # plain 3-key sample (reference base_class.py:341 vs 489)
            s = tr.get(0, np.random.default_rng(0))
            if want is datasets.Pascal3DContrast:
                assert {"im", "im_flip", "im_rot", "shape"} <= set(s)
            else:
                assert "im_flip" not in s and {"im", "shape", "label"} <= set(s)


def test_kd_pascal3d_crd_batch_has_three_views(pascal3d_root):
    """The round-1 defect: --dataset Pascal3D --crd built plain Pascal3D and
    crashed on the missing im_flip key at trace time (VERDICT.md missing #2)."""
    from pose3d_tpu.cli import common as cli_common

    opt = _kd_opt(pascal3d_root, "Pascal3D", crd=True)
    tr, _ = cli_common.build_kd_datasets(opt)
    dl = loader.DataLoader(tr, batch_size=2, shuffle=False, num_workers=0)
    batch = next(iter(dl))
    for k in ("im", "im_flip", "im_rot", "label", "label_flip", "label_rot",
              "shape"):
        assert k in batch, k


def test_u8_wire_dewire_1ulp():
    """uint8 wire + on-device dewire reproduces to_float_array to within
    1 ULP for every representable pixel value (XLA strength-reduces the
    /255.0 to a reciprocal multiply) — the 4x transfer cut behind PERF.md
    round 4 "sustained training". No consumer can distinguish 1 ULP of a
    raw pixel: the device photometric augs + normalize run next."""
    import jax.numpy as jnp

    from pose3d_tpu.ops.augment import dewire

    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    host = np.asarray(u8, np.float32) / 255.0  # transforms.to_float_array
    dev = np.asarray(dewire(jnp.asarray(u8)))
    np.testing.assert_array_almost_equal_nulp(host, dev, nulp=1)
    # f32 batches pass through untouched
    f = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    np.testing.assert_array_equal(f, np.asarray(dewire(jnp.asarray(f))))


def test_raw_wire_is_uint8(fixture_root):
    """host_augment=False / device_views emit uint8 images; the default
    host-augmented path stays normalized float32."""
    kw = dict(shape="PointCloud", shape_dir="pointcloud", point_num=32,
              input_dim=64, train=True)
    raw = datasets.Pascal3DContrast(fixture_root, "ObjectNet3D.txt",
                                    host_augment=False, **kw)
    dev = datasets.Pascal3DContrast(fixture_root, "ObjectNet3D.txt",
                                    device_views=True, **kw)
    aug = datasets.Pascal3DContrast(fixture_root, "ObjectNet3D.txt", **kw)
    g = lambda ds: ds.get(0, np.random.default_rng(0))
    assert g(raw)["im"].dtype == np.uint8
    assert g(raw)["im_flip"].dtype == np.uint8
    assert g(dev)["im"].dtype == np.uint8
    assert g(aug)["im"].dtype == np.float32


def test_prefetcher_order_and_exceptions():
    """The threaded Prefetcher preserves order, applies place_fn, and
    re-raises host-pipeline exceptions at the consumer."""
    import pytest as _pytest

    from pose3d_tpu.data.loader import Prefetcher

    assert list(Prefetcher(range(7), lambda x: x * 2, depth=2)) == \
        [0, 2, 4, 6, 8, 10, 12]

    def boom():
        yield 1
        raise RuntimeError("host pipeline died")

    it = Prefetcher(boom(), lambda x: x)
    assert next(it) == 1
    with _pytest.raises(RuntimeError, match="host pipeline died"):
        for _ in range(4):
            next(it)


# ----------------------------- decode cache ---------------------------------


def test_decode_cache_exact_across_epochs(fixture_root):
    """Caching decoded images is exact: identical samples to the uncached
    dataset over two epochs (decode is deterministic; every downstream PIL op
    returns a new image), with the second epoch served from cache."""
    kw = dict(train=True, shape="PointCloud", shape_dir="pointcloud",
              point_num=64, input_dim=64)
    base = datasets.Pascal3DContrast(fixture_root, "ObjectNet3D.txt", **kw)
    cached = datasets.Pascal3DContrast(fixture_root, "ObjectNet3D.txt",
                                       decode_cache_mb=64, **kw)
    for epoch in range(2):
        for idx in range(len(base)):
            a = base.get(idx, np.random.default_rng((46, epoch, idx)))
            b = cached.get(idx, np.random.default_rng((46, epoch, idx)))
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=k)
    st = cached.cache.stats()
    assert st["hits"] > 0 and st["items"] > 0
    # epoch 2 decoded nothing new
    assert st["misses"] == len(base)


def test_decode_cache_multiview_renders(tmp_path):
    """MultiView renders are the hottest cache keys: after one sample the
    next hits entirely (fixture renders fit the budget)."""
    root = str(tmp_path / "o3d")
    synthetic.make_objectnet3d_fixture(root, categories=("bed",),
                                       n_train_per_cat=2, n_val_per_cat=1,
                                       with_renders=True, n_renders=144,
                                       render_size=24)
    kw = dict(train=True, shape="MultiView", view_num=12, tour=2, input_dim=24)
    base = datasets.Pascal3DContrast(root, "ObjectNet3D.txt", **kw)
    cached = datasets.Pascal3DContrast(root, "ObjectNet3D.txt",
                                       decode_cache_mb=64, **kw)
    for idx in range(2):
        a = base.get(idx, np.random.default_rng((1, 0, idx)))
        b = cached.get(idx, np.random.default_rng((1, 0, idx)))
        np.testing.assert_array_equal(a["shape"], b["shape"])
        np.testing.assert_array_equal(a["im"], b["im"])


def test_decode_cache_lru_byte_cap(tmp_path):
    from PIL import Image

    from pose3d_tpu.data import decode_cache

    paths = []
    for i in range(4):
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(
            np.full((100, 100, 3), i * 10, np.uint8)).save(p)
        paths.append(p)
    # each decoded image is 100*100*3 = 30000 B; cap fits exactly two
    cache = decode_cache.DecodeCache(60000 / (1 << 20))
    for p in paths:
        cache.open_rgb(p)
    st = cache.stats()
    assert st["items"] == 2 and st["mb"] * (1 << 20) <= 60000
    # most-recent two are resident: re-opening them adds no miss
    cache.open_rgb(paths[2]), cache.open_rgb(paths[3])
    assert cache.stats()["misses"] == 4
    # evicted one misses again
    cache.open_rgb(paths[0])
    assert cache.stats()["misses"] == 5
    # an image larger than the whole budget is served uncached, not stored
    big = str(tmp_path / "big.png")
    Image.fromarray(np.zeros((200, 200, 3), np.uint8)).save(big)
    im = decode_cache.DecodeCache(30000 / (1 << 20)).open_rgb(big)
    assert im.size == (200, 200)


def test_decode_cache_pickles_empty(fixture_root):
    """ShmDataLoader pickles the dataset to spawn workers: the cache must
    cross as capacity-only (decoded buffers never enter the pipe)."""
    import pickle

    ds = datasets.Pascal3DContrast(
        fixture_root, "ObjectNet3D.txt", train=True, shape=None, input_dim=64,
        decode_cache_mb=32)
    ds.get(0, np.random.default_rng(0))
    assert ds.cache.stats()["items"] > 0
    clone = pickle.loads(pickle.dumps(ds))
    assert clone.cache.capacity_mb == 32
    assert clone.cache.stats() == {"items": 0, "mb": 0.0, "hits": 0, "misses": 0}
    # and the clone still produces identical samples
    a = ds.get(1, np.random.default_rng(7))
    b = clone.get(1, np.random.default_rng(7))
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
