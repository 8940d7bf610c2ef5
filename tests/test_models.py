"""Model structure tests: output shapes/arities, parameter-count parity with
the reference torch models (imported read-only from /root/reference for
counting only), BN mutability, and jit-ability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pose3d_tpu.models import (
    BaselineEstimator,
    PoseEstimator,
    PoseEstimatorVanilla,
    ShapeEncoderPC,
    DeformNet,
    resnet50,
    vgg11,
)

IMG = (2, 64, 64, 3)  # small spatial dims for fast CPU tests (conv nets are size-agnostic
# down to 32px thanks to global pooling; VGG needs 224 for its 7x7 flatten — use 224 there)


def _init(model, *args):
    variables = model.init(jax.random.key(0), *args, train=False)
    return variables


def test_pointnet_shapes():
    m = ShapeEncoderPC(feature_dim=1024)
    pts = jnp.zeros((2, 500, 3))
    v = _init(m, pts)
    out, _ = m.apply(v, pts, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 1024)
    assert "batch_stats" in v


def test_deformnet_shapes():
    m = DeformNet(bottleneck_size=2048)
    x = jnp.zeros((4, 2048))
    v = _init(m, x)
    out = m.apply(v, x, train=False)
    assert out.shape == (4, 200)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh output


def test_resnet50_two_output_forward():
    m = resnet50(num_classes=1024)
    x = jnp.zeros(IMG)
    v = _init(m, x)
    feat, out = m.apply(v, x, train=False)
    assert feat.shape == (2, 2048)  # pre-fc pooled feature
    assert out.shape == (2, 1024)  # fc output


def test_baseline_estimator_arity():
    m = BaselineEstimator(img_feature_dim=2048)
    x = jnp.zeros((2, 224, 224, 3))
    v = _init(m, x)
    outputs, proj = m.apply(v, x, train=False)
    assert len(outputs) == 6
    assert [o.shape[-1] for o in outputs] == [24, 12, 24, 24, 12, 24]
    assert proj.shape == (2, 200)


def test_pose_estimator_arity_pointcloud():
    m = PoseEstimator(shape="PointCloud", img_feature_dim=1024, shape_feature_dim=1024)
    im = jnp.zeros(IMG)
    pc = jnp.zeros((2, 500, 3))
    v = _init(m, im, pc)
    outputs, fused, proj = m.apply(v, im, pc, train=False)
    assert len(outputs) == 6
    assert fused.shape == (2, 200)
    assert proj.shape == (2, 200)


def test_pose_estimator_arity_multiview():
    """MultiView teacher (reference model.py:103-150 + 206-272): renders
    (N, K, H, W, 3) -> K per-view resnet18 features concatenated, fused with
    the image feature through DeformNet."""
    m = PoseEstimator(shape="MultiView", view_num=3, img_feature_dim=64,
                      shape_feature_dim=32)
    im = jnp.zeros(IMG)
    mv = jnp.zeros((2, 3, 32, 32, 3))
    v = _init(m, im, mv)
    outputs, fused, proj = m.apply(v, im, mv, train=False)
    assert len(outputs) == 6
    assert fused.shape == (2, 200)
    assert proj.shape == (2, 200)


def test_shape_encoder_mv_shapes():
    from pose3d_tpu.models.multiview import ShapeEncoderMV, ShapeEncoderMVRaw

    mv = jnp.zeros((2, 3, 32, 32, 3))
    flat = ShapeEncoderMV(feature_dim=16)
    v = flat.init(jax.random.key(0), mv, train=False)
    assert flat.apply(v, mv, train=False).shape == (2, 48)
    raw = ShapeEncoderMVRaw(feature_dim=16)
    v = raw.init(jax.random.key(0), mv, train=False)
    assert raw.apply(v, mv, train=False).shape == (2, 3, 16)


def test_pose_estimator_vanilla_two_tuple():
    m = PoseEstimatorVanilla(shape="PointCloud", img_feature_dim=1024, shape_feature_dim=256)
    im = jnp.zeros(IMG)
    pc = jnp.zeros((2, 500, 3))
    v = _init(m, im, pc)
    out = m.apply(v, im, pc, train=False)
    assert len(out) == 2
    assert out[1].shape == (2, 200)


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.mark.slow
def test_param_count_parity_with_reference():
    """Parameter counts must match the reference torch models exactly
    (auxiliary/model.py). Counted against the reference repo read-only."""
    im = jnp.zeros((1, 224, 224, 3))
    pc = jnp.zeros((1, 2500, 3))

    student = BaselineEstimator(img_feature_dim=2048)
    v = student.init(jax.random.key(0), im, train=False)
    assert _count(v["params"]) + _count(v["batch_stats"]) // 2 * 0 + _count_bn_stats_as_params(v) == 139304512

    teacher = PoseEstimator(shape="PointCloud", img_feature_dim=1024, shape_feature_dim=1024)
    vt = teacher.init(jax.random.key(0), im, pc, train=False)
    assert _count(vt["params"]) + _count_bn_stats_as_params(vt) == 33925528

    vanilla = PoseEstimatorVanilla(shape="PointCloud", img_feature_dim=1024,
                                   shape_feature_dim=256)
    vv = vanilla.init(jax.random.key(0), im, pc, train=False)
    assert _count(vv["params"]) + _count_bn_stats_as_params(vv) == 13196640


def _count_bn_stats_as_params(variables):
    """torch counts BN scale+bias in parameters(); flax puts them in params
    too (scale, bias) — running mean/var live in batch_stats in both
    frameworks and are not in torch .parameters(). So nothing extra."""
    return 0


def test_vgg11_feature_dim():
    m = vgg11(num_classes=2048)
    x = jnp.zeros((1, 224, 224, 3))
    v = _init(m, x)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 2048)


def test_width_mult_student():
    """Narrower-student extension: half-width VGG keeps head shapes."""
    m = BaselineEstimator(img_feature_dim=128, width_mult=0.5)
    x = jnp.zeros((2, 64, 64, 3))
    v = _init(m, x)
    outputs, proj = m.apply(v, x, train=False)
    assert [o.shape[-1] for o in outputs] == [24, 12, 24, 24, 12, 24]
    assert proj.shape == (2, 200)
    # conv channels actually halved: first conv 32 instead of 64
    assert v["params"]["VGG_0"]["Conv_0"]["kernel"].shape[-1] == 32


def test_batch_stats_update_in_train_mode():
    m = ShapeEncoderPC(feature_dim=64)
    pts = jax.random.normal(jax.random.key(1), (8, 100, 3))
    v = _init(m, pts)
    _, updates = m.apply(v, pts, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_student_forward_jits():
    m = BaselineEstimator(img_feature_dim=256)  # small for CPU test speed
    x = jnp.zeros((2, 224, 224, 3))
    v = _init(m, x)

    @jax.jit
    def fwd(variables, im):
        return m.apply(variables, im, train=False)

    outputs, proj = fwd(v, x)
    assert len(outputs) == 6 and proj.shape == (2, 200)


def test_teacher_view_tile_matches_tiled_shapes(rng):
    """view_tile=3 (encode unique shapes once, tile features) must equal
    feeding the tiled point clouds — exact in eval mode (running-stats BN),
    which is how the frozen KD/stage-2 teachers run (train/steps.py)."""
    from pose3d_tpu.models import PoseEstimator, PoseEstimatorVanilla

    im = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    pc = jnp.asarray(rng.random((4, 64, 3)).astype(np.float32))
    im3 = jnp.concatenate([im, im[:, :, ::-1], im[:, ::-1]], axis=0)
    pc3 = jnp.concatenate([pc] * 3, axis=0)

    for cls, n_out in ((PoseEstimator, 3), (PoseEstimatorVanilla, 2)):
        model = cls(shape="PointCloud", img_feature_dim=64, shape_feature_dim=64)
        v = model.init(jax.random.key(0), im[:1], pc[:1], train=False)
        ref = model.apply(v, im3, pc3, train=False)
        out = model.apply(v, im3, pc, train=False, view_tile=3)
        # reduction-order noise only: the encoder runs at a different batch
        # size, and the virtual-8-device CPU build partitions reduces
        # differently per shape (~1e-17 absolute)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-9)


def test_teacher_view_tile_matches_tiled_shapes_multiview(rng):
    """Same view_tile exactness for the MultiView teacher: the tiled feature
    is the flattened (N, K*fdim) render embedding."""
    from pose3d_tpu.models import PoseEstimator

    im = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    rend = jnp.asarray(rng.standard_normal((2, 3, 24, 24, 3)).astype(np.float32))
    im3 = jnp.concatenate([im, im[:, :, ::-1], im[:, ::-1]], axis=0)
    rend3 = jnp.concatenate([rend] * 3, axis=0)

    model = PoseEstimator(shape="MultiView", view_num=3, img_feature_dim=32,
                          shape_feature_dim=8)
    v = model.init(jax.random.key(0), im[:1], rend[:1], train=False)
    ref = model.apply(v, im3, rend3, train=False)
    out = model.apply(v, im3, rend, train=False, view_tile=3)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-9)


@pytest.mark.parametrize("mode", ["full", "elementwise"])
def test_resnet_remat_matches_plain(mode):
    """remat=full/elementwise (measured-negative experiment record, kept
    flag-gated — models/resnet.py) must keep the variable tree identical
    (checkpoint compat: explicit Bottleneck_k names pin the non-remat naming)
    and reproduce outputs, grads and BN stat updates of the plain path up to
    fusion-boundary rounding."""
    from pose3d_tpu.models.resnet import resnet18

    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64, 64, 3)),
                    jnp.float32)
    plain = resnet18(num_classes=32)
    rem = resnet18(num_classes=32, remat=mode)
    v = plain.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        rem.init(jax.random.key(0), x, train=False))

    def loss(m):
        def f(params):
            (feat, out), upd = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out**2) + jnp.sum(feat**2), upd["batch_stats"]
        return jax.jit(jax.value_and_grad(f, has_aux=True))(v["params"])

    (l0, bs0), g0 = loss(plain)
    (l1, bs1), g1 = loss(rem)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


def test_vgg_deep_pool_fold_matches_plain():
    """fold_deep_pools (4 shared-kernel stride-2 phase convs per deep
    conv+pool pair — models/vgg.py _ConvPool2x2Deep) must keep the param tree
    identical and reproduce outputs and grads of the unfolded graph on the
    same params. f32 CPU: outputs agree to fp-roundoff; grads too (tie-free
    random inputs — tie ROUTING parity with torch is pinned separately for
    the where-chain pattern by test_ops)."""
    from pose3d_tpu.models.vgg import vgg11

    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 64, 64, 3)),
                    jnp.float32)
    plain = vgg11(num_classes=64, dropout_rate=0.0)
    folded = vgg11(num_classes=64, dropout_rate=0.0, fold_deep_pools=8)
    v = plain.init(jax.random.key(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        folded.init(jax.random.key(0), x, train=False))

    def out(m):
        return m.apply(v, x, train=False)

    np.testing.assert_allclose(np.asarray(out(plain)), np.asarray(out(folded)),
                               rtol=1e-5, atol=1e-5)

    def loss(m):
        return jax.jit(jax.grad(
            lambda p: jnp.sum(m.apply({"params": p}, x, train=False) ** 2)))(
                v["params"])

    for a, b in zip(jax.tree.leaves(loss(plain)), jax.tree.leaves(loss(folded))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
