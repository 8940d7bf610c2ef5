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


def test_pallas_pointnet_matches_xla(rng):
    _, _, folded = _folded(rng)
    # P deliberately NOT a multiple of the 512 block to exercise padding
    pts = jnp.asarray(rng.random((3, 700, 3)).astype(np.float32))
    ref = _xla_pointnet_eval(pts, *[x for pair in folded for x in pair])
    out = pallas_pointnet_interpret(pts, folded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
