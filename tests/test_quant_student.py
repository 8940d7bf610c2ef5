"""int8 PTQ serving path (pose3d_tpu/serving/quant_student.py).

Checks the quantized forward against the flax BaselineEstimator eval graph it
mirrors: same six-head order, near-identical logits on non-degenerate
weights, and exactness of the structural invariants (int8 weight storage,
pool-on-int32 commute with the channel scale).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pose3d_tpu.models import BaselineEstimator
from pose3d_tpu.serving import quantize_student, student_int8_infer


def _boosted_variables(model, im):
    """Model init gives ~1e-11 head logits (dense_init_1e3 through 11
    layers); rescale dense kernels so activations are O(1) and agreement
    thresholds are meaningful."""
    v = model.init(jax.random.key(0), im[:1], train=False)

    def boost(path, a):
        p = "/".join(str(k.key) for k in path)
        a = np.asarray(a, np.float32)
        if "Dense" in p and "kernel" in p:
            return a / (np.std(a) + 1e-12) * (1.5 / np.sqrt(a.shape[0]))
        return a

    return {"params": jax.tree_util.tree_map_with_path(boost, v["params"]),
            "batch_stats": v["batch_stats"]}


def test_int8_student_matches_f32_model():
    rng = np.random.default_rng(0)
    m = BaselineEstimator(img_feature_dim=256)
    im = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    v = _boosted_variables(m, im)
    q = quantize_student(v, [np.asarray(im),
                             rng.standard_normal((4, 64, 64, 3))])

    # int8 storage actually happens
    assert q["convs"][0]["w"].dtype == jnp.int8
    assert q["fcs"][0]["w"].dtype == jnp.int8

    out_q = jax.jit(lambda qq, x: student_int8_infer(qq, x, jnp.float32))(q, im)
    out_f, _ = m.apply(v, im, train=False)
    assert len(out_q) == 6
    for a, b in zip(out_q, out_f):
        a, b = np.asarray(a), np.asarray(b, np.float32)
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert cos > 0.995, cos
        assert np.mean(np.argmax(a, 1) == np.argmax(b, 1)) >= 0.75
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-9) < 0.1


def test_int8_shapes_and_head_order():
    """Head widths must follow the canonical [cls_azi, cls_ele, cls_inp,
    reg_azi, reg_ele, reg_inp] = [24, 12, 24, 24, 12, 24] order."""
    rng = np.random.default_rng(1)
    m = BaselineEstimator(img_feature_dim=256)
    im = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.key(0), im[:1], train=False)
    q = quantize_student(v, [np.asarray(im)])
    out = student_int8_infer(q, im, jnp.float32)
    assert [o.shape[-1] for o in out] == [24, 12, 24, 24, 12, 24]
    assert all(o.shape[0] == 2 for o in out)


def test_quantized_save_load_roundtrip(tmp_path):
    from pose3d_tpu.serving.quant_student import save_quantized, load_quantized

    rng = np.random.default_rng(2)
    m = BaselineEstimator(img_feature_dim=256)
    im = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.key(0), im[:1], train=False)
    q = quantize_student(v, [np.asarray(im)])
    path = str(tmp_path / "student_q.npz")
    save_quantized(q, path)
    q2 = load_quantized(path)
    a = student_int8_infer(q, im, jnp.float32)
    b = student_int8_infer(q2, im, jnp.float32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_artifact_kind_validation(tmp_path):
    """Loading the wrong artifact kind fails loudly at load time, not with a
    cryptic pytree/shape error later."""
    import pytest
    from pose3d_tpu.serving.quant_student import save_quantized, load_quantized
    from pose3d_tpu.serving.quant_teacher import load_quantized_teacher

    rng = np.random.default_rng(7)
    m = BaselineEstimator(img_feature_dim=256)
    im = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.key(0), im, train=False)
    q = quantize_student(v, [np.asarray(im)])
    path = str(tmp_path / "student_q.npz")
    save_quantized(q, path)
    with pytest.raises(ValueError, match="not a teacher int8 artifact"):
        load_quantized_teacher(path)
    # and a teacher-schema file through the student loader
    save_quantized({"stem": q["stem"],
                    "blocks": [[{"w": np.zeros((1, 1, 4, 4), np.int8)}]],
                    "fc": {"kernel": np.zeros((4, 4), np.float32)}},
                   str(tmp_path / "teacher_q.npz"))
    with pytest.raises(ValueError, match="not a student int8 artifact"):
        load_quantized(str(tmp_path / "teacher_q.npz"))


def test_int8_width_mult_student():
    """The quantizer is shape-generic: the narrow-student extension
    (width_mult) quantizes and runs through the same path."""
    rng = np.random.default_rng(3)
    m = BaselineEstimator(img_feature_dim=256, width_mult=0.5)
    im = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.key(0), im[:1], train=False)
    q = quantize_student(v, [np.asarray(im)])
    out = student_int8_infer(q, im, jnp.float32)
    assert [o.shape[-1] for o in out] == [24, 12, 24, 24, 12, 24]
