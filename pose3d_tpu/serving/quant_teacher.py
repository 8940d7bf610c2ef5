"""Post-training int8 quantization of the teacher's ResNet-50 image encoder.

The teacher eval path (PoseEstimator, reference model.py:206-272) spends its
FLOPs in resnet50 (~4.1 GFLOP/img at 224 vs ~0.7 for the PointNet and <0.1
for DeformNet+heads), so v1 quantizes exactly that: all 52 bottleneck convs
run s8 x s8 -> s32 with the eval-mode BatchNorm folded into the dequant
affine (y = conv_s32 * (a_scale * w_scale[c] * g[c]) + h[c] — one fused
multiply-add per element, no separate BN op). The 7x7 stem stays bf16
(C_in=3), the fc head, ShapeEncoderPC, DeformNet and the six heads run
through their own flax submodules in bf16 (their param subtrees are
self-contained, so no graph replication is needed for them).

Same PTQ scheme as quant_student.py: per-output-channel int8 weights,
per-tensor calibrated activation scales, first-layer/bf16-tail insurance.
The quantizer/forward are arch-generic over models/resnet.py (Bottleneck
and BasicBlock): the MultiView teacher quantizes BOTH its resnet50 image
encoder and the resnet18 its ShapeEncoderMV runs per render view
(quantize_teacher_mv) — at view_num=12 the render encoder dominates MV
eval FLOPs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.serving.quant_student import _quantize_act, _quantize_weight

_EPS = 1e-5  # flax nn.BatchNorm epsilon (models/common.py ConvBN)

# Arch table (models/resnet.py): block naming is Bottleneck_k / BasicBlock_k,
# ConvBN_i inside, downsample = the last declared ConvBN when present.
_ARCHS = {
    "resnet50": {"stages": (3, 4, 6, 3), "block": "bottleneck",
                 "block_prefix": "Bottleneck"},
    "resnet18": {"stages": (2, 2, 2, 2), "block": "basic",
                 "block_prefix": "BasicBlock"},
}


def _stage_first(stages):
    """k -> strides for the opening block of each stage (stage 0 opens at
    stride 1 but may still carry a channel-matching downsample)."""
    out, k = {}, 0
    for i, n in enumerate(stages):
        out[k] = (1, 1) if i == 0 else (2, 2)
        k += n
    return out


def _conv_specs(block, strides):
    """Per-ConvBN (name, strides, padding, relu_after) in application order,
    plus the downsample ConvBN name. Mirrors models/resnet.py:
    Bottleneck 1x1/1+relu, 3x3/s+relu, 1x1/1 (ds=ConvBN_3);
    BasicBlock 3x3/s+relu, 3x3/1 (ds=ConvBN_2). Block output relu runs on
    y + residual."""
    if block == "bottleneck":
        return [("ConvBN_0", (1, 1), ((0, 0), (0, 0)), True),
                ("ConvBN_1", strides, ((1, 1), (1, 1)), True),
                ("ConvBN_2", (1, 1), ((0, 0), (0, 0)), False)], "ConvBN_3"
    return [("ConvBN_0", strides, ((1, 1), (1, 1)), True),
            ("ConvBN_1", (1, 1), ((1, 1), (1, 1)), False)], "ConvBN_2"


def _affine(bn_p, bn_s):
    # jnp so this works both on concrete np params and inside the jitted
    # calibration forward (tracers)
    g = jnp.asarray(bn_p["scale"], jnp.float32) / jnp.sqrt(
        jnp.asarray(bn_s["var"], jnp.float32) + _EPS)
    h = (jnp.asarray(bn_p["bias"], jnp.float32)
         - jnp.asarray(bn_s["mean"], jnp.float32) * g)
    return g, h


def _conv(x, k, strides, padding, acc=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, strides, padding,
                                        dimension_numbers=dn,
                                        preferred_element_type=acc)


def _max_pool_3x3_2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))


def _block_convs(block_params, block_stats, k, arch):
    """Yield (name, kernel, (g, h), strides, padding) for each ConvBN of
    block k in application order (downsample last when present)."""
    a = _ARCHS[arch]
    s = _stage_first(a["stages"]).get(k, (1, 1))
    spec, ds_name = _conv_specs(a["block"], s)
    names = [(n, st, pad) for n, st, pad, _relu in spec]
    if ds_name in block_params:
        names.append((ds_name, s, ((0, 0), (0, 0))))
    for name, strides, pad in names:
        yield (name, jnp.asarray(block_params[name]["Conv_0"]["kernel"], jnp.float32),
               _affine(block_params[name]["BatchNorm_0"],
                       block_stats[name]["BatchNorm_0"]),
               strides, pad)


def _observe_resnet(rn_params, rn_stats, x, arch="resnet50"):
    """f32 eval replica of models/resnet.py (stem relu-after-pool included),
    returning (fc_out, {quant_point: max_abs})."""
    a = _ARCHS[arch]
    n_blocks = sum(a["stages"])
    stats = {}
    g, h = _affine(rn_params["ConvBN_0"]["BatchNorm_0"],
                   rn_stats["ConvBN_0"]["BatchNorm_0"])
    x = _conv(x, rn_params["ConvBN_0"]["Conv_0"]["kernel"].astype(jnp.float32),
              (2, 2), ((3, 3), (3, 3))) * g + h
    x = jax.nn.relu(_max_pool_3x3_2(x))

    last = "ConvBN_%d" % (len(_conv_specs(a["block"], (1, 1))[0]) - 1)
    ds_name = _conv_specs(a["block"], (1, 1))[1]
    for k in range(n_blocks):
        bp = rn_params[f"{a['block_prefix']}_{k}"]
        bs = rn_stats[f"{a['block_prefix']}_{k}"]
        residual = x
        y = x
        for name, kern, (g, h), strides, pad in _block_convs(bp, bs, k, arch):
            if name == ds_name:
                stats[f"b{k}_{name}"] = jnp.max(jnp.abs(residual))
                residual = _conv(residual, kern, strides, pad) * g + h
                continue
            stats[f"b{k}_{name}"] = jnp.max(jnp.abs(y))
            y = _conv(y, kern, strides, pad) * g + h
            if name != last:
                y = jax.nn.relu(y)
        x = jax.nn.relu(y + residual)

    feat = jnp.mean(x, axis=(1, 2))
    fc = rn_params["Dense_0"]
    return feat @ fc["kernel"].astype(jnp.float32) + fc["bias"], stats


def quantize_resnet(rn_params, rn_stats, calibration_batches,
                    arch="resnet50") -> dict:
    """Quantize one flax resnet subtree ({Bottleneck|BasicBlock}_k naming,
    models/resnet.py): all block convs int8 with eval-BN folded into the
    dequant affine; 7x7 stem + fc stay full precision. Returns the pytree
    for `resnet_int8_forward` (arch itself is NOT stored — pass it to the
    forward, pytree leaves must be arrays)."""
    a = _ARCHS[arch]
    n_blocks = sum(a["stages"])
    rn_p = jax.tree.map(lambda x: np.asarray(x), rn_params)
    rn_s = jax.tree.map(lambda x: np.asarray(x), rn_stats)
    observe = jax.jit(_observe_resnet, static_argnums=(3,))
    maxes = {}
    for batch in calibration_batches:
        _, stats = observe(rn_p, rn_s, jnp.asarray(batch, jnp.float32), arch)
        for k, v in stats.items():
            maxes[k] = max(maxes.get(k, 0.0), float(v))
    if not maxes:
        raise ValueError("calibration_batches was empty")

    sg, sh = _affine(rn_p["ConvBN_0"]["BatchNorm_0"],
                     rn_s["ConvBN_0"]["BatchNorm_0"])
    q = {"stem": {"kernel": jnp.asarray(rn_p["ConvBN_0"]["Conv_0"]["kernel"]),
                  "g": jnp.asarray(sg), "h": jnp.asarray(sh)},
         "blocks": [],
         "fc": {"kernel": jnp.asarray(rn_p["Dense_0"]["kernel"]),
                "bias": jnp.asarray(rn_p["Dense_0"]["bias"])}}
    for k in range(n_blocks):
        bp = rn_p[f"{a['block_prefix']}_{k}"]
        bs = rn_s[f"{a['block_prefix']}_{k}"]
        block = []
        for name, kern, (g, h), _strides, _pad in _block_convs(bp, bs, k, arch):
            wq, ws = _quantize_weight(kern)
            block.append({"w": wq,
                          "s": jnp.asarray(ws * np.asarray(g)),  # a_scale at use
                          "h": jnp.asarray(h),
                          "a": jnp.float32(max(maxes[f"b{k}_{name}"], 1e-12)
                                           / 127.0)})
        q["blocks"].append(block)
    return q


def quantize_teacher_resnet(variables, calibration_batches) -> dict:
    """variables: trained PoseEstimator {'params','batch_stats'}.
    calibration_batches: iterable of (N, H, W, 3) image arrays. Returns the
    quantized resnet50 pytree for `make_teacher_int8_infer`."""
    return quantize_resnet(variables["params"]["ResNet_0"],
                           variables["batch_stats"]["ResNet_0"],
                           calibration_batches, arch="resnet50")


def resnet_int8_forward(q, im, arch="resnet50", dtype=jnp.bfloat16):
    """Quantized eval forward -> fc output."""
    a = _ARCHS[arch]
    n_convs = len(_conv_specs(a["block"], (1, 1))[0])
    stage_first = _stage_first(a["stages"])
    x = _conv(im.astype(dtype), q["stem"]["kernel"].astype(dtype),
              (2, 2), ((3, 3), (3, 3)))
    x = x.astype(jnp.float32) * q["stem"]["g"] + q["stem"]["h"]
    x = jax.nn.relu(_max_pool_3x3_2(x)).astype(dtype)

    for k, block in enumerate(q["blocks"]):
        strides = stage_first.get(k, (1, 1))
        spec, _ = _conv_specs(a["block"], strides)
        residual = x
        y = x
        for i, c in enumerate(block[:n_convs]):
            _name, st, pad, relu_after = spec[i]
            yq = _quantize_act(y, c["a"])
            z = _conv(yq, c["w"], st, pad, acc=jnp.int32)
            y = (z.astype(jnp.float32) * (c["a"] * c["s"]) + c["h"]).astype(dtype)
            if relu_after:
                y = jax.nn.relu(y)
        if len(block) == n_convs + 1:
            c = block[n_convs]
            rq = _quantize_act(residual, c["a"])
            z = _conv(rq, c["w"], strides, ((0, 0), (0, 0)), acc=jnp.int32)
            residual = (z.astype(jnp.float32) * (c["a"] * c["s"])
                        + c["h"]).astype(dtype)
        x = jax.nn.relu(y + residual)

    feat = jnp.mean(x, axis=(1, 2))
    return feat @ q["fc"]["kernel"].astype(dtype) + q["fc"]["bias"].astype(dtype)


def resnet50_int8_forward(q, im, dtype=jnp.bfloat16):
    """Quantized resnet50 eval forward (the teacher's img_feature)."""
    return resnet_int8_forward(q, im, arch="resnet50", dtype=dtype)


def _unflatten_resnet(items) -> dict:
    """Rebuild one quantized-resnet pytree from (relative_key, array)."""
    q = {"stem": {}, "blocks": [], "fc": {}}
    blocks: dict[int, dict[int, dict]] = {}
    for key, arr in items:
        parts = key.split("/")
        if parts[0] in ("stem", "fc"):
            q[parts[0]][parts[1]] = jnp.asarray(arr)
        else:
            blocks.setdefault(int(parts[1]), {}).setdefault(
                int(parts[2]), {})[parts[3]] = jnp.asarray(arr)
    q["blocks"] = [[blocks[k][i] for i in sorted(blocks[k])]
                   for k in sorted(blocks)]
    return q


def load_quantized_teacher(path: str) -> dict:
    """Inverse of quant_student.save_quantized for the teacher schemas: a
    single quantized resnet ({stem, blocks[k][i]{w,s,h,a}, fc}) or the
    MultiView pair ({img, shape}); the flattener itself is generic."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    groups = {k.split("/")[1] for k in data.keys()}
    if not groups <= {"stem", "blocks", "fc", "img", "shape"}:
        raise ValueError(
            f"{path}: not a teacher int8 artifact (top-level groups "
            f"{sorted(groups)}); student artifacts load via "
            "quant_student.load_quantized")
    items = [(k.split("/", 1)[1], v) for k, v in data.items()]
    if any(k.startswith(("img/", "shape/")) for k, _ in items):
        return {side: _unflatten_resnet(
                    [(k.split("/", 1)[1], v) for k, v in items
                     if k.startswith(side + "/")])
                for side in ("img", "shape")}
    return _unflatten_resnet(items)


def quantize_teacher_mv(variables, calibration_images,
                        calibration_renders) -> dict:
    """MultiView teacher: quantize BOTH conv trunks — the resnet50 image
    encoder and the resnet18 the ShapeEncoderMV runs over every render view
    (at view_num=12 the render encoder is the FLOPs bulk of MV teacher
    eval). calibration_renders: iterable of (N, K, H, W, 3). Returns
    {"img": q50, "shape": q18} for `make_teacher_int8_infer`."""
    q_img = quantize_resnet(variables["params"]["ResNet_0"],
                            variables["batch_stats"]["ResNet_0"],
                            calibration_images, arch="resnet50")
    flat = [np.asarray(r).reshape((-1,) + np.asarray(r).shape[2:])
            for r in calibration_renders]
    q_shape = quantize_resnet(
        variables["params"]["ShapeEncoderMV_0"]["ResNet_0"],
        variables["batch_stats"]["ShapeEncoderMV_0"]["ResNet_0"],
        flat, arch="resnet18")
    return {"img": q_img, "shape": q_shape}


def make_teacher_int8_infer(teacher):
    """teacher: the PoseEstimator module. Returns a jittable
    fn(q, variables, im, shape) -> [6 head outputs] that runs the conv
    trunks int8 and the fusion/head submodules through flax in the model
    dtype. PointCloud: q = quantize_teacher_resnet(...) (resnet50 only,
    ShapeEncoderPC stays bf16). MultiView: q = quantize_teacher_mv(...)
    (both resnet trunks int8)."""
    from pose3d_tpu.models.estimators import _SixHeads
    from pose3d_tpu.models import ShapeEncoderPC
    from pose3d_tpu.models.deformnet import DeformNet

    if teacher.shape == "PointCloud":
        fused_dim = teacher.shape_feature_dim
        sp = ShapeEncoderPC(teacher.shape_feature_dim, dtype=teacher.dtype)

        def shape_feat(q, p, b, shape):
            return sp.apply({"params": p["ShapeEncoderPC_0"],
                             "batch_stats": b["ShapeEncoderPC_0"]},
                            shape, train=False)

        def img_q(q):
            return q
    else:
        fused_dim = teacher.shape_feature_dim * teacher.view_num

        def shape_feat(q, p, b, shape):
            n, k = shape.shape[0], shape.shape[1]
            flat = shape.reshape((n * k,) + shape.shape[2:])
            feat = resnet_int8_forward(q["shape"], flat, arch="resnet18",
                                       dtype=teacher.dtype)
            return feat.reshape(n, -1)

        def img_q(q):
            return q["img"]

    dn = DeformNet(bottleneck_size=fused_dim + teacher.img_feature_dim,
                   dtype=teacher.dtype)
    heads = _SixHeads(teacher.azi_classes, teacher.ele_classes,
                      teacher.inp_classes, teacher.dtype)

    def infer(q, variables, im, shape):
        p, b = variables["params"], variables["batch_stats"]
        img_feature = resnet_int8_forward(img_q(q), im, arch="resnet50",
                                          dtype=teacher.dtype)
        shape_feature = shape_feat(q, p, b, shape)
        fused = jnp.concatenate([shape_feature, img_feature], axis=-1)
        x = dn.apply({"params": p["DeformNet_0"],
                      "batch_stats": b["DeformNet_0"]}, fused, train=False)
        return heads.apply({"params": p["_SixHeads_0"]}, x)

    return infer


def quantize_teacher_vanilla(variables, calibration_batches) -> dict:
    """Vanilla (stage-1/stage-2) teacher, PoseEstimatorVanilla: quantize its
    resnet18 image encoder (ShapeEncoderPC + compress MLP + heads stay in
    the model dtype through flax)."""
    return quantize_resnet(variables["params"]["ResNet_0"],
                           variables["batch_stats"]["ResNet_0"],
                           calibration_batches, arch="resnet18")


def make_vanilla_int8_kd_fwd(teacher):
    """Frozen vanilla-teacher forward for the stage-2 step: fn(q, variables,
    im, shape, view_tile) -> [6 head outputs] — element 0 of
    PoseEstimatorVanilla.apply(..., train=False, view_tile=v), the only
    thing stage-2 response KD consumes (models/estimators.py; reference
    base_class.py:626)."""
    if teacher.shape != "PointCloud":
        raise NotImplementedError("int8 vanilla KD teacher: PointCloud only")
    from pose3d_tpu.models import ShapeEncoderPC
    from pose3d_tpu.models.common import DenseBNRelu
    from pose3d_tpu.models.estimators import _SixHeads

    sp = ShapeEncoderPC(teacher.shape_feature_dim, dtype=teacher.dtype)
    compress = [DenseBNRelu(w, dtype=teacher.dtype) for w in (800, 400, 200)]
    heads = _SixHeads(teacher.azi_classes, teacher.ele_classes,
                      teacher.inp_classes, teacher.dtype)

    def fwd(q, variables, im, shape, view_tile=3):
        p, b = variables["params"], variables["batch_stats"]
        img_feature = resnet_int8_forward(q, im, arch="resnet18",
                                          dtype=teacher.dtype)
        shape_feature = sp.apply(
            {"params": p["ShapeEncoderPC_0"],
             "batch_stats": b["ShapeEncoderPC_0"]}, shape, train=False)
        if view_tile > 1:
            shape_feature = jnp.tile(shape_feature, (view_tile, 1))
        x = jnp.concatenate([shape_feature, img_feature], axis=-1)
        for j, layer in enumerate(compress):
            x = layer.apply({"params": p[f"DenseBNRelu_{j}"],
                             "batch_stats": b[f"DenseBNRelu_{j}"]},
                            x, train=False)
        return heads.apply({"params": p["_SixHeads_0"]}, x)

    return fwd


def make_teacher_int8_kd_fwd(teacher):
    """Frozen-teacher forward for the KD --crd step with the conv trunks
    int8: fn(q, variables, im, shape, view_tile) -> (outputs,
    projector_200d), i.e. elements 0 and 2 of PoseEstimator.apply(...,
    train=False, view_tile=v) (models/estimators.py) — exactly what
    make_kd_crd_step consumes (t_out, t_feat). `im` carries view_tile stacked
    augmentation views; `shape` only the unique leading entries (the shape
    encoder runs once, features tiled — same exact-with-eval-BN trick as the
    flax path).

    PointCloud: q = quantize_teacher_resnet(...) (resnet50 int8, PointNet
    bf16 through flax). MultiView (reference model.py:103-150): q =
    quantize_teacher_mv(...) — BOTH trunks int8, `shape` carries the (Nu, K,
    H, W, 3) renders and the per-view resnet18 is the FLOPs bulk at
    view_num=12."""
    from pose3d_tpu.models import ShapeEncoderPC
    from pose3d_tpu.models.common import DenseBNRelu, head_dense
    from pose3d_tpu.models.deformnet import DeformNet
    from pose3d_tpu.models.estimators import (PROJECTOR_OUT,
                                              PROJECTOR_WIDTHS, _SixHeads)

    if teacher.shape == "PointCloud":
        fused_dim = teacher.shape_feature_dim
        sp = ShapeEncoderPC(teacher.shape_feature_dim, dtype=teacher.dtype)

        def shape_feat(q, p, b, shape):
            return sp.apply({"params": p["ShapeEncoderPC_0"],
                             "batch_stats": b["ShapeEncoderPC_0"]},
                            shape, train=False)

        def img_q(q):
            return q
    else:
        fused_dim = teacher.shape_feature_dim * teacher.view_num

        def shape_feat(q, p, b, shape):
            n, k = shape.shape[0], shape.shape[1]
            flat = shape.reshape((n * k,) + shape.shape[2:])
            feat = resnet_int8_forward(q["shape"], flat, arch="resnet18",
                                       dtype=teacher.dtype)
            return feat.reshape(n, -1)

        def img_q(q):
            return q["img"]

    dn = DeformNet(bottleneck_size=fused_dim + teacher.img_feature_dim,
                   dtype=teacher.dtype)
    heads = _SixHeads(teacher.azi_classes, teacher.ele_classes,
                      teacher.inp_classes, teacher.dtype)
    proj = [DenseBNRelu(w, dtype=teacher.dtype) for w in PROJECTOR_WIDTHS]
    proj_out = head_dense(PROJECTOR_OUT, teacher.dtype)

    def fwd(q, variables, im, shape, view_tile=3):
        p, b = variables["params"], variables["batch_stats"]
        img_feature = resnet50_int8_forward(img_q(q), im, dtype=teacher.dtype)
        shape_feature = shape_feat(q, p, b, shape)
        if view_tile > 1:
            shape_feature = jnp.tile(shape_feature, (view_tile, 1))
        fused = jnp.concatenate([shape_feature, img_feature], axis=-1)
        x = dn.apply({"params": p["DeformNet_0"],
                      "batch_stats": b["DeformNet_0"]}, fused, train=False)
        outputs = heads.apply({"params": p["_SixHeads_0"]}, x)
        z = img_feature
        for j, layer in enumerate(proj):
            z = layer.apply({"params": p[f"DenseBNRelu_{j}"],
                             "batch_stats": b[f"DenseBNRelu_{j}"]},
                            z, train=False)
        z = proj_out.apply({"params": p["Dense_0"]}, z)
        return outputs, z

    return fwd
