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
PointCloud teachers only (the MultiView encoder is conv-heavy too but rides
a different layout; extend when needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pose3d_tpu.serving.quant_student import _quantize_act, _quantize_weight

_EPS = 1e-5  # flax nn.BatchNorm epsilon (models/common.py ConvBN)

# resnet50 stage layout: [3, 4, 6, 3] bottlenecks; first block of each stage
# carries the downsample ConvBN_3, stages 1-3 open with stride 2
_STAGE_FIRST = {0: (1, 1), 3: (2, 2), 7: (2, 2), 13: (2, 2)}
_N_BLOCKS = 16
# (kernel hw, stride key, padding) per ConvBN inside a Bottleneck:
#   ConvBN_0 1x1/1, ConvBN_1 3x3/s, ConvBN_2 1x1/1, ConvBN_3 (ds) 1x1/s


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


def _block_convs(block_params, block_stats, k):
    """Yield (name, kernel, (g, h), strides, padding) for each ConvBN of
    Bottleneck_k in application order."""
    s = _STAGE_FIRST.get(k, (1, 1))
    spec = [("ConvBN_0", (1, 1), ((0, 0), (0, 0))),
            ("ConvBN_1", s, ((1, 1), (1, 1))),
            ("ConvBN_2", (1, 1), ((0, 0), (0, 0)))]
    if "ConvBN_3" in block_params:
        spec.append(("ConvBN_3", s, ((0, 0), (0, 0))))
    for name, strides, pad in spec:
        yield (name, jnp.asarray(block_params[name]["Conv_0"]["kernel"], jnp.float32),
               _affine(block_params[name]["BatchNorm_0"],
                       block_stats[name]["BatchNorm_0"]),
               strides, pad)


def _observe_resnet(rn_params, rn_stats, x):
    """f32 eval replica of models/resnet.py ResNet-50 (stem relu-after-pool
    included), returning (img_feature_fc_out, {quant_point: max_abs})."""
    stats = {}
    g, h = _affine(rn_params["ConvBN_0"]["BatchNorm_0"],
                   rn_stats["ConvBN_0"]["BatchNorm_0"])
    x = _conv(x, rn_params["ConvBN_0"]["Conv_0"]["kernel"].astype(jnp.float32),
              (2, 2), ((3, 3), (3, 3))) * g + h
    x = jax.nn.relu(_max_pool_3x3_2(x))

    for k in range(_N_BLOCKS):
        bp = rn_params[f"Bottleneck_{k}"]
        bs = rn_stats[f"Bottleneck_{k}"]
        residual = x
        y = x
        for name, kern, (g, h), strides, pad in _block_convs(bp, bs, k):
            if name == "ConvBN_3":
                stats[f"b{k}_{name}"] = jnp.max(jnp.abs(residual))
                residual = _conv(residual, kern, strides, pad) * g + h
                continue
            stats[f"b{k}_{name}"] = jnp.max(jnp.abs(y))
            y = _conv(y, kern, strides, pad) * g + h
            if name != "ConvBN_2":
                y = jax.nn.relu(y)
        x = jax.nn.relu(y + residual)

    feat = jnp.mean(x, axis=(1, 2))
    fc = rn_params["Dense_0"]
    return feat @ fc["kernel"].astype(jnp.float32) + fc["bias"], stats


def quantize_teacher_resnet(variables, calibration_batches) -> dict:
    """variables: trained PoseEstimator {'params','batch_stats'}.
    calibration_batches: iterable of (N, H, W, 3) image arrays. Returns the
    quantized resnet pytree for `make_teacher_int8_infer` (stem/fc bf16
    params + 52 int8 convs with BN folded into the dequant affine)."""
    rn_p = jax.tree.map(lambda a: np.asarray(a), variables["params"]["ResNet_0"])
    rn_s = jax.tree.map(lambda a: np.asarray(a),
                        variables["batch_stats"]["ResNet_0"])
    observe = jax.jit(_observe_resnet)
    maxes = {}
    for batch in calibration_batches:
        _, stats = observe(rn_p, rn_s, jnp.asarray(batch, jnp.float32))
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
    for k in range(_N_BLOCKS):
        bp, bs = rn_p[f"Bottleneck_{k}"], rn_s[f"Bottleneck_{k}"]
        block = []
        for name, kern, (g, h), _strides, _pad in _block_convs(bp, bs, k):
            wq, ws = _quantize_weight(kern)
            block.append({"w": wq,
                          "s": jnp.asarray(ws * g),  # a_scale applied at use
                          "h": jnp.asarray(h),
                          "a": jnp.float32(max(maxes[f"b{k}_{name}"], 1e-12)
                                           / 127.0)})
        q["blocks"].append(block)
    return q


def resnet50_int8_forward(q, im, dtype=jnp.bfloat16):
    """Quantized eval forward -> fc output (the teacher's img_feature)."""
    x = _conv(im.astype(dtype), q["stem"]["kernel"].astype(dtype),
              (2, 2), ((3, 3), (3, 3)))
    x = x.astype(jnp.float32) * q["stem"]["g"] + q["stem"]["h"]
    x = jax.nn.relu(_max_pool_3x3_2(x)).astype(dtype)

    for k, block in enumerate(q["blocks"]):
        strides = _STAGE_FIRST.get(k, (1, 1))
        spec = [((1, 1), ((0, 0), (0, 0))), (strides, ((1, 1), (1, 1))),
                ((1, 1), ((0, 0), (0, 0)))]
        residual = x
        y = x
        for i, c in enumerate(block[:3]):
            yq = _quantize_act(y, c["a"])
            z = _conv(yq, c["w"], *spec[i], acc=jnp.int32)
            y = (z.astype(jnp.float32) * (c["a"] * c["s"]) + c["h"]).astype(dtype)
            if i < 2:
                y = jax.nn.relu(y)
        if len(block) == 4:
            c = block[3]
            rq = _quantize_act(residual, c["a"])
            z = _conv(rq, c["w"], strides, ((0, 0), (0, 0)), acc=jnp.int32)
            residual = (z.astype(jnp.float32) * (c["a"] * c["s"])
                        + c["h"]).astype(dtype)
        x = jax.nn.relu(y + residual)

    feat = jnp.mean(x, axis=(1, 2))
    return feat @ q["fc"]["kernel"].astype(dtype) + q["fc"]["bias"].astype(dtype)


def load_quantized_teacher(path: str) -> dict:
    """Inverse of quant_student.save_quantized for the teacher schema
    ({stem, blocks[k][i]{w,s,h,a}, fc}); the flattener itself is generic."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    q = {"stem": {}, "blocks": [], "fc": {}}
    blocks: dict[int, dict[int, dict]] = {}
    for key, arr in data.items():
        parts = key.split("/")[1:]
        if parts[0] in ("stem", "fc"):
            q[parts[0]][parts[1]] = jnp.asarray(arr)
        else:
            blocks.setdefault(int(parts[1]), {}).setdefault(
                int(parts[2]), {})[parts[3]] = jnp.asarray(arr)
    q["blocks"] = [[blocks[k][i] for i in sorted(blocks[k])]
                   for k in sorted(blocks)]
    return q


def make_teacher_int8_infer(teacher):
    """teacher: the PoseEstimator module (PointCloud shape). Returns a
    jittable fn(q, variables, im, pc) -> [6 head outputs] that runs the
    image encoder int8 and the shape/fusion/head submodules through flax in
    the model dtype."""
    if teacher.shape != "PointCloud":
        raise NotImplementedError("int8 teacher serving: PointCloud only")
    from pose3d_tpu.models.estimators import _SixHeads
    from pose3d_tpu.models import ShapeEncoderPC
    from pose3d_tpu.models.deformnet import DeformNet

    sp = ShapeEncoderPC(teacher.shape_feature_dim, dtype=teacher.dtype)
    dn = DeformNet(bottleneck_size=teacher.shape_feature_dim
                   + teacher.img_feature_dim, dtype=teacher.dtype)
    heads = _SixHeads(teacher.azi_classes, teacher.ele_classes,
                      teacher.inp_classes, teacher.dtype)

    def infer(q, variables, im, pc):
        p, b = variables["params"], variables["batch_stats"]
        img_feature = resnet50_int8_forward(q, im, dtype=teacher.dtype)
        shape_feature = sp.apply(
            {"params": p["ShapeEncoderPC_0"],
             "batch_stats": b["ShapeEncoderPC_0"]}, pc, train=False)
        fused = jnp.concatenate([shape_feature, img_feature], axis=-1)
        x = dn.apply({"params": p["DeformNet_0"],
                      "batch_stats": b["DeformNet_0"]}, fused, train=False)
        return heads.apply({"params": p["_SixHeads_0"]}, x)

    return infer


def make_teacher_int8_kd_fwd(teacher):
    """Frozen-teacher forward for the KD --crd step with the resnet50 image
    encoder int8: fn(q, variables, im, shape, view_tile) -> (outputs,
    projector_200d), i.e. elements 0 and 2 of PoseEstimator.apply(...,
    train=False, view_tile=v) (models/estimators.py) — exactly what
    make_kd_crd_step consumes (t_out, t_feat). `im` carries view_tile stacked
    augmentation views; `shape` only the unique leading entries (the shape
    encoder runs once, features tiled — same exact-with-eval-BN trick as the
    flax path)."""
    if teacher.shape != "PointCloud":
        raise NotImplementedError("int8 KD teacher: PointCloud only")
    from pose3d_tpu.models import ShapeEncoderPC
    from pose3d_tpu.models.common import DenseBNRelu, head_dense
    from pose3d_tpu.models.deformnet import DeformNet
    from pose3d_tpu.models.estimators import _SixHeads

    sp = ShapeEncoderPC(teacher.shape_feature_dim, dtype=teacher.dtype)
    dn = DeformNet(bottleneck_size=teacher.shape_feature_dim
                   + teacher.img_feature_dim, dtype=teacher.dtype)
    heads = _SixHeads(teacher.azi_classes, teacher.ele_classes,
                      teacher.inp_classes, teacher.dtype)
    proj = [DenseBNRelu(800, dtype=teacher.dtype),
            DenseBNRelu(400, dtype=teacher.dtype)]
    proj_out = head_dense(200, teacher.dtype)

    def fwd(q, variables, im, shape, view_tile=3):
        p, b = variables["params"], variables["batch_stats"]
        img_feature = resnet50_int8_forward(q, im, dtype=teacher.dtype)
        shape_feature = sp.apply(
            {"params": p["ShapeEncoderPC_0"],
             "batch_stats": b["ShapeEncoderPC_0"]}, shape, train=False)
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
