"""Post-training int8 quantization of the BaselineEstimator serving path.

Scope: inference only (the six pose heads; the contrastive projector is a
training-time artifact). Training, checkpoints and the reference-parity
surfaces are untouched — this consumes a trained checkpoint's `variables`
and emits a standalone quantized pytree plus a jittable int8 forward.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel int8, w_scale[c] = max|W[..., c]| / 127,
    quantized once at export;
  * activations: per-tensor int8, a_scale = max|x| / 127 calibrated by
    running the f32 forward over calibration batches and recording the
    max-abs at every quantization point;
  * conv/dense compute in s8 x s8 -> s32 (`preferred_element_type=int32`,
    the MXU int8 systolic path — 1.4-1.8x bf16 on the student's hot convs,
    `benchmarks/int8_probe.py`), dequantized by a_scale * w_scale[c];
  * max-pool runs on the raw s32 conv output (max commutes with the
    positive per-channel scale), bias is added after the pool exactly like
    the bf16 graph (models/vgg.py _PrePoolConv);
  * the stem conv stays bf16: its contraction dim is 3*16=48 < the MXU's
    int8 lanes, so int8 cannot help, and full input-range fidelity at the
    first layer is the cheapest accuracy insurance;
  * the compress MLP (with its BatchNorm folded into a per-channel affine
    from the checkpoint's running stats) and the six heads stay bf16 —
    together they are <1% of serving FLOPs.

The forward mirrors pose3d_tpu/models/vgg.py's EVAL graph exactly
(stem phase-conv fold, relu-after-pool, deferred bias), reference semantics
per /root/reference/auxiliary/vgg.py + model.py:14-97.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# VGG-A (vgg11) feature plan against the trained param tree:
# (kind, conv_index); "stem" = folded conv+pool (Conv_0), "prepool" = conv
# whose pool follows (bias deferred past the pool), "plain" = conv + relu.
_PLAN = (("stem", 0), ("prepool", 1), ("plain", 2), ("prepool", 3),
         ("plain", 4), ("prepool", 5), ("plain", 6), ("prepool", 7))

_EPS = 1e-5  # flax nn.BatchNorm epsilon used by DenseBNRelu


def _conv(x, k, strides=(1, 1), padding=((1, 1), (1, 1)), acc=None):
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=dn,
        preferred_element_type=acc)


def _stem(x, kernel, bias, dtype):
    """bf16 folded stem: 4 phase convs bundled in one 4x4-embedded kernel +
    first-tie-wins max (models/vgg.py _ConvPool2x2), relu applied by caller's
    plan ordering."""
    k = kernel.astype(dtype)
    f = kernel.shape[-1]
    k4 = jnp.concatenate(
        [jnp.pad(k, ((dy, 1 - dy), (dx, 1 - dx), (0, 0), (0, 0)))
         for dy in (0, 1) for dx in (0, 1)], axis=3)
    y4 = _conv(x.astype(dtype), k4, strides=(2, 2))
    p0, p1, p2, p3 = (y4[..., i * f:(i + 1) * f] for i in range(4))
    m01 = jnp.where(p0 >= p1, p0, p1)
    m23 = jnp.where(p2 >= p3, p2, p3)
    return jnp.where(m01 >= m23, m01, m23) + bias.astype(dtype)


def _max_pool(x):
    init = (jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer)
            else -jnp.inf)
    return jax.lax.reduce_window(x, init, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def _quantize_act(x, a_scale):
    q = jnp.round(x.astype(jnp.float32) / a_scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _quantize_weight(w):
    """Per-output-channel symmetric int8. w: (..., c_out)."""
    w = np.asarray(w, np.float32)
    ws = np.max(np.abs(w.reshape(-1, w.shape[-1])), axis=0) / 127.0
    ws = np.maximum(ws, 1e-12)
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int8)
    return jnp.asarray(wq), jnp.asarray(ws)


def _fold_bn(dense_p, bn_p, bn_s):
    """DenseBNRelu eval: relu(BN(x @ W + b)) with running stats folds to
    relu((x @ W) * g + h)."""
    g = np.asarray(bn_p["scale"]) / np.sqrt(np.asarray(bn_s["var"]) + _EPS)
    h = (np.asarray(bn_p["bias"])
         + g * (np.asarray(dense_p["bias"]) - np.asarray(bn_s["mean"])))
    return (jnp.asarray(np.asarray(dense_p["kernel"], np.float32)),
            jnp.asarray(g.astype(np.float32)), jnp.asarray(h.astype(np.float32)))


def _observe_features(params, x):
    """f32 replica of the eval feature graph; returns (flat_features,
    {quant_point: max_abs}) for calibration."""
    vgg = params["VGG_0"]
    stats = {}
    for kind, i in _PLAN:
        kp = vgg[f"Conv_{i}"]
        if kind == "stem":
            x = _stem(x, kp["kernel"], kp["bias"], jnp.float32)
            x = jax.nn.relu(x)
            continue
        stats[f"conv{i}"] = jnp.max(jnp.abs(x))
        y = _conv(x, kp["kernel"].astype(jnp.float32))
        if kind == "prepool":
            x = jax.nn.relu(_max_pool(y) + kp["bias"])
        else:
            x = jax.nn.relu(y + kp["bias"])
    x = x.reshape(x.shape[0], -1)
    for d in range(3):
        dp = vgg[f"Dense_{d}"]
        stats[f"fc{d}"] = jnp.max(jnp.abs(x))
        x = x @ dp["kernel"].astype(jnp.float32) + dp["bias"]
        if d < 2:
            x = jax.nn.relu(x)
    return x, stats


def quantize_student(variables, calibration_batches) -> dict:
    """variables: trained BaselineEstimator {'params','batch_stats'};
    calibration_batches: iterable of (N, H, W, 3) image arrays (the same
    normalized crops the model trains on). Returns the quantized pytree
    consumed by `student_int8_infer` (a plain dict of jnp arrays — save or
    shard it like any pytree)."""
    params = jax.tree.map(lambda a: np.asarray(a, np.float32),
                          variables["params"])
    # params as a traced ARGUMENT, not a closure: closed-over weights become
    # graph constants and the (remote) compiler spends minutes const-folding
    # tens of MB of literals
    observe = jax.jit(_observe_features)
    maxes = {}
    for batch in calibration_batches:
        _, stats = observe(params, jnp.asarray(batch, jnp.float32))
        for k, v in stats.items():
            maxes[k] = max(maxes.get(k, 0.0), float(v))
    if not maxes:
        raise ValueError("calibration_batches was empty")

    vgg = params["VGG_0"]
    q = {"stem": {"kernel": jnp.asarray(vgg["Conv_0"]["kernel"]),
                  "bias": jnp.asarray(vgg["Conv_0"]["bias"])},
         "convs": [], "fcs": []}
    for kind, i in _PLAN:
        if kind == "stem":
            continue
        wq, ws = _quantize_weight(vgg[f"Conv_{i}"]["kernel"])
        # NB: no non-array leaves here — the pytree is a jit argument; the
        # static prepool/plain structure lives in _PLAN
        q["convs"].append({
            "w": wq, "ws": ws,
            "b": jnp.asarray(vgg[f"Conv_{i}"]["bias"]),
            "a": jnp.float32(max(maxes[f"conv{i}"], 1e-12) / 127.0)})
    for d in range(3):
        wq, ws = _quantize_weight(vgg[f"Dense_{d}"]["kernel"])
        q["fcs"].append({
            "w": wq, "ws": ws, "b": jnp.asarray(vgg[f"Dense_{d}"]["bias"]),
            "a": jnp.float32(max(maxes[f"fc{d}"], 1e-12) / 127.0)})

    # compress MLP with BN folded from running stats + the six heads (bf16)
    q["compress"] = [_fold_bn(params[f"DenseBNRelu_{j}"]["Dense_0"],
                              params[f"DenseBNRelu_{j}"]["BatchNorm_0"],
                              variables["batch_stats"][f"DenseBNRelu_{j}"]["BatchNorm_0"])
                     for j in range(3)]
    q["heads"] = [(jnp.asarray(params["_SixHeads_0"][f"Dense_{k}"]["kernel"]),
                   jnp.asarray(params["_SixHeads_0"][f"Dense_{k}"]["bias"]))
                  for k in range(6)]
    return q


def student_int8_infer(q, im, dtype=jnp.bfloat16):
    """Jittable int8 serving forward. im: (N, H, W, 3) float. Returns the six
    head outputs (f32) in the canonical order [cls_azi, cls_ele, cls_inp,
    reg_azi, reg_ele, reg_inp]."""
    x = _stem(im.astype(dtype), q["stem"]["kernel"], q["stem"]["bias"], dtype)
    x = jax.nn.relu(x)
    kinds = [k for k, _ in _PLAN if k != "stem"]
    # inter-layer activations live in `dtype` (bf16): their information
    # content is int8-quantized anyway, and the dequant->bias->relu->requant
    # elementwise chains then move half the HBM bytes. The dequant multiply
    # itself runs f32 (scale dynamic range).
    for kind, c in zip(kinds, q["convs"]):
        xq = _quantize_act(x, c["a"])
        y = _conv(xq, c["w"], acc=jnp.int32)
        if kind == "prepool":
            y = _max_pool(y)  # max commutes with the positive channel scale
        x = (y.astype(jnp.float32) * (c["a"] * c["ws"]) + c["b"]).astype(dtype)
        x = jax.nn.relu(x)
    x = x.reshape(x.shape[0], -1)
    for d, f in enumerate(q["fcs"]):
        xq = _quantize_act(x, f["a"])
        y = jax.lax.dot_general(xq, f["w"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        x = (y.astype(jnp.float32) * (f["a"] * f["ws"]) + f["b"]).astype(dtype)
        if d < 2:
            x = jax.nn.relu(x)
    x = x.astype(dtype)
    for w, g, h in q["compress"]:
        x = jax.nn.relu((x @ w.astype(dtype)) * g.astype(dtype)
                        + h.astype(dtype))
    return [(x @ w.astype(dtype) + b.astype(dtype)).astype(jnp.float32)
            for w, b in q["heads"]]


def save_quantized(q: dict, path: str) -> None:
    """Persist the quantized pytree as a single .npz (int8 weights stay
    int8 on disk — the artifact is ~4x smaller than the f32 checkpoint)."""
    flat = {}

    def put(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                put(f"{prefix}/{k}", v)
        elif isinstance(obj, (list, tuple)):
            for i, v in enumerate(obj):
                put(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(obj)

    put("q", q)
    np.savez(path, **flat)


def load_quantized(path: str) -> dict:
    """Inverse of save_quantized (STUDENT schema). Teacher artifacts load
    through quant_teacher.load_quantized_teacher."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    groups = {k.split("/")[1] for k in data.keys()}
    if not groups <= {"stem", "convs", "fcs", "compress", "heads"}:
        raise ValueError(
            f"{path}: not a student int8 artifact (top-level groups "
            f"{sorted(groups)}); teacher artifacts load via "
            "load_quantized_teacher / the --ply_path teacher mode")
    q = {"stem": {}, "convs": [], "fcs": [], "compress": [], "heads": []}
    convs, fcs, compress, heads = {}, {}, {}, {}
    for key, arr in data.items():
        parts = key.split("/")[1:]
        if parts[0] == "stem":
            q["stem"][parts[1]] = jnp.asarray(arr)
        elif parts[0] in ("convs", "fcs"):
            d = convs if parts[0] == "convs" else fcs
            d.setdefault(int(parts[1]), {})[parts[2]] = jnp.asarray(arr)
        else:
            d = compress if parts[0] == "compress" else heads
            d.setdefault(int(parts[1]), {})[int(parts[2])] = jnp.asarray(arr)
    q["convs"] = [convs[i] for i in sorted(convs)]
    q["fcs"] = [fcs[i] for i in sorted(fcs)]
    q["compress"] = [tuple(compress[i][j] for j in sorted(compress[i]))
                     for i in sorted(compress)]
    q["heads"] = [tuple(heads[i][j] for j in sorted(heads[i]))
                  for i in sorted(heads)]
    return q
