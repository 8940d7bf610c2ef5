"""PyTorch .pth checkpoint import: load reference-trained weights into the
flax models for cross-framework parity validation (SURVEY.md §5 'Checkpoint /
resume' — 'explicit PyTorch-ckpt import converter').

Key-remap parity with the reference's lenient loader (auxiliary/utils.py:56-73):
checkpoint dicts are unwrapped through the fallbacks model -> state_dict ->
net_vp -> student_model -> teacher_model -> raw, and only matching keys are
merged (mismatches reported, not fatal).

Layout conversions:
  torch Linear weight (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d weight (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  torch Conv1d weight (out, in, 1)     -> flax Dense kernel (in, out)
    (pointwise Conv1d == Dense; see pose3d_tpu.models.pointnet/deformnet)
  torch BN weight/bias/running_*       -> flax BatchNorm scale/bias + batch_stats

The maps below are explicit per architecture — deterministic, no guessing.
"""

from __future__ import annotations

from typing import Any

import numpy as np


# --------------------------------------------------------------------------
# per-layer converters
# --------------------------------------------------------------------------
def _linear(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[f"{prefix}.weight"]).T),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _conv2d(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _conv1d_as_dense(sd, prefix):
    w = np.asarray(sd[f"{prefix}.weight"])[:, :, 0].T
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bias"])}
    stats = {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])}
    return params, stats


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


# --------------------------------------------------------------------------
# architecture maps: emit (params, batch_stats) subtrees
# --------------------------------------------------------------------------
def _convbn(sd, conv_prefix, bn_prefix, params, stats, path):
    _set(params, path + ("Conv_0",), _conv2d(sd, conv_prefix))
    bn_p, bn_s = _bn(sd, bn_prefix)
    _set(params, path + ("BatchNorm_0",), bn_p)
    _set(stats, path + ("BatchNorm_0",), bn_s)


def import_resnet(sd, prefix, stage_sizes, bottleneck, params, stats, path):
    """torch auxiliary/resnet.py layout -> pose3d_tpu.models.resnet layout."""
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    _convbn(sd, p("conv1"), p("bn1"), params, stats, path + ("ConvBN_0",))
    block_name = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    k = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            bpath = path + (f"{block_name}_{k}",)
            tb = p(f"layer{stage + 1}.{j}")
            for c in range(n_convs):
                _convbn(sd, f"{tb}.conv{c + 1}", f"{tb}.bn{c + 1}",
                        params, stats, bpath + (f"ConvBN_{c}",))
            if f"{tb}.downsample.0.weight" in sd:
                _convbn(sd, f"{tb}.downsample.0", f"{tb}.downsample.1",
                        params, stats, bpath + (f"ConvBN_{n_convs}",))
            k += 1
    if f"{p('fc')}.weight" in sd:
        _set(params, path + ("Dense_0",), _linear(sd, p("fc")))


def import_vgg11(sd, prefix, params, stats, path):
    """torch auxiliary/vgg.py cfg-A layout -> pose3d_tpu.models.vgg layout."""
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    conv_ids = [0, 3, 6, 8, 11, 13, 16, 18]  # cfg 'A' conv positions
    for i, t in enumerate(conv_ids):
        _set(params, path + (f"Conv_{i}",), _conv2d(sd, p(f"features.{t}")))
    # classifier.0 consumes the flattened 7x7x512 feature map: torch flattens
    # CHW, flax flattens HWC -> permute the input axis of the first Linear
    w0 = np.asarray(sd[p("classifier.0.weight")])  # (4096, 512*7*7) in CHW
    w0 = w0.reshape(w0.shape[0], 512, 7, 7).transpose(0, 2, 3, 1).reshape(w0.shape[0], -1)
    _set(params, path + ("Dense_0",), {
        "kernel": np.ascontiguousarray(w0.T),
        "bias": np.asarray(sd[p("classifier.0.bias")]),
    })
    for i, t in enumerate([3, 6]):
        _set(params, path + (f"Dense_{i + 1}",), _linear(sd, p(f"classifier.{t}")))


def import_pointnet(sd, prefix, params, stats, path):
    """ShapeEncoderPC: Conv1d+BN1d x3 -> Dense+BatchNorm x3."""
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    for i in range(3):
        _set(params, path + (f"Dense_{i}",), _conv1d_as_dense(sd, p(f"conv{i + 1}")))
        bn_p, bn_s = _bn(sd, p(f"bn{i + 1}"))
        _set(params, path + (f"BatchNorm_{i}",), bn_p)
        _set(stats, path + (f"BatchNorm_{i}",), bn_s)


def import_deformnet(sd, prefix, params, stats, path):
    """DeformNet: conv1-3+bn1-3 -> DenseBNRelu_0..2; conv4 -> Dense_0."""
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    for i in range(3):
        sub = path + (f"DenseBNRelu_{i}",)
        _set(params, sub + ("Dense_0",), _conv1d_as_dense(sd, p(f"conv{i + 1}")))
        bn_p, bn_s = _bn(sd, p(f"bn{i + 1}"))
        _set(params, sub + ("BatchNorm_0",), bn_p)
        _set(stats, sub + ("BatchNorm_0",), bn_s)
    _set(params, path + ("Dense_0",), _conv1d_as_dense(sd, p("conv4")))


def import_mlp(sd, prefix, linear_ids, bn_ids, params, stats, path, start=0):
    """Sequential [Linear, BN, ReLU]* blocks -> DenseBNRelu_{start+i}."""
    for i, (li, bi) in enumerate(zip(linear_ids, bn_ids)):
        sub = path + (f"DenseBNRelu_{start + i}",)
        _set(params, sub + ("Dense_0",), _linear(sd, f"{prefix}.{li}"))
        bn_p, bn_s = _bn(sd, f"{prefix}.{bi}")
        _set(params, sub + ("BatchNorm_0",), bn_p)
        _set(stats, sub + ("BatchNorm_0",), bn_s)


def import_six_heads(sd, params, path):
    heads = ["fc_cls_azi", "fc_cls_ele", "fc_cls_inp",
             "fc_reg_azi", "fc_reg_ele", "fc_reg_inp"]
    for i, h in enumerate(heads):
        _set(params, path + (f"Dense_{i}",), _linear(sd, h))


# --------------------------------------------------------------------------
# model-level importers
# --------------------------------------------------------------------------
def import_baseline_estimator(sd) -> dict:
    """torch BaselineEstimator state_dict -> flax variables dict."""
    params: dict = {}
    stats: dict = {}
    import_vgg11(sd, "img_encoder", params, stats, ("VGG_0",))
    import_mlp(sd, "compress", [0, 3, 6], [1, 4, 7], params, stats, (), start=0)
    import_six_heads(sd, params, ("_SixHeads_0",))
    # projector: Linear(200,200)+BN+ReLU -> DenseBNRelu_3; Linear -> Dense_0
    import_mlp(sd, "projector", [0], [1], params, stats, (), start=3)
    _set(params, ("Dense_0",), _linear(sd, "projector.3"))
    return {"params": params, "batch_stats": stats}


def import_pose_estimator(sd, shape: str = "PointCloud") -> dict:
    """torch PoseEstimator state_dict -> flax variables dict."""
    params: dict = {}
    stats: dict = {}
    import_resnet(sd, "img_encoder", [3, 4, 6, 3], True, params, stats, ("ResNet_0",))
    if shape == "PointCloud":
        import_pointnet(sd, "shape_encoder", params, stats, ("ShapeEncoderPC_0",))
    else:
        import_resnet(sd, "shape_encoder.render_encoder", [2, 2, 2, 2], False,
                      params, stats, ("ShapeEncoderMV_0", "ResNet_0"))
    import_deformnet(sd, "deformNet", params, stats, ("DeformNet_0",))
    import_six_heads(sd, params, ("_SixHeads_0",))
    import_mlp(sd, "projector", [0, 3], [1, 4], params, stats, (), start=0)
    _set(params, ("Dense_0",), _linear(sd, "projector.6"))
    return {"params": params, "batch_stats": stats}


def import_pose_estimator_vanilla(sd, shape: str = "PointCloud") -> dict:
    params: dict = {}
    stats: dict = {}
    import_resnet(sd, "img_encoder", [2, 2, 2, 2], False, params, stats, ("ResNet_0",))
    if shape == "PointCloud":
        import_pointnet(sd, "shape_encoder", params, stats, ("ShapeEncoderPC_0",))
    else:
        import_resnet(sd, "shape_encoder.render_encoder", [2, 2, 2, 2], False,
                      params, stats, ("ShapeEncoderMV_0", "ResNet_0"))
    import_mlp(sd, "compress", [0, 3, 6], [1, 4, 7], params, stats, (), start=0)
    import_six_heads(sd, params, ("_SixHeads_0",))
    return {"params": params, "batch_stats": stats}


def unwrap_state_dict(checkpoint: Any) -> dict:
    """Reference key fallbacks: model -> state_dict -> net_vp ->
    student_model -> teacher_model -> raw (utils.py:56-68)."""
    if not isinstance(checkpoint, dict):
        return checkpoint
    for key in ("model", "state_dict", "net_vp", "student_model", "teacher_model"):
        if key in checkpoint and isinstance(checkpoint[key], dict):
            return checkpoint[key]
    return checkpoint


def load_torch_variables(path: str, target_variables: dict) -> dict:
    """Load a torch .pth into a flax variables dict shaped like
    `target_variables`, auto-detecting the architecture from the keys."""
    import torch

    from pose3d_tpu.train.ckpt import merge_partial

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    sd = unwrap_state_dict(checkpoint)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}

    if any(k.startswith("img_encoder.features") for k in sd):
        restored = import_baseline_estimator(sd)
    elif any(k.startswith("deformNet") for k in sd):
        shape = "PointCloud" if "shape_encoder.conv1.weight" in sd else "MultiView"
        restored = import_pose_estimator(sd, shape)
    elif any(k.startswith("compress") for k in sd):
        shape = "PointCloud" if "shape_encoder.conv1.weight" in sd else "MultiView"
        restored = import_pose_estimator_vanilla(sd, shape)
    else:
        raise ValueError(f"unrecognized torch checkpoint layout: {list(sd)[:5]}")

    merged, skipped = merge_partial(target_variables, restored)
    if skipped:
        print(f"torch import: kept init values for {len(skipped)} entries "
              f"(first: {skipped[:3]})")
    return merged
