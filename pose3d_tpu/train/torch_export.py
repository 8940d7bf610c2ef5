"""PyTorch .pth checkpoint EXPORT: the inverse of torch_import, so weights
trained in this framework can be loaded by the reference PyTorch code
(round-trip validated in tests/test_ckpt.py).

Layout conversions are the exact inverses of torch_import:
  flax Dense kernel (in, out)   -> torch Linear weight (out, in)
  flax Conv kernel (kh,kw,in,out)-> torch Conv2d weight (out, in, kh, kw)
  flax Dense (PointNet/DeformNet)-> torch Conv1d weight (out, in, 1)
  flax BatchNorm scale/bias + batch_stats -> torch BN weight/bias/running_*
"""

from __future__ import annotations

import numpy as np


def _get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _np(x):
    return np.asarray(x)


def _linear_out(params, path, sd, torch_prefix):
    p = _get(params, path)
    sd[f"{torch_prefix}.weight"] = _np(p["kernel"]).T.copy()
    sd[f"{torch_prefix}.bias"] = _np(p["bias"]).copy()


def _conv2d_out(params, path, sd, torch_prefix):
    p = _get(params, path)
    sd[f"{torch_prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1).copy()
    if "bias" in p:
        sd[f"{torch_prefix}.bias"] = _np(p["bias"]).copy()


def _conv1d_out(params, path, sd, torch_prefix):
    p = _get(params, path)
    sd[f"{torch_prefix}.weight"] = _np(p["kernel"]).T[:, :, None].copy()
    if "bias" in p:
        sd[f"{torch_prefix}.bias"] = _np(p["bias"]).copy()


def _bn_out(params, stats, path, sd, torch_prefix):
    p = _get(params, path)
    s = _get(stats, path)
    sd[f"{torch_prefix}.weight"] = _np(p["scale"]).copy()
    sd[f"{torch_prefix}.bias"] = _np(p["bias"]).copy()
    sd[f"{torch_prefix}.running_mean"] = _np(s["mean"]).copy()
    sd[f"{torch_prefix}.running_var"] = _np(s["var"]).copy()
    sd[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _convbn_out(params, stats, path, sd, conv_prefix, bn_prefix):
    _conv2d_out(params, path + ("Conv_0",), sd, conv_prefix)
    _bn_out(params, stats, path + ("BatchNorm_0",), sd, bn_prefix)


def export_resnet(params, stats, path, sd, prefix, stage_sizes, bottleneck):
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    _convbn_out(params, stats, path + ("ConvBN_0",), sd, p("conv1"), p("bn1"))
    block = "Bottleneck" if bottleneck else "BasicBlock"
    n_convs = 3 if bottleneck else 2
    k = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            bpath = path + (f"{block}_{k}",)
            tb = p(f"layer{stage + 1}.{j}")
            for c in range(n_convs):
                _convbn_out(params, stats, bpath + (f"ConvBN_{c}",), sd,
                            f"{tb}.conv{c + 1}", f"{tb}.bn{c + 1}")
            if f"ConvBN_{n_convs}" in _get(params, bpath):
                _convbn_out(params, stats, bpath + (f"ConvBN_{n_convs}",), sd,
                            f"{tb}.downsample.0", f"{tb}.downsample.1")
            k += 1
    if "Dense_0" in _get(params, path):
        _linear_out(params, path + ("Dense_0",), sd, p("fc"))


def export_vgg11(params, stats, path, sd, prefix):
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    conv_ids = [0, 3, 6, 8, 11, 13, 16, 18]
    for i, t in enumerate(conv_ids):
        _conv2d_out(params, path + (f"Conv_{i}",), sd, p(f"features.{t}"))
    # Dense_0: invert the HWC->CHW flatten permutation of the input axis
    d0 = _get(params, path + ("Dense_0",))
    w = _np(d0["kernel"]).T  # (4096, 7*7*512) HWC order
    if w.shape[1] != 7 * 7 * 512:
        raise ValueError(
            "torch export requires the reference-shaped student (width_mult=1, "
            f"224px input); classifier input is {w.shape[1]}, expected 25088")
    w = w.reshape(w.shape[0], 7, 7, 512).transpose(0, 3, 1, 2).reshape(w.shape[0], -1)
    sd[p("classifier.0.weight")] = w.copy()
    sd[p("classifier.0.bias")] = _np(d0["bias"]).copy()
    for i, t in enumerate([3, 6]):
        _linear_out(params, path + (f"Dense_{i + 1}",), sd, p(f"classifier.{t}"))


def export_pointnet(params, stats, path, sd, prefix):
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    for i in range(3):
        _conv1d_out(params, path + (f"Dense_{i}",), sd, p(f"conv{i + 1}"))
        _bn_out(params, stats, path + (f"BatchNorm_{i}",), sd, p(f"bn{i + 1}"))


def export_deformnet(params, stats, path, sd, prefix):
    p = (lambda s: f"{prefix}.{s}" if prefix else s)
    for i in range(3):
        sub = path + (f"DenseBNRelu_{i}",)
        _conv1d_out(params, sub + ("Dense_0",), sd, p(f"conv{i + 1}"))
        _bn_out(params, stats, sub + ("BatchNorm_0",), sd, p(f"bn{i + 1}"))
    _conv1d_out(params, path + ("Dense_0",), sd, p("conv4"))


def export_mlp(params, stats, path, sd, prefix, linear_ids, bn_ids, start=0):
    for i, (li, bi) in enumerate(zip(linear_ids, bn_ids)):
        sub = path + (f"DenseBNRelu_{start + i}",)
        _linear_out(params, sub + ("Dense_0",), sd, f"{prefix}.{li}")
        _bn_out(params, stats, sub + ("BatchNorm_0",), sd, f"{prefix}.{bi}")


def export_six_heads(params, path, sd):
    heads = ["fc_cls_azi", "fc_cls_ele", "fc_cls_inp",
             "fc_reg_azi", "fc_reg_ele", "fc_reg_inp"]
    for i, h in enumerate(heads):
        _linear_out(params, path + (f"Dense_{i}",), sd, h)


def export_baseline_estimator(variables) -> dict:
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    export_vgg11(params, stats, ("VGG_0",), sd, "img_encoder")
    export_mlp(params, stats, (), sd, "compress", [0, 3, 6], [1, 4, 7], start=0)
    export_six_heads(params, ("_SixHeads_0",), sd)
    export_mlp(params, stats, (), sd, "projector", [0], [1], start=3)
    _linear_out(params, ("Dense_0",), sd, "projector.3")
    return sd


def export_pose_estimator(variables, shape: str = "PointCloud") -> dict:
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    export_resnet(params, stats, ("ResNet_0",), sd, "img_encoder", [3, 4, 6, 3], True)
    if shape == "PointCloud":
        export_pointnet(params, stats, ("ShapeEncoderPC_0",), sd, "shape_encoder")
    else:
        export_resnet(params, stats, ("ShapeEncoderMV_0", "ResNet_0"), sd,
                      "shape_encoder.render_encoder", [2, 2, 2, 2], False)
    export_deformnet(params, stats, ("DeformNet_0",), sd, "deformNet")
    export_six_heads(params, ("_SixHeads_0",), sd)
    export_mlp(params, stats, (), sd, "projector", [0, 3], [1, 4], start=0)
    _linear_out(params, ("Dense_0",), sd, "projector.6")
    return sd


def export_pose_estimator_vanilla(variables, shape: str = "PointCloud") -> dict:
    params, stats = variables["params"], variables["batch_stats"]
    sd: dict = {}
    export_resnet(params, stats, ("ResNet_0",), sd, "img_encoder", [2, 2, 2, 2], False)
    if shape == "PointCloud":
        export_pointnet(params, stats, ("ShapeEncoderPC_0",), sd, "shape_encoder")
    else:
        export_resnet(params, stats, ("ShapeEncoderMV_0", "ResNet_0"), sd,
                      "shape_encoder.render_encoder", [2, 2, 2, 2], False)
    export_mlp(params, stats, (), sd, "compress", [0, 3, 6], [1, 4, 7], start=0)
    export_six_heads(params, ("_SixHeads_0",), sd)
    return sd


def save_torch_checkpoint(path: str, variables: dict, arch: str,
                          shape: str = "PointCloud") -> None:
    """Write a reference-loadable .pth ({'state_dict': ...})."""
    import torch

    if arch == "baseline":
        sd = export_baseline_estimator(variables)
    elif arch == "pose":
        sd = export_pose_estimator(variables, shape)
    elif arch == "vanilla":
        sd = export_pose_estimator_vanilla(variables, shape)
    else:
        raise ValueError(arch)
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v, np.float32))
                               if np.asarray(v).dtype != np.int64
                               else torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, path)
