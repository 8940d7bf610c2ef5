"""Pose estimator networks: teacher (PoseEstimator), student
(BaselineEstimator), and the vanilla teacher variant.

Capability parity with /root/reference/auxiliary/model.py:
  * BaselineEstimator (model.py:14-97): vgg11(img_feature_dim) ->
    compress MLP img_feature_dim->800->400->200 (BN+ReLU each) -> 6 heads;
    projector 200->200->200 (BN+ReLU between). forward returns
    ([6 outputs], projector(compress(x))).
  * PoseEstimator (model.py:206-272): resnet50 (fc output = img feature),
    ShapeEncoderPC or ShapeEncoderMV, concat (shape, img) -> DeformNet -> 200-d
    fused `x`; 6 heads on x; projector img_feature->800->400->200 (no final
    ReLU). forward returns ([6 outputs], x, projector(img_feature)).
  * PoseEstimator_Vanilla (model.py:275-333): resnet18 + compress MLP; returns
    ([6 outputs], x).

Six-head order everywhere: [cls_azi, cls_ele, cls_inp, reg_azi, reg_ele,
reg_inp] with (azi, ele, inp) classes = (360/bin, 180/bin, 360/bin).

TPU-first: NHWC images, channels-last point clouds (N, P, 3), dtype param for
bf16 compute, heads emitted from one fused 200 x (sum heads) matmul would be
possible but XLA already fuses the six small Dense layers into few MXU ops —
kept separate for checkpoint-import clarity.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from pose3d_tpu.models.common import DenseBNRelu, head_dense
from pose3d_tpu.models.deformnet import DeformNet
from pose3d_tpu.models.multiview import ShapeEncoderMV
from pose3d_tpu.models.pointnet import ShapeEncoderPC
from pose3d_tpu.models.resnet import resnet18, resnet50
from pose3d_tpu.models.vgg import vgg11


# Tail-MLP widths (reference model.py:30-42, 232-238, 292-300). The int8
# serving replicas (serving/quant_teacher.py) import these so the serving
# path cannot silently diverge from the flax modules.
COMPRESS_WIDTHS = (800, 400, 200)  # compress MLP (student + vanilla teacher)
PROJECTOR_WIDTHS = (800, 400)      # teacher projector hidden layers
PROJECTOR_OUT = 200                # projector output (plain Dense)


class _SixHeads(nn.Module):
    azi_classes: int = 24
    ele_classes: int = 12
    inp_classes: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        cls_azi = head_dense(self.azi_classes, self.dtype)(x)
        cls_ele = head_dense(self.ele_classes, self.dtype)(x)
        cls_inp = head_dense(self.inp_classes, self.dtype)(x)
        reg_azi = head_dense(self.azi_classes, self.dtype)(x)
        reg_ele = head_dense(self.ele_classes, self.dtype)(x)
        reg_inp = head_dense(self.inp_classes, self.dtype)(x)
        return [cls_azi, cls_ele, cls_inp, reg_azi, reg_ele, reg_inp]


class BaselineEstimator(nn.Module):
    """RGB-only student. Input (N, H, W, 3); returns ([6 heads], projected_feat)."""

    img_feature_dim: int = 2048
    azi_classes: int = 24
    ele_classes: int = 12
    inp_classes: int = 24
    bin_size: int = 15
    dtype: Any = jnp.float32
    axis_name: str | None = None
    width_mult: float = 1.0  # narrower-backbone extension (see models/vgg.py)
    dropout_rate: float = 0.5  # VGG classifier dropout (reference vgg.py:44-52);
    # 0 makes the student fully deterministic (cross-framework parity runs)
    # exact deep conv+pool phase fold depth (models/vgg.py _ConvPool2x2Deep;
    # 0 = stem only) — measured NEGATIVE on-chip at every depth, kept as a
    # tested experiment record; see docs/PERF.md round 3
    fold_deep_pools: int = 0

    @nn.compact
    def __call__(self, im: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None):
        img_feature = vgg11(num_classes=self.img_feature_dim, dtype=self.dtype,
                            axis_name=self.axis_name,
                            width_mult=self.width_mult,
                            dropout_rate=self.dropout_rate,
                            fold_deep_pools=self.fold_deep_pools)(im, train, mask)

        x = img_feature
        for width in COMPRESS_WIDTHS:
            x = DenseBNRelu(width, dtype=self.dtype,
                            axis_name=self.axis_name)(x, train, mask)

        outputs = _SixHeads(self.azi_classes, self.ele_classes, self.inp_classes,
                            self.dtype)(x)

        # projector: 200 -> 200 (BN+ReLU) -> 200
        p = DenseBNRelu(200, dtype=self.dtype, axis_name=self.axis_name)(x, train, mask)
        p = head_dense(200, self.dtype)(p)
        return outputs, p


class PoseEstimator(nn.Module):
    """Multimodal teacher. Inputs (im NHWC, shape); returns
    ([6 heads], fused_200d, projector(img_feature))."""

    shape: str = "PointCloud"  # "PointCloud" | "MultiView"
    view_num: int = 12
    img_feature_dim: int = 1024
    shape_feature_dim: int = 1024
    azi_classes: int = 24
    ele_classes: int = 12
    inp_classes: int = 24
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # route the train-mode PointNet through the fused Pallas encoder
    # (ops/pointnet_train_fused) — single-chip TPU only (a Pallas call does
    # not GSPMD-partition; multi-chip runs keep the XLA path)
    use_fused_pointnet: bool = False
    # rematerialize the ResNet-50 blocks in the backward pass (the teacher
    # train step is HBM-traffic bound; see models/resnet.py): None | "full" |
    # "elementwise"
    remat: str | None = None

    @nn.compact
    def __call__(self, im: jnp.ndarray, shape: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None, view_tile: int = 1):
        """view_tile > 1: `im` carries view_tile stacked augmentation views of
        the same samples (KD's [im, im_flip, im_rot] concat) while `shape`
        carries only the UNIQUE leading im.shape[0]/view_tile entries — the
        shape encoder runs once and its features are tiled, instead of
        encoding identical point clouds view_tile times (the KD-crd step was
        spending a full extra 2x PointNet forward on duplicates). Only exact
        in eval mode (running-stats BN is row-independent); the KD steps use
        it on the FROZEN teacher only."""
        _, img_feature = resnet50(num_classes=self.img_feature_dim, dtype=self.dtype,
                                  axis_name=self.axis_name,
                                  remat=self.remat)(im, train, mask)

        if self.shape == "PointCloud":
            shape_feature = ShapeEncoderPC(
                self.shape_feature_dim, dtype=self.dtype,
                axis_name=self.axis_name,
                use_fused_train=self.use_fused_pointnet)(shape, train, mask)
            fused_dim = self.shape_feature_dim
        else:
            shape_feature = ShapeEncoderMV(self.shape_feature_dim, dtype=self.dtype,
                                           axis_name=self.axis_name)(shape, train, mask)
            fused_dim = self.shape_feature_dim * self.view_num
        if view_tile > 1:
            assert not train, "view_tile tiling is only exact with eval-mode BN"
            shape_feature = jnp.tile(shape_feature, (view_tile, 1))

        global_feature = jnp.concatenate([shape_feature, img_feature], axis=-1)
        x = DeformNet(bottleneck_size=fused_dim + self.img_feature_dim,
                      dtype=self.dtype,
                      axis_name=self.axis_name)(global_feature, train, mask)

        outputs = _SixHeads(self.azi_classes, self.ele_classes, self.inp_classes,
                            self.dtype)(x)

        # projector: img_feature -> 800 -> 400 (BN+ReLU each) -> 200 (plain)
        p = img_feature
        for width in PROJECTOR_WIDTHS:
            p = DenseBNRelu(width, dtype=self.dtype,
                            axis_name=self.axis_name)(p, train, mask)
        p = head_dense(PROJECTOR_OUT, self.dtype)(p)
        return outputs, x, p


class PoseEstimatorVanilla(nn.Module):
    """Teacher variant with resnet18 + compress MLP (no DeformNet, no
    projector). Returns ([6 heads], compressed_200d) — the 2-tuple arity the
    stage-1/stage-2 regimes expect (base_class.py:494, 626)."""

    shape: str = "PointCloud"
    view_num: int = 12
    img_feature_dim: int = 1024
    shape_feature_dim: int = 256
    azi_classes: int = 24
    ele_classes: int = 12
    inp_classes: int = 24
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, im: jnp.ndarray, shape: jnp.ndarray, train: bool = True,
                 mask: jnp.ndarray | None = None, view_tile: int = 1):
        # view_tile: see PoseEstimator.__call__ — encode unique shapes once,
        # tile the features (exact for the frozen eval-mode stage-2 teacher)
        _, img_feature = resnet18(num_classes=self.img_feature_dim, dtype=self.dtype,
                                  axis_name=self.axis_name)(im, train, mask)

        if self.shape == "PointCloud":
            shape_feature = ShapeEncoderPC(self.shape_feature_dim, dtype=self.dtype,
                                           axis_name=self.axis_name)(shape, train, mask)
        else:
            shape_feature = ShapeEncoderMV(self.shape_feature_dim, dtype=self.dtype,
                                           axis_name=self.axis_name)(shape, train, mask)
        if view_tile > 1:
            assert not train, "view_tile tiling is only exact with eval-mode BN"
            shape_feature = jnp.tile(shape_feature, (view_tile, 1))

        x = jnp.concatenate([shape_feature, img_feature], axis=-1)
        for width in COMPRESS_WIDTHS:
            x = DenseBNRelu(width, dtype=self.dtype,
                            axis_name=self.axis_name)(x, train, mask)

        outputs = _SixHeads(self.azi_classes, self.ele_classes, self.inp_classes,
                            self.dtype)(x)
        return outputs, x
