from pose3d_tpu.models.resnet import ResNet, resnet18, resnet34, resnet50, resnet101, resnet152
from pose3d_tpu.models.vgg import VGG, vgg11, vgg11_bn, vgg13, vgg16, vgg19
from pose3d_tpu.models.pointnet import ShapeEncoderPC
from pose3d_tpu.models.multiview import ShapeEncoderMV, ShapeEncoderMVRaw
from pose3d_tpu.models.deformnet import DeformNet
from pose3d_tpu.models.estimators import (
    BaselineEstimator,
    PoseEstimator,
    PoseEstimatorVanilla,
)

__all__ = [
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "VGG",
    "vgg11",
    "vgg11_bn",
    "vgg13",
    "vgg16",
    "vgg19",
    "ShapeEncoderPC",
    "ShapeEncoderMV",
    "ShapeEncoderMVRaw",
    "DeformNet",
    "BaselineEstimator",
    "PoseEstimator",
    "PoseEstimatorVanilla",
]
