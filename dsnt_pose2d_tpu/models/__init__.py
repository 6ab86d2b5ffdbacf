"""Model builders: hourglass + ResNet backbones, output-strategy heads."""

from .factory import ImageSpecs, PoseModel, PoseNet, build_mpii_pose_model, build_pose_model
from .heads import PoseOutput, activate_heatmaps, decode_coords, pose_loss
from .hourglass import Bottleneck, Hourglass, HourglassNet
from .resnet import ResNetPose

__all__ = [
    "Bottleneck",
    "Hourglass",
    "HourglassNet",
    "ImageSpecs",
    "PoseModel",
    "PoseNet",
    "PoseOutput",
    "ResNetPose",
    "activate_heatmaps",
    "build_mpii_pose_model",
    "build_pose_model",
    "decode_coords",
    "pose_loss",
]
