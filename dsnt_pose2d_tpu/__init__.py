"""TPU-native JAX framework with the capabilities of anibali/dsnt-pose2d.

2D human pose estimation on MPII: stacked-hourglass / ResNet backbones feeding
a DSNT (soft-argmax) head, trained with Euclidean coordinate loss plus
JS/KL/MSE/variance heatmap regularizers, evaluated with PCKh@0.5.

Public surface mirrors the reference (SURVEY.md section 2):

- ops:     ``dsnt``, ``flat_softmax``, ``thresholded_softmax``, ``make_gauss``,
           ``euclidean_losses``, ``js_reg_losses``, ``kl_reg_losses``,
           ``mse_reg_losses``, ``variance_reg_losses``, ``average_loss``
- models:  ``build_mpii_pose_model``
- eval:    ``PCKhEvaluator``
"""

__version__ = "0.1.0"

from . import ops
from .ops import (
    average_loss,
    dsnt,
    euclidean_losses,
    flat_softmax,
    js_reg_losses,
    kl_reg_losses,
    make_gauss,
    mse_reg_losses,
    thresholded_softmax,
    variance_reg_losses,
)

__all__ = [
    "ops",
    "average_loss",
    "dsnt",
    "euclidean_losses",
    "flat_softmax",
    "js_reg_losses",
    "kl_reg_losses",
    "make_gauss",
    "mse_reg_losses",
    "thresholded_softmax",
    "variance_reg_losses",
    "build_mpii_pose_model",
]


def __getattr__(name):
    # Lazy import: keep `import dsnt_pose2d_tpu` light for ops-only users.
    if name == "build_mpii_pose_model":
        from .models import build_mpii_pose_model

        return build_mpii_pose_model
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
