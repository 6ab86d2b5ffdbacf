"""Pure-jnp op library: the parity contract with anibali/dsnt-pose2d.

These ops mirror the public surface of the reference's ``dsnt/nn.py`` (see
SURVEY.md section 7, "Exact op semantics").  They are the in-repo oracle for
the fused Pallas DSNT-head kernel in :mod:`dsnt_pose2d_tpu.ops.pallas`.
"""

from .activations import (
    HEATMAP_ACTIVATIONS,
    abs_normalized,
    flat_softmax,
    relu_normalized,
    sigmoid_normalized,
    thresholded_softmax,
)
from .coords import (
    coordinate_grids,
    normalized_linspace,
    normalized_to_pixel,
    pixel_to_normalized,
)
from .decode import heatmaps_to_coords
from .dsnt import dsnt
from .gauss import make_gauss
from .losses import (
    REGULARIZERS,
    average_loss,
    euclidean_losses,
    js_reg_losses,
    kl_reg_losses,
    l1_losses,
    mse_losses,
    mse_reg_losses,
    variance_reg_losses,
)

__all__ = [
    "HEATMAP_ACTIVATIONS",
    "REGULARIZERS",
    "abs_normalized",
    "average_loss",
    "coordinate_grids",
    "dsnt",
    "euclidean_losses",
    "flat_softmax",
    "heatmaps_to_coords",
    "js_reg_losses",
    "kl_reg_losses",
    "l1_losses",
    "make_gauss",
    "mse_losses",
    "mse_reg_losses",
    "normalized_linspace",
    "normalized_to_pixel",
    "pixel_to_normalized",
    "relu_normalized",
    "sigmoid_normalized",
    "thresholded_softmax",
    "variance_reg_losses",
]
