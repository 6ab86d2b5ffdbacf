"""Placeholder for the fused DSNT-head Pallas kernel (implemented in ops/pallas).

Until the kernel lands, ``AVAILABLE`` is False and every caller takes the jnp
path.  The real implementation replaces this module; see SURVEY.md section 7
stage 6 for the kernel contract:

    fused_dsnt_head(raw, target_coords, sigma_px, reg)
        -> (coords (..., 2), reg_losses (...) or None)

computing flat-softmax + X/Y expectation + the distribution regularizer in a
single HBM pass over (..., H, W) heatmaps, with a custom fused VJP.
"""

AVAILABLE = False


def fused_dsnt_head(raw, target_coords, sigma_px=1.0, reg="js"):
    raise NotImplementedError("fused Pallas DSNT head not yet built")
