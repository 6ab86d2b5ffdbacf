"""Fused Pallas DSNT-head kernel (TPU), with jnp fallback elsewhere.

``AVAILABLE`` gates use: True when the fused kernel can run (TPU backend, or
interpreter mode for tests).  The jnp ops in :mod:`dsnt_pose2d_tpu.ops` are
the numerical oracle for this kernel.
"""

from .dsnt_head import AVAILABLE, fused_dsnt_head

__all__ = ["AVAILABLE", "fused_dsnt_head"]
