"""Heatmap pre-activations: turn raw conv maps into probability distributions.

Mirrors the activation options of the reference (``dsnt/nn.py``: ``flat_softmax``
and ``thresholded_softmax``; SURVEY.md section 2 C2 / section 7 item 2).  Every
activation here maps raw heatmaps ``(..., H, W)`` to per-map distributions that
are non-negative and sum to 1 over the H*W pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-24


def flat_softmax(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the flattened trailing (H, W) axes, per leading index."""
    *lead, h, w = x.shape
    flat = x.reshape(*lead, h * w)
    flat = jax.nn.softmax(flat, axis=-1)
    return flat.reshape(*lead, h, w)


def thresholded_softmax(x: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """Softmax restricted to values >= ``threshold``; others get probability 0.

    Paper-ablation alternative to plain softmax (SURVEY.md section 7 item 2).
    With ``threshold = -inf`` this reduces to :func:`flat_softmax`.  If every
    value in a map falls below the threshold, falls back to plain softmax over
    that map so the output is always a valid distribution.
    """
    *lead, h, w = x.shape
    flat = x.reshape(*lead, h * w)
    keep = flat >= threshold
    any_kept = jnp.any(keep, axis=-1, keepdims=True)
    keep = jnp.where(any_kept, keep, jnp.ones_like(keep))
    neg_inf = jnp.asarray(-jnp.inf, dtype=flat.dtype)
    masked = jnp.where(keep, flat, neg_inf)
    out = jax.nn.softmax(masked, axis=-1)
    return out.reshape(*lead, h, w)


def _sum_normalize(x: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.sum(x, axis=(-2, -1), keepdims=True)
    return x / jnp.maximum(denom, _EPS)


def relu_normalized(x: jnp.ndarray) -> jnp.ndarray:
    """ReLU then divide by the per-map sum."""
    return _sum_normalize(jax.nn.relu(x))


def abs_normalized(x: jnp.ndarray) -> jnp.ndarray:
    """|x| then divide by the per-map sum."""
    return _sum_normalize(jnp.abs(x))


def sigmoid_normalized(x: jnp.ndarray) -> jnp.ndarray:
    """sigmoid then divide by the per-map sum."""
    return _sum_normalize(jax.nn.sigmoid(x))


HEATMAP_ACTIVATIONS = {
    "softmax": flat_softmax,
    "thresholded_softmax": thresholded_softmax,
    "relu": relu_normalized,
    "abs": abs_normalized,
    "sigmoid": sigmoid_normalized,
}
