"""Masking / normalization primitives shared across the framework."""

from __future__ import annotations

import jax.numpy as jnp

# The reference's sentinel for masked-out logits (method/model.py:444-445).
NEG_INF = -1e10


def mask_logits(target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """target * mask + (1 - mask) * NEG_INF.

    Exact semantics of reference `mask_logits` (method/model.py:444-445):
    valid positions keep their value, masked positions become -1e10 (not a
    `where`, but the same affine form — matters only for NaN propagation,
    which we preserve).
    """
    return target * mask + (1.0 - mask) * NEG_INF


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Row L2-normalization matching torch.nn.functional.normalize:
    x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
