"""Query-to-video frame similarity — the retrieval core.

Semantics match reference `DLDKD.get_sim_scores` / `get_unnormalized_sim_scores`
(method/model.py:307-350): per-frame dot products between a pooled query vector
and every frame of every video, padded frames masked to -1e10, then a max over
the frame axis gives the clip-level score.

TPU notes: the einsum maps to a single (Nq, D) x (D, Nv*L) MXU matmul; the
masking + frame-max fuse into its epilogue under XLA. A blockwise Pallas
version that never materializes the (Nq, L, Nv) tensor in HBM lives in
dldkd_tpu.ops.pallas.sim_max and is used by the corpus-scale eval path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from dldkd_tpu.ops.masking import l2_normalize, mask_logits


def frame_similarity(
    query: jnp.ndarray,  # (Nq, D)
    ctx: jnp.ndarray,    # (Nv, L, D)
    mask: Optional[jnp.ndarray] = None,  # (Nv, L), 1=valid
    normalized: bool = True,
) -> jnp.ndarray:
    """Full per-frame score tensor, shape (Nq, L, Nv).

    normalized=True -> cosine (get_sim_scores); False -> raw dot products
    (get_unnormalized_sim_scores). Masked frames are -1e10.
    """
    if normalized:
        query = l2_normalize(query)
        ctx = l2_normalize(ctx)
    # einsum("md,nld->mln") (reference model.py:321)
    scores = jnp.einsum("md,nld->mln", query, ctx)
    if mask is not None:
        scores = mask_logits(scores, jnp.transpose(mask)[None, :, :])
    return scores


def clip_scores(
    query: jnp.ndarray,
    ctx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine clip-level scores: (Nq, Nv) max-over-frames + the full
    (Nq, L, Nv) frame tensor (reference get_sim_scores, model.py:307-329)."""
    frame = frame_similarity(query, ctx, mask, normalized=True)
    return jnp.max(frame, axis=1), frame


def clip_scores_unnormalized(
    query: jnp.ndarray,
    ctx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Raw-dot clip-level scores (Nq, Nv) (reference
    get_unnormalized_sim_scores, model.py:331-350)."""
    frame = frame_similarity(query, ctx, mask, normalized=False)
    return jnp.max(frame, axis=1)
