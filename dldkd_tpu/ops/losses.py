"""Vectorized retrieval + distillation losses.

Each loss reproduces the math of its reference counterpart exactly, but the
reference's per-row Python loops (model.py:360-369, 191-195;
model_components.py:169-180) are rewritten as masked tensor ops so the whole
loss stack jits into one XLA program.

Batch convention (static shapes; see dldkd_tpu.data.pipeline):
  scores:  (Nq, Nv)  query-to-video clip scores; Nq is the PADDED query axis
  labels:  (Nq,) int32, video index within batch for each query, -1 = padding
  valid queries always form a prefix (0..n_valid-1) — guaranteed by the
  pipeline, mirroring the reference's sort-by-#captions batch layout
  (data_provider.py:117), which the soft-NCE alpha-partition depends on.

Negative sampling is distributionally equivalent to the reference (uniform
over the same candidate sets, Gumbel-top-1 instead of randint-into-argsort);
bitwise RNG equality with torch is not a goal.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dldkd_tpu.ops.masking import NEG_INF

Array = jnp.ndarray


def _one_hot_labels(labels: Array, n_videos: int) -> Array:
    """(Nq, Nv) ground-truth matrix I_ij; zero rows for padded queries.
    Reference: label_dict -> I_ij (model_components.py:137-141)."""
    valid = labels >= 0
    oh = jax.nn.one_hot(jnp.where(valid, labels, 0), n_videos, dtype=jnp.float32)
    return oh * valid[:, None].astype(jnp.float32)


def _masked_logsumexp(x: Array, mask: Array, axis: int) -> Array:
    """logsumexp over `axis` counting only mask==True positions."""
    neg = jnp.where(mask, x, NEG_INF)
    return jax.scipy.special.logsumexp(neg, axis=axis)


def _uniform_choice(key: jax.Array, mask: Array, values: Array, axis: int = -1) -> Array:
    """Sample uniformly one element of `values` where mask is True, per row.

    Gumbel-max over equal logits == uniform over the candidate set — the
    distributional equivalent of the reference's randint-into-index-set
    sampling (model.py:366-368, 376-383).
    """
    g = jax.random.gumbel(key, shape=values.shape, dtype=jnp.float32)
    g = jnp.where(mask, g, NEG_INF)
    idx = jnp.argmax(g, axis=axis)
    return jnp.take_along_axis(values, idx[..., None], axis=axis)[..., 0]


def clip_triplet_loss(
    scores: Array,           # (Nq, Nv) cosine clip scores
    labels: Array,           # (Nq,) int32, -1 padding
    key: jax.Array,
    margin: float,
    use_hard_negative: bool,
    hard_pool_size: int,
) -> Array:
    """Bidirectional hinge loss; reference get_clip_triplet_loss
    (model.py:353-387).

    v2t: per video, hinge(margin + neg - mean_of_positive_caption_scores);
         neg = top-1 negative caption when hard, else uniform negative.
    t2v: per query, hinge(margin + neg - score[q, label]); neg sampled
         uniformly from ranks [1, 1+hard_pool_size) of the positive-masked
         descending sort when hard, else uniformly over all non-positives.
    Normalization: t2v summed / n_valid_queries + v2t summed / n_videos.
    """
    nq, nv = scores.shape
    valid_q = (labels >= 0)
    valid_f = valid_q.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    oh = _one_hot_labels(labels, nv)  # (Nq, Nv)
    k_v2t, k_t2v = jax.random.split(key)

    # ---- v2t: rows are videos, columns are captions -------------------- #
    v2t = scores.T                      # (Nv, Nq)
    pos_mask = oh.T                     # (Nv, Nq) captions of video i
    neg_mask = (1.0 - oh.T) * valid_f[None, :]
    pos_cnt = jnp.maximum(jnp.sum(pos_mask, axis=1), 1.0)
    pos_mean = jnp.sum(v2t * pos_mask, axis=1) / pos_cnt    # (Nv,)
    if use_hard_negative:
        neg = jnp.max(jnp.where(neg_mask > 0, v2t, NEG_INF), axis=1)
    else:
        neg = _uniform_choice(k_v2t, neg_mask > 0, v2t)
    v2t_loss = jnp.sum(jnp.maximum(margin + neg - pos_mean, 0.0))

    # ---- t2v: rows are queries ----------------------------------------- #
    pos = jnp.sum(scores * oh, axis=1)  # (Nq,) score[q, label]
    if use_hard_negative:
        # positive masked to +999 ranks first; sample uniform rank in
        # [1, min(1 + pool, Nv)) of the descending sort (model.py:374-383).
        masked = jnp.where(oh > 0, 999.0, scores)
        k = min(1 + hard_pool_size, nv)
        top_vals, _ = jax.lax.top_k(masked, k)              # (Nq, k)
        ranks = jax.random.randint(k_t2v, (nq,), 1, k)
        neg_t = jnp.take_along_axis(top_vals, ranks[:, None], axis=1)[:, 0]
    else:
        neg_t = _uniform_choice(k_t2v, oh <= 0, scores)
    t2v_loss = jnp.maximum(margin + neg_t - pos, 0.0) * valid_f

    return jnp.sum(t2v_loss) / n_valid + v2t_loss / nv


def clip_nce(
    scores: Array,   # (Nq, Nv) raw max-frame dot scores
    labels: Array,   # (Nq,)
) -> Array:
    """Hard-label InfoNCE; reference clip_nce (model_components.py:211-236).

    t2v: mean over queries of logsumexp(row) - score[q, label].
    v2t: mean over videos of logsumexp(all queries) - logsumexp(own captions).
    """
    nq, nv = scores.shape
    valid_q = labels >= 0
    valid_f = valid_q.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(valid_f), 1.0)
    oh = _one_hot_labels(labels, nv)

    t2v_nom = jnp.sum(scores * oh, axis=1)                       # (Nq,)
    t2v_den = _masked_logsumexp(scores, jnp.ones_like(scores, dtype=bool), axis=1)
    t2v = jnp.sum((t2v_den - t2v_nom) * valid_f) / n_valid

    v2t_nom = _masked_logsumexp(scores, oh > 0, axis=0)          # (Nv,)
    v2t_den = _masked_logsumexp(scores, valid_q[:, None] & jnp.ones((nq, nv), bool), axis=0)
    v2t = jnp.mean(v2t_den - v2t_nom)
    return t2v + v2t


def clip_nce_soft(
    scores: Array,   # (Nq, Nv) student raw max-frame dot scores
    sims: Array,     # (Nq, Nv) soft-target scores (teacher, or self)
    labels: Array,   # (Nq,)
    alpha: Array,    # scalar in [0,1] — batch-partition threshold (decayed)
    belta: Array,    # scalar in [0,1] — GT/soft mixing weight (decayed)
) -> Array:
    """Soft-label NCE / self-distillation; reference clip_nce_soft
    (model_components.py:106-209).

    Rows 0..hardQ-1 (by position in the sorted batch) use pure GT targets;
    the remaining valid rows use clamp((1-beta)*softmax(sims) + beta*GT, 0).
    Same split over the video axis for v2t. Final:
    alpha*hard_part + (1-alpha)*soft_part, each part mean-normalized.
    alpha/beta are traced scalars so per-epoch decay does not recompile.
    """
    nq, nv = scores.shape
    valid_q = labels >= 0
    valid_f = valid_q.astype(jnp.float32)
    n_valid = jnp.sum(valid_q)
    q_idx = jnp.arange(nq)
    v_idx = jnp.arange(nv)

    hard_q = jnp.floor(alpha * n_valid).astype(jnp.int32)
    soft_q = n_valid - hard_q
    hard_v = jnp.floor(alpha * nv).astype(jnp.int32)
    soft_v = nv - hard_v

    is_hard_q = (q_idx < hard_q) & valid_q            # (Nq,)
    is_soft_q = (q_idx >= hard_q) & valid_q
    is_hard_v = v_idx < hard_v                        # (Nv,)
    is_soft_v = v_idx >= hard_v

    oh = _one_hot_labels(labels, nv)                  # I_ij, (Nq, Nv)

    # -- t2v targets: soft rows mix in softmax over videos --------------- #
    sims_t = jax.nn.softmax(sims, axis=-1)
    i_q = jnp.where(
        is_soft_q[:, None],
        jnp.maximum((1.0 - belta) * sims_t + belta * oh, 0.0),
        oh,
    )
    row_lse = _masked_logsumexp(scores, jnp.ones_like(scores, bool), axis=1)  # (Nq,)
    t2v_nom = jnp.sum(i_q * scores, axis=1)                                    # (Nq,)
    t2v_den = jnp.sum(i_q, axis=1) * row_lse
    t2v_hard = jnp.sum((t2v_den - t2v_nom) * is_hard_q.astype(jnp.float32))
    t2v_soft = jnp.sum((t2v_den - t2v_nom) * is_soft_q.astype(jnp.float32))

    # -- v2t targets: soft rows mix in softmax over (valid) queries ------ #
    sims_v_logits = jnp.where(valid_q[None, :], sims.T, NEG_INF)   # (Nv, Nq)
    sims_v = jax.nn.softmax(sims_v_logits, axis=-1)
    i_v = jnp.where(
        is_soft_v[:, None],
        jnp.maximum((1.0 - belta) * sims_v + belta * oh.T, 0.0),
        oh.T,
    )                                                              # (Nv, Nq)
    # logsumexp(log(I_V + 1e-12) + scores[:, i]) over valid queries
    v2t_nom_logits = jnp.log(i_v + 1e-12) + scores.T               # (Nv, Nq)
    v2t_nom = _masked_logsumexp(v2t_nom_logits, valid_q[None, :], axis=1)
    v2t_den = _masked_logsumexp(scores.T, valid_q[None, :], axis=1)
    v2t_hard = jnp.sum((v2t_den - v2t_nom) * is_hard_v.astype(jnp.float32))
    v2t_soft = jnp.sum((v2t_den - v2t_nom) * is_soft_v.astype(jnp.float32))

    hard_ok = (hard_q > 0) & (hard_v > 0)
    soft_ok = (soft_q > 0) & (soft_v > 0)
    hard_loss = jnp.where(
        hard_ok,
        t2v_hard / jnp.maximum(hard_q, 1) + v2t_hard / jnp.maximum(hard_v, 1),
        0.0,
    )
    soft_loss = jnp.where(
        soft_ok,
        t2v_soft / jnp.maximum(soft_q, 1) + v2t_soft / jnp.maximum(soft_v, 1),
        0.0,
    )
    return alpha * hard_loss + (1.0 - alpha) * soft_loss


def frame_kl_loss(
    student_frame: Array,  # (Nq, L, Nv) masked cosine frame scores
    teacher_frame: Array,  # (Nq, L, Nv)
    video_mask: Array,     # (Nv, L) 1=valid frame
    labels: Array,         # (Nq,)
    temperature: float = 0.2,
) -> Array:
    """Per-positive-pair frame-level KL distillation; reference
    compute_kl_loss(mode='frame_score') (model.py:183-197) /
    clip_kl_only_pos (model_components.py:85-103).

    For each query, softmax(T=temp) over the positive video's valid frames of
    student and teacher scores; KL(teacher || student) summed over frames,
    SUMMED over queries (the reference does not average).
    """
    valid_q = labels >= 0
    safe_labels = jnp.where(valid_q, labels, 0)
    # gather each query's positive-video frame vector: (Nq, L)
    p = jnp.take_along_axis(student_frame, safe_labels[:, None, None], axis=2)[..., 0]
    t = jnp.take_along_axis(teacher_frame, safe_labels[:, None, None], axis=2)[..., 0]
    fmask = video_mask[safe_labels] > 0                       # (Nq, L)

    def masked_log_softmax(x):
        z = jnp.where(fmask, x / temperature, NEG_INF)
        return z - jax.scipy.special.logsumexp(z, axis=-1, keepdims=True)

    log_p = masked_log_softmax(p)
    log_t = masked_log_softmax(t)
    t_prob = jnp.exp(log_t)
    # t*(log t - log p), with 0·log0 := 0 at masked frames
    contrib = jnp.where(fmask, t_prob * (log_t - log_p), 0.0)
    per_query = jnp.sum(contrib, axis=-1) * valid_q.astype(jnp.float32)
    return jnp.sum(per_query)


def clip_mse(x: Array, target: Array,
             valid: Optional[Array] = None) -> Array:
    """Plain MSE distillation (ablation); reference clip_mse
    (model_components.py:28-38): squared diff summed over the frame axis
    (3-D input) or the last axis (2-D), then meaned. `valid` (bool, first
    axis) excludes padded rows from the mean — the reference never pads."""
    d = jnp.square(x - target)
    d = jnp.sum(d, axis=1 if d.ndim == 3 else -1)
    if valid is None:
        return jnp.mean(d)
    vf = valid.astype(d.dtype)
    w = vf.reshape((-1,) + (1,) * (d.ndim - 1))
    per_row = d.size // d.shape[0]
    return jnp.sum(d * w) / (jnp.maximum(jnp.sum(vf), 1.0) * per_row)


def _pos_frames(frame_x: Array, frame_t: Array, video_mask: Array,
                labels: Array):
    """Gather each query's positive-video frame vectors: (Nq, L) x2 plus
    the valid-frame/query masks. Shared by the positive-pair ablations."""
    valid_q = labels >= 0
    safe = jnp.where(valid_q, labels, 0)
    p = jnp.take_along_axis(frame_x, safe[:, None, None], axis=2)[..., 0]
    q = jnp.take_along_axis(frame_t, safe[:, None, None], axis=2)[..., 0]
    fmask = video_mask[safe] > 0
    return p, q, fmask, valid_q


def clip_mse_pos_pair(frame_x: Array, frame_t: Array, video_mask: Array,
                      labels: Array) -> Array:
    """Frame-MSE on positive pairs (ablation); reference clip_mse_pos_pair
    (model_components.py:40-52): per query, mean over the positive video's
    valid frames of squared frame-score diffs, summed over queries."""
    p, q, fmask, valid_q = _pos_frames(frame_x, frame_t, video_mask, labels)
    d = jnp.where(fmask, jnp.square(p - q), 0.0)
    m = jnp.maximum(jnp.sum(fmask, axis=-1), 1)
    per_q = jnp.sum(d, axis=-1) / m * valid_q.astype(jnp.float32)
    return jnp.sum(per_q)


def clip_mse_max_pos_pair(scores_x: Array, scores_t: Array,
                          labels: Array) -> Array:
    """Clip-score MSE at the positive (ablation); reference
    clip_mse_max_pos_pair (model_components.py:54-67): squared diff of the
    max-pooled clip scores at each query's positive video, meaned."""
    valid_q = labels >= 0
    safe = jnp.where(valid_q, labels, 0)
    p = jnp.take_along_axis(scores_x, safe[:, None], axis=1)[:, 0]
    q = jnp.take_along_axis(scores_t, safe[:, None], axis=1)[:, 0]
    d = jnp.square(p - q) * valid_q.astype(jnp.float32)
    # mean over VALID queries (the reference never pads; model_components
    # .py:66 divides by the true batch size)
    return jnp.sum(d) / jnp.maximum(jnp.sum(valid_q), 1)


def clip_mse_only_pos_max(frame_x: Array, frame_t: Array, video_mask: Array,
                          labels: Array) -> Array:
    """MSE at the teacher's best frame (ablation); reference
    clip_mse_only_pos_max (model_components.py:69-83): per query, pick the
    valid frame where the TEACHER score peaks, squared diff there, summed."""
    p, q, fmask, valid_q = _pos_frames(frame_x, frame_t, video_mask, labels)
    best = jnp.argmax(jnp.where(fmask, q, NEG_INF), axis=-1)
    p_b = jnp.take_along_axis(p, best[:, None], axis=1)[:, 0]
    q_b = jnp.take_along_axis(q, best[:, None], axis=1)[:, 0]
    return jnp.sum(jnp.square(p_b - q_b) * valid_q.astype(jnp.float32))


def frame_nce(scores: Array, reduction: bool = True,
              valid: Optional[Array] = None) -> Array:
    """Frame-level NCE (ablation); reference frame_nce
    (model_components.py:238-265). scores: (B, B, F) per-frame
    query-to-video scores for a square batch.
      nominator_i   = logsumexp over frames of the diagonal block i
      denominator_i = logsumexp over row i AND column i (both directions)
    `valid` (bool (B,)) excludes padded rows/columns — the reference never
    pads, so valid=None reproduces it exactly.
    """
    b = scores.shape[0]
    x = scores.reshape(b, b, -1)
    idx = jnp.arange(b)
    nom = jax.scipy.special.logsumexp(x[idx, idx, :], axis=1)
    den_in = jnp.concatenate([x, jnp.transpose(x, (1, 0, 2))], axis=1)
    if valid is not None:
        ok = jnp.concatenate([valid, valid]).astype(bool)
        den_in = jnp.where(ok[None, :, None], den_in, NEG_INF)
    den = jax.scipy.special.logsumexp(den_in.reshape(b, -1), axis=1)
    out = den - nom
    if valid is not None:
        vf = valid.astype(out.dtype)
        out = out * vf
        return jnp.sum(out) / jnp.maximum(jnp.sum(vf), 1.0) if reduction else out
    return jnp.mean(out) if reduction else out


def ranking_loss(pos_score: Array, neg_score: Array, margin: float) -> Array:
    """Mean hinge; reference get_ranking_loss (model.py:434-442)."""
    return (jnp.sum(jnp.maximum(margin + neg_score - pos_score, 0.0))
            / pos_score.shape[0])


def sample_neg_scores(scores: Array, scores_masked: Array, key: jax.Array,
                      use_hard_negative: bool, hard_pool_size: int) -> Array:
    """Per row, a negative score sampled from ranks [1, max_idx) of the
    descending sort of `scores_masked` (positives pre-masked to 999 so they
    rank first and get skipped); reference get_neg_scores
    (model.py:412-432). max_idx = min(1+pool, N) when hard, else N."""
    n = scores.shape[1]
    k = min(1 + hard_pool_size, n) if use_hard_negative else n
    _, idx = jax.lax.top_k(scores_masked, k)               # (N, k) col indices
    ranks = jax.random.randint(key, (scores.shape[0],), 1, k)
    cols = jnp.take_along_axis(idx, ranks[:, None], axis=1)[:, 0]
    return jnp.take_along_axis(scores, cols[:, None], axis=1)[:, 0]


def frame_trip_loss(scores: Array, key: jax.Array, margin: float,
                    use_hard_negative: bool, hard_pool_size: int) -> Array:
    """Frame-level bidirectional ranking loss over a SQUARE (N, N) score
    matrix with diagonal positives; reference get_frame_trip_loss
    (model.py:389-410). Unused by the shipped reference path, provided for
    capability parity. Deterministic when hard_pool_size=1."""
    n = scores.shape[0]
    idx = jnp.arange(n)
    pos = scores[idx, idx]
    masked = scores.at[idx, idx].set(999.0)
    k_ctx, k_q = jax.random.split(key)
    neg_ctx = sample_neg_scores(scores, masked, k_ctx,
                                use_hard_negative, hard_pool_size)
    neg_q = sample_neg_scores(scores.T, masked.T, k_q,
                              use_hard_negative, hard_pool_size)
    return (ranking_loss(pos, neg_ctx, margin)
            + ranking_loss(pos, neg_q, margin))


def batch_kl_loss(
    predict: Array,  # (Nq, Nv)
    target: Array,   # (Nq, Nv)
    temperature: float,
    valid_q: Optional[Array] = None,
) -> Array:
    """Batch-score KL in both directions; reference compute_kl_loss
    mode='batch_score' (model.py:166-182). Not used by the shipped train
    path, provided for capability parity."""
    nq, nv = predict.shape
    if valid_q is None:
        valid_q = jnp.ones((nq,), bool)
    vf = valid_q.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(vf), 1.0)

    def kl_rows(p_logits, t_logits, row_mask, col_mask, n_rows):
        p = jnp.where(col_mask, p_logits / temperature, NEG_INF)
        t = jnp.where(col_mask, t_logits / temperature, NEG_INF)
        log_p = p - jax.scipy.special.logsumexp(p, axis=-1, keepdims=True)
        log_t = t - jax.scipy.special.logsumexp(t, axis=-1, keepdims=True)
        t_prob = jnp.exp(log_t)
        contrib = jnp.where(col_mask, t_prob * (log_t - log_p), 0.0)
        return jnp.sum(jnp.sum(contrib, axis=-1) * row_mask) / n_rows

    t2v = kl_rows(predict, target, vf, jnp.ones((nq, nv), bool), n_valid)
    v2t = kl_rows(predict.T, target.T, jnp.ones((nv,)), valid_q[None, :], float(nv))
    return t2v + v2t
