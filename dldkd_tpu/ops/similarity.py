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

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dldkd_tpu.ops.masking import l2_normalize, mask_logits


def frame_similarity(
    query: jnp.ndarray,  # (Nq, D)
    ctx: jnp.ndarray,    # (Nv, L, D)
    mask: Optional[jnp.ndarray] = None,  # (Nv, L), 1=valid
    normalized: bool = True,
    precision=None,
) -> jnp.ndarray:
    """Full per-frame score tensor, shape (Nq, L, Nv).

    normalized=True -> cosine (get_sim_scores); False -> raw dot products
    (get_unnormalized_sim_scores). Masked frames are -1e10.
    """
    if normalized:
        query = l2_normalize(query)
        ctx = l2_normalize(ctx)
    # einsum("md,nld->mln") (reference model.py:321)
    scores = jnp.einsum("md,nld->mln", query, ctx, precision=precision)
    if mask is not None:
        scores = mask_logits(scores, jnp.transpose(mask)[None, :, :])
    return scores


def clip_scores(
    query: jnp.ndarray,
    ctx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine clip-level scores: (Nq, Nv) max-over-frames + the full
    (Nq, L, Nv) frame tensor (reference get_sim_scores, model.py:307-329)."""
    frame = frame_similarity(query, ctx, mask, normalized=True,
                             precision=precision)
    return jnp.max(frame, axis=1), frame


def _pick_tiles(nq: int, d: int, q_itemsize: int,
                l_itemsize: Optional[int] = None,
                budget: int = 8 * 1024 * 1024) -> Tuple[int, Optional[int]]:
    """Shared fused-kernel tile policy (every Pallas scoring entry point
    below uses this — tune it HERE, not per-call-site).

    The corpus block re-streams from HBM once per QUERY tile, so big query
    tiles cut HBM traffic linearly (measured 3.4x from 128 -> 1024 at TVR
    scale), bounded by a ~8 MB VMEM budget split between the query and
    corpus blocks. The 2048 tile is offered only at reduced precision
    (q_itemsize <= 2): in f32 it would halve the selected tile for larger
    hidden sizes (budget pressure). Among fitting candidates only the TWO
    largest compete (a small tile would multiply corpus re-reads ~4-5x for
    intermediate Nq, e.g. ~2100); between them, minimize the padded query
    count (TVR's 11264 queries pad to 12288 under a 2048 tile but to 11264
    under 1024 — 8% less MXU work for one extra corpus pass); ties go to
    the bigger tile. Never tile past the (128-rounded) query count —
    avoids padding waste on small serving batches.

    Returns (q_tile, l_tile); l_tile is None unless l_itemsize is given
    (kernels with a frame axis pass the STORED frame itemsize)."""
    cands = (2048, 1024, 512, 256) if q_itemsize <= 2 else (1024, 512, 256)
    fitting = [c for c in cands if c * d * q_itemsize <= budget // 2] \
        or [128]
    q_tile = min(fitting[:2], key=lambda c: (-(-nq // c) * c, -c))
    q_tile = min(q_tile, -(-nq // 128) * 128)
    if l_itemsize is None:
        return q_tile, None
    from dldkd_tpu.ops.pallas.sim_max import V_LANES

    l_tile = 16
    while l_tile * V_LANES * d * l_itemsize > budget // 2 and l_tile > 1:
        l_tile //= 2
    return q_tile, l_tile


def clip_scores_maxpool(
    query: jnp.ndarray,   # (Nq, D)
    ctx: jnp.ndarray,     # (Nv, L, D)
    mask: Optional[jnp.ndarray] = None,
    prefer_pallas: Optional[bool] = None,
    quantized: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cosine clip scores (Nq, Nv) WITHOUT the frame tensor.

    On TPU this dispatches to the fused Pallas kernel (the (Nq, L, Nv)
    intermediate never touches HBM); elsewhere it falls back to the XLA
    einsum path. Arbitrary shapes: inputs are padded to the kernel's tile
    grid internally and the result sliced back.

    quantized=True scores on int8-quantized cosine components (2x MXU
    throughput; ~2.7e-3 absolute score error) — the serving speed knob.
    Rank semantics are preserved (monotone dequant); metric-parity runs
    keep the default exact path.
    """
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    if not prefer_pallas:
        if quantized:
            return _quantized_scores_xla(query, ctx, mask)
        return clip_scores(query, ctx, mask)[0]

    from dldkd_tpu.ops.pallas.sim_max import V_LANES, fused_clip_scores

    nq, d = query.shape
    nv, l_frames, _ = ctx.shape
    if mask is None:
        mask = jnp.ones((nv, l_frames), query.dtype)
    itemsize = 1 if quantized else max(query.dtype.itemsize,
                                       ctx.dtype.itemsize)
    q_tile, l_tile = _pick_tiles(nq, d, itemsize, itemsize)
    nq_p = -(-nq // q_tile) * q_tile
    nv_p = -(-nv // V_LANES) * V_LANES
    l_p = -(-l_frames // l_tile) * l_tile
    query_p = jnp.pad(query, ((0, nq_p - nq), (0, 0)))
    ctx_p = jnp.pad(ctx, ((0, nv_p - nv), (0, l_p - l_frames), (0, 0)))
    # padded videos/frames carry zero masks -> NEG_INF scores, never win
    mask_p = jnp.pad(mask, ((0, nv_p - nv), (0, l_p - l_frames)))
    out = fused_clip_scores(query_p, ctx_p, mask_p,
                            q_tile=q_tile, l_tile=l_tile,
                            quantized=quantized, interpret=interpret)
    return out[:nq, :nv]


def clip_scores_maxpool_pre8(
    query: jnp.ndarray,   # (Nq, D) pooled query vectors (float)
    ctx_t: jnp.ndarray,   # (L_p, Nv_p, D) int8 — build_q8_index layout
    bias: jnp.ndarray,    # (L_p, Nv_p) int32
    prefer_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 cosine clip scores (Nq, Nv_p) against a PREBUILT quantized
    index (ops.pallas.sim_max.build_q8_index): the corpus-sized
    normalize + quantize + transpose pre-pass that
    clip_scores_maxpool(quantized=True) pays on EVERY call happens once
    at index-build time instead. Scores are bitwise identical to the
    quantized=True path on the same quantized components (integer
    arithmetic below 2^24 on both backends). Query rows pad internally;
    the caller slices video columns back to its real count."""
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    nq, d = query.shape
    if not prefer_pallas:
        from dldkd_tpu.ops.pallas.sim_max import (INT8_SCALE,
                                                  quantize_unit_int8)

        qn = quantize_unit_int8(l2_normalize(query)).astype(jnp.float32)
        s = jnp.einsum("md,lnd->mln", qn, ctx_t.astype(jnp.float32))
        s = s + bias.astype(jnp.float32)[None]
        return jnp.max(s, axis=1) * jnp.float32(1.0 / (INT8_SCALE ** 2))

    from dldkd_tpu.ops.pallas.sim_max import fused_clip_scores_q8

    # query-tile policy at itemsize=1 (the prebuilt index has no frame
    # blocking knob — its layout is fixed at build time)
    q_tile, _ = _pick_tiles(nq, d, 1)
    nq_p = -(-nq // q_tile) * q_tile
    query_p = jnp.pad(query, ((0, nq_p - nq), (0, 0)))
    out = fused_clip_scores_q8(query_p, ctx_t, bias, q_tile=q_tile,
                               interpret=interpret)
    return out[:nq]


def _quantized_scores_xla(
    query: jnp.ndarray,
    ctx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA fallback with the SAME int8 semantics as the Pallas kernel, so
    score_quant behaves identically (and is testable) on any backend.
    Quantized values are integers < 2^24, so f32 arithmetic is exact for
    valid frames."""
    from dldkd_tpu.ops.pallas.sim_max import (INT8_MASK_BIAS, INT8_SCALE,
                                              quantize_unit_int8)

    qn = quantize_unit_int8(l2_normalize(query)).astype(jnp.float32)
    cn = quantize_unit_int8(l2_normalize(ctx)).astype(jnp.float32)
    s = jnp.einsum("md,nld->mln", qn, cn)
    if mask is not None:
        bias = jnp.where(mask > 0, 0.0, float(INT8_MASK_BIAS))
        s = s + jnp.transpose(bias)[None]
    return jnp.max(s, axis=1) * jnp.float32(1.0 / (INT8_SCALE * INT8_SCALE))


def rescore_shortlist(
    query: jnp.ndarray,     # (Nq, D)
    ctx: jnp.ndarray,       # (Nv, L, D)
    mask: jnp.ndarray,      # (Nv, L)
    cand_idx: jnp.ndarray,  # (Nq, K') candidate video ids per query
    chunk: int = 16,
) -> jnp.ndarray:
    """Exact f32 cosine max-over-frames scores for per-query candidate
    shortlists, shape (Nq, K') — stage 2 of two-stage retrieval: an int8
    full-matrix pass proposes candidates, this recomputes their scores with
    the exact similarity semantics (l2-normalize, mask to -1e10, frame max
    — reference model.py:307-329) so final ranks match the exact path.

    The candidate frame gather is chunked over queries (transient memory
    chunk x K' x L x D) instead of one (Nq, K', L, D) tensor.

    Arithmetic is FORCED to true f32 (upcast + HIGHEST matmul precision)
    regardless of the inputs' dtype or the global precision: on a bf16
    serving index, stage 2 must still rank sub-bf16-resolution near-ties
    exactly (bf16 vectors scored in f32 — the best possible given the
    stored features).

    The gather reads ctx in its STORED dtype (bf16 index: half the HBM
    traffic — the gather dominates stage-2 cost) and upcasts the gathered
    frames before normalizing; normalize-after-gather computes exactly
    the same f32 floats as gathering from a normalized corpus, without
    materializing a corpus-wide normalized f32 copy per call."""
    nq = query.shape[0]
    qn = l2_normalize(query.astype(jnp.float32))

    def score_chunk(args):
        q, idx = args                      # (C, D), (C, K')
        frames = jnp.take(ctx, idx, axis=0)      # (C, K', L, D) stored dtype
        frames = l2_normalize(frames.astype(jnp.float32))
        fmask = jnp.take(mask, idx, axis=0)      # (C, K', L)
        s = jnp.einsum("cd,ckld->ckl", q, frames,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.max(mask_logits(s, fmask), axis=-1)

    nq_p = -(-nq // chunk) * chunk
    q_p = jnp.pad(qn, ((0, nq_p - nq), (0, 0)))
    idx_p = jnp.pad(cand_idx, ((0, nq_p - nq), (0, 0)))
    out = jax.lax.map(score_chunk,
                      (q_p.reshape(nq_p // chunk, chunk, -1),
                       idx_p.reshape(nq_p // chunk, chunk, -1)))
    return out.reshape(nq_p, -1)[:nq]


def exact_clip_scores(
    query: jnp.ndarray,   # (Nq, D)
    ctx: jnp.ndarray,     # (Nv, L, D) stored dtype (bf16/f32)
    mask: jnp.ndarray,    # (Nv, L)
    prefer_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-grade f32 cosine max-over-frames scores for ALL videos,
    (Nq, Nv) — the dense twin of rescore_shortlist: the same arithmetic
    class (f32 queries/normalization, exact products, f32 accumulation,
    mask to -1e10, frame max) with the full corpus as the shortlist.
    Reads each stored frame ONCE instead of once per (query, candidate)
    slot, so it wins whenever the combined shortlists re-read the corpus
    enough times to out-cost the dense matmul (dense_rescore_wins).

    TPU + bf16-stored frames take the split-3 Pallas kernel
    (ops.pallas.sim_max.fused_exact_scores: 3 native bf16 MXU passes give
    f32-exact products against bf16 storage, divide-after-dot); any other
    backend/dtype takes the XLA einsum at HIGHEST precision (measured
    12.2 ms for both branches at TVR 1024-query scale — XLA fuses the
    frame tensor). The two differ by ~1 ulp of f32 per score (reciprocal-
    multiply vs divide), both strictly within the rescore guarantee:
    sub-bf16-resolution near-ties rank at f32 grade."""
    if prefer_pallas is None:
        prefer_pallas = jax.default_backend() == "tpu"
    if prefer_pallas and ctx.dtype == jnp.bfloat16:
        from dldkd_tpu.ops.pallas.sim_max import V_LANES, fused_exact_scores

        nq, d = query.shape
        nv, l_frames, _ = ctx.shape
        # query blocks are f32 (itemsize 4), frame blocks bf16 (2)
        q_tile, l_tile = _pick_tiles(nq, d, 4, 2)
        nq_p = -(-nq // q_tile) * q_tile
        nv_p = -(-nv // V_LANES) * V_LANES
        l_p = -(-l_frames // l_tile) * l_tile
        query_p = jnp.pad(query, ((0, nq_p - nq), (0, 0)))
        ctx_p = jnp.pad(ctx, ((0, nv_p - nv), (0, l_p - l_frames), (0, 0)))
        mask_p = jnp.pad(mask, ((0, nv_p - nv), (0, l_p - l_frames)))
        out = fused_exact_scores(query_p, ctx_p, mask_p, q_tile=q_tile,
                                 l_tile=l_tile, interpret=interpret)
        return out[:nq, :nv]
    return clip_scores(query.astype(jnp.float32), ctx.astype(jnp.float32),
                       mask, precision=jax.lax.Precision.HIGHEST)[0]


# Measured on the v5e serving workload (TVR dims: L=128, D=384, bf16
# frames, 1024-query batches; round-5 stage-2 probe, BENCHMARKS.md
# round-5 rescore section): the chunked candidate gather streams at
# ~397 GB/s (10.14 ms for 1024 x 40 slots of 128 x 384 bf16 — pure HBM
# traffic, so its cost scales with the shortlists' combined bytes), while
# dense scoring pays the 3-pass MXU matmul plus a few streaming corpus
# passes (per-call transpose + norms + kernel read). Constants are
# rounded AGAINST the dense path (gather throughput up, MXU rate down,
# an extra corpus pass charged) so the dispatch only flips where dense
# clearly wins.
_GATHER_BYTES_PER_S = 400e9    # measured ~397 GB/s candidate gather
_DENSE_MXU_FLOPS_BF16 = 50e12  # split-3 kernel, rounded down from ~65e12
# f32-stored frames skip the split-3 kernel for the XLA HIGHEST einsum
# (exact_clip_scores' fallback, ~6 bf16 passes): ~33 TFLOP/s effective,
# rounded down — pricing it at the kernel rate would flip the dispatch to
# dense in shapes where the gather actually wins
_DENSE_MXU_FLOPS_F32 = 25e12
_DENSE_BYTES_PER_S = 400e9     # streaming transform/read passes


def dense_rescore_mode() -> str:
    """Resolved DLDKD_DENSE_RESCORE mode: 'auto' (cost model decides),
    'never', or 'always'. A value outside those raises — this knob exists
    to override a mispredicting heuristic, so a typo silently falling
    back to the heuristic is the worst possible behavior. Serving's AOT
    executable cache keys include this mode: an executable lowered under
    one dispatch must not be served under another."""
    mode = os.environ.get("DLDKD_DENSE_RESCORE", "auto").strip().lower()
    if mode in ("never", "0", "false"):
        return "never"
    if mode in ("always", "1", "true"):
        return "always"
    if mode in ("", "auto"):
        return "auto"
    raise ValueError(f"DLDKD_DENSE_RESCORE={mode!r}: use auto|never|always")


def dense_rescore_wins(nq: int, k_short: int, nv: int, l_frames: int,
                       d: int, itemsize: int) -> bool:
    """Shape-based cost model: should stage 2 rescore its shortlists by
    DENSE exact scoring of the whole corpus instead of gathering candidate
    frames? Pure trace-time arithmetic (static shapes), used by
    serving._rescore_stage2; both sides score in the same exact-f32
    arithmetic class, so this is a pure performance dispatch — with one
    semantic bonus on the dense side: it returns the true exact top-k even
    when a stage-1 shortlist would have missed it. The MXU rate is
    per-stored-dtype: bf16 frames take the split-3 kernel, anything else
    the slower HIGHEST-precision XLA path (exact_clip_scores).

    Operational override: DLDKD_DENSE_RESCORE=never|always pins the
    dispatch when the constants (measured on THIS v5e + tunnel) mispredict
    on other parts/topologies. Read at TRACE time — flip it before the
    process builds its search programs, not between calls."""
    mode = dense_rescore_mode()
    if mode == "never":
        return False
    if mode == "always":
        return True
    mxu = _DENSE_MXU_FLOPS_BF16 if itemsize <= 2 else _DENSE_MXU_FLOPS_F32
    gather_t = nq * k_short * l_frames * d * itemsize / _GATHER_BYTES_PER_S
    dense_t = (2.0 * nq * nv * l_frames * d / mxu
               + 4.0 * nv * l_frames * d * itemsize / _DENSE_BYTES_PER_S)
    return dense_t < gather_t


def clip_scores_unnormalized(
    query: jnp.ndarray,
    ctx: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Raw-dot clip-level scores (Nq, Nv) (reference
    get_unnormalized_sim_scores, model.py:331-350)."""
    frame = frame_similarity(query, ctx, mask, normalized=False)
    return jnp.max(frame, axis=1)
