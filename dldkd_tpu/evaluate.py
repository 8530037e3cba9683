"""Corpus-scale retrieval evaluation.

Reference flow (eval.py:114-263): embed the whole video corpus, embed
queries in batches, score every query against every video (max over
frames), rank, report R@K/SumR/mAP per branch and for the 0.7/0.3 fusion.

TPU design: everything stays on device — corpus frame features, the
(Nq, Nv) score matrix, and the rank computation (no per-query numpy loop,
no D2H copy of score matrices). Batches are padded to fixed sizes so the
whole eval compiles to two programs (embed-context, score-queries).
The multi-device corpus-sharded version lives in dldkd_tpu.parallel.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dldkd_tpu.data.ingest import PackedQueries, PackedVideos
from dldkd_tpu.metrics import build_gt_indices, rank_of_gt, metrics_from_ranks
from dldkd_tpu.ops.similarity import clip_scores_maxpool


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad])


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_context_jit(model, params, feats, mask):
    # fused inference towers (ops/fast_eval) — exactness-tested against
    # model.apply(method="encode_context")
    from dldkd_tpu.ops.fast_eval import encode_context_best

    return encode_context_best(params, model.config, feats, mask)


@functools.partial(jax.jit, static_argnums=(0, 7))
def _score_queries_jit(model, params, q_feats, q_mask, ctx_inher, ctx_explore,
                       ctx_mask, quantized=False):
    """Encode one query batch and score it against the whole corpus."""
    from dldkd_tpu.ops.fast_eval import encode_query_best

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    inher_s = clip_scores_maxpool(inher_q, ctx_inher, ctx_mask,
                                  quantized=quantized)
    if explore_q is None:
        return inher_s, jnp.zeros_like(inher_s)
    explore_s = clip_scores_maxpool(explore_q, ctx_explore, ctx_mask,
                                    quantized=quantized)
    return inher_s, explore_s


def embed_corpus(model, params, videos: PackedVideos, context_bsz: int = 200
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Encode every corpus video; returns device arrays
    (N, L, H) inheritance, (N, L, H) exploration (or None), (N, L) mask."""
    n = len(videos)
    inher_chunks, explore_chunks = [], []
    for start in range(0, n, context_bsz):
        feats = _pad_to(videos.feats[start:start + context_bsz], context_bsz)
        mask = _pad_to(videos.mask[start:start + context_bsz], context_bsz)
        inher, explore = _encode_context_jit(model, params,
                                             jnp.asarray(feats), jnp.asarray(mask))
        inher_chunks.append(inher)
        if explore is not None:
            explore_chunks.append(explore)
    inher = jnp.concatenate(inher_chunks)[:n]
    explore = jnp.concatenate(explore_chunks)[:n] if explore_chunks else None
    return inher, explore, jnp.asarray(videos.mask)


def score_all_queries(model, params, queries: PackedQueries,
                      ctx_inher, ctx_explore, ctx_mask,
                      query_bsz: int = 50, score_quant: bool = False
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(Nq, Nv) score matrices for both branches, on device."""
    n = len(queries)
    double = ctx_explore is not None
    ctx_explore_in = ctx_explore if double else ctx_inher
    inher_rows, explore_rows = [], []
    for start in range(0, n, query_bsz):
        feats = _pad_to(queries.feats[start:start + query_bsz], query_bsz)
        mask = _pad_to(queries.mask[start:start + query_bsz], query_bsz)
        inher_s, explore_s = _score_queries_jit(
            model, params, jnp.asarray(feats), jnp.asarray(mask),
            ctx_inher, ctx_explore_in, ctx_mask, score_quant)
        inher_rows.append(inher_s)
        explore_rows.append(explore_s)
    inher = jnp.concatenate(inher_rows)[:n]
    explore = jnp.concatenate(explore_rows)[:n] if double else None
    return inher, explore


def _metrics_from_score_matrices(inher_s, explore_s, gt,
                                 fusion: Tuple[float, float]
                                 ) -> Dict[str, Dict[str, float]]:
    """Ranks + metric dicts from on-device (Nq, Nv) score matrices —
    the shared tail of the monolithic and streaming eval paths."""
    out: Dict[str, Dict[str, float]] = {}
    out["inher"] = metrics_from_ranks(np.asarray(rank_of_gt(inher_s, gt)))
    if explore_s is not None:
        out["explore"] = metrics_from_ranks(
            np.asarray(rank_of_gt(explore_s, gt)))
        fused = fusion[0] * inher_s + fusion[1] * explore_s
        out["fused"] = metrics_from_ranks(np.asarray(rank_of_gt(fused, gt)))
    else:
        out["fused"] = dict(out["inher"])
    return out


def eval_retrieval(model, params, videos: PackedVideos, queries: PackedQueries,
                   context_bsz: int = 200, query_bsz: int = 50,
                   fusion: Tuple[float, float] = (0.7, 0.3),
                   score_quant: bool = False,
                   corpus_stream_bsz: int = 0
                   ) -> Dict[str, Dict[str, float]]:
    """Full eval epoch (reference eval_epoch, eval.py:237-263).

    Returns {'inher': {...}, 'explore': {...}, 'fused': {...}} metric dicts;
    'fused' uses 0.7*inheritance + 0.3*exploration (the headline metric).
    Single-branch models report only 'inher' (also under 'fused' for a
    uniform early-stop key). score_quant: int8-quantized scoring (serving
    speed knob; see ops.similarity.clip_scores_maxpool).

    corpus_stream_bsz > 0 switches to the corpus-streaming engine
    (eval_retrieval_streaming) for corpora whose frame features exceed
    device memory; 0 keeps the corpus-resident path (fastest in-HBM).
    """
    if corpus_stream_bsz:
        return eval_retrieval_streaming(
            model, params, videos, queries, corpus_block=corpus_stream_bsz,
            query_bsz=query_bsz, fusion=fusion, score_quant=score_quant)
    ctx_inher, ctx_explore, ctx_mask = embed_corpus(
        model, params, videos, context_bsz)
    inher_s, explore_s = score_all_queries(
        model, params, queries, ctx_inher, ctx_explore, ctx_mask, query_bsz,
        score_quant)

    gt = jnp.asarray(build_gt_indices(queries.video_ids, videos.ids))
    return _metrics_from_score_matrices(inher_s, explore_s, gt, fusion)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_queries_jit(model, params, q_feats, q_mask):
    from dldkd_tpu.ops.fast_eval import encode_query_best

    return encode_query_best(params, model.config, q_feats, q_mask)


def encode_all_queries(model, params, queries: PackedQueries,
                       query_bsz: int = 512
                       ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Pooled query vectors for every caption, both branches, on device
    ((Nq, H) each — a few MB even at full-dataset scale)."""
    n = len(queries)
    inher_rows, explore_rows = [], []
    for start in range(0, n, query_bsz):
        feats = _pad_to(queries.feats[start:start + query_bsz], query_bsz)
        mask = _pad_to(queries.mask[start:start + query_bsz], query_bsz)
        inher_q, explore_q = _encode_queries_jit(
            model, params, jnp.asarray(feats), jnp.asarray(mask))
        inher_rows.append(inher_q)
        if explore_q is not None:
            explore_rows.append(explore_q)
    inher = jnp.concatenate(inher_rows)[:n]
    explore = jnp.concatenate(explore_rows)[:n] if explore_rows else None
    return inher, explore


@functools.partial(jax.jit, static_argnums=(5,))
def score_encoded_block(inher_q, explore_q, ctx_i, ctx_e, block_mask,
                        quantized=False):
    """Score every query against one ENCODED corpus block.

    Deliberately a separate program from the block's tower encode
    (_encode_context_jit): when both live in one jit, XLA may try to keep
    the pallas tower outputs in scoped VMEM for mid-sized blocks and
    exceed the 16 MB limit at compile time on TPU; a program boundary
    pins the block's encoded features to HBM, which is also the streaming
    engine's memory model (one block at a time)."""
    s_i = clip_scores_maxpool(inher_q, ctx_i, block_mask,
                              quantized=quantized)
    if ctx_e is None:
        return s_i, None
    s_e = clip_scores_maxpool(explore_q, ctx_e, block_mask,
                              quantized=quantized)
    return s_i, s_e


def eval_retrieval_streaming(model, params, videos: PackedVideos,
                             queries: PackedQueries,
                             corpus_block: int = 2048,
                             query_bsz: int = 512,
                             fusion: Tuple[float, float] = (0.7, 0.3),
                             score_quant: bool = False
                             ) -> Dict[str, Dict[str, float]]:
    """Corpus-beyond-HBM retrieval eval: metrics identical to
    eval_retrieval, device memory bounded by ONE corpus block.

    The reference (and our corpus-resident path) materializes the whole
    encoded corpus on one device (reference eval.py:139-156) — the hard
    ceiling on corpus scale. Here the packed corpus stays host-side:
    queries are encoded once ((Nq, H), tiny), then raw corpus blocks are
    streamed through embed+score with double-buffered jax.device_put (the
    next block's H2D overlaps the current block's compute). Only the
    (Nq, block) score columns persist on device (Nq x Nv x 4B total —
    ~100 MB at 10x TVR scale, vs ~10 GB of encoded frame features)."""
    n = len(videos)
    inher_q, explore_q = encode_all_queries(model, params, queries,
                                            query_bsz)

    def put_block(start):
        feats = _pad_to(videos.feats[start:start + corpus_block],
                        corpus_block)
        mask = _pad_to(videos.mask[start:start + corpus_block],
                       corpus_block)
        # device_put is async: issuing it before the previous block's
        # compute finishes double-buffers the H2D transfer
        return jax.device_put((feats, mask))

    starts = list(range(0, n, corpus_block))
    cols_i, cols_e = [], []
    pending = put_block(starts[0])
    for bi, start in enumerate(starts):
        feats_d, mask_d = pending
        if bi + 1 < len(starts):
            pending = put_block(starts[bi + 1])
        ctx_i, ctx_e = _encode_context_jit(model, params, feats_d, mask_d)
        s_i, s_e = score_encoded_block(inher_q, explore_q, ctx_i, ctx_e,
                                       mask_d, score_quant)
        cols_i.append(s_i)
        if s_e is not None:
            cols_e.append(s_e)

    inher_s = jnp.concatenate(cols_i, axis=1)[:, :n]
    explore_s = (jnp.concatenate(cols_e, axis=1)[:, :n]
                 if cols_e else None)
    gt = jnp.asarray(build_gt_indices(queries.video_ids, videos.ids))
    return _metrics_from_score_matrices(inher_s, explore_s, gt, fusion)
