"""Corpus-sharded retrieval evaluation.

The eval hot loop is (Nq queries) x (Nv videos x L frames): the reference
keeps the whole corpus frame tensor on one GPU and loops query batches
(eval.py:114-219). Here the corpus axis is sharded over the mesh — each
device holds Nv/n_dev videos' frame features and scores every query against
its shard; ranking reduces across shards via XLA collectives inserted by
the partitioner. Queries are replicated (they're tiny).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jax import shard_map

from dldkd_tpu.data.ingest import PackedQueries, PackedVideos
from dldkd_tpu.metrics import build_gt_indices, metrics_from_ranks, rank_of_gt
from dldkd_tpu.ops.similarity import clip_scores, clip_scores_maxpool
from dldkd_tpu.parallel.mesh import DATA_AXIS, replicated


def _pad_rows(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)
    return np.concatenate([x, pad])


@functools.partial(jax.jit, static_argnums=(0, 4))
def _encode_corpus(model, params, feats, mask, mesh=None):
    """Corpus encode over video-sharded feats. The whole-tower Pallas
    kernel (bf16 serving configs) cannot auto-partition under GSPMD, so it
    runs per-device under shard_map; otherwise the XLA fast path relies on
    sharding propagation."""
    import jax.numpy as _jnp

    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_context_fast

    cfg = model.config
    use_pallas = (mesh is not None and jax.default_backend() == "tpu"
                  and _jnp.dtype(cfg.dtype) == _jnp.bfloat16)
    if not use_pallas:
        return encode_context_fast(params, cfg, feats, mask)
    out_spec = ((P(DATA_AXIS), P(DATA_AXIS)) if cfg.double_branch
                else (P(DATA_AXIS), None))
    fn = shard_map(
        lambda p, f, m: encode_context_best(p, cfg, f, m, prefer_pallas=True),
        mesh=mesh, in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=out_spec, check_vma=False)
    return fn(params, feats, mask)


@functools.partial(jax.jit, static_argnums=(0, 7, 8))
def _score_batch(model, params, q_feats, q_mask, ctx_inher, ctx_explore,
                 ctx_mask, mesh=None, quantized=False):
    """One query batch vs the whole (video-sharded) corpus.

    With mesh=None the XLA einsum path runs under GSPMD sharding
    propagation. On TPU the fused Pallas kernel is used instead; pallas_call
    does not auto-partition, so it runs per-device under shard_map with the
    corpus axis manual and queries replicated."""
    from dldkd_tpu.ops.fast_eval import encode_query_best

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    if mesh is not None and jax.default_backend() == "tpu":
        # check_vma=False: pallas_call does not carry varying-mesh-axis
        # metadata, which jax.shard_map's vma validation requires
        score = shard_map(
            functools.partial(clip_scores_maxpool, quantized=quantized),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(None, DATA_AXIS), check_vma=False)
    elif quantized:
        def score(q, c, m):
            return clip_scores_maxpool(q, c, m, prefer_pallas=False,
                                       quantized=True)
    else:
        def score(q, c, m):
            return clip_scores(q, c, m)[0]
    inher_s = score(inher_q, ctx_inher, ctx_mask)
    if explore_q is None:
        return inher_s, jnp.zeros_like(inher_s)
    explore_s = score(explore_q, ctx_explore, ctx_mask)
    return inher_s, explore_s


@functools.partial(jax.jit, static_argnums=(0, 4))
def _encode_corpus_q8(model, params, feats, mask, mesh=None):
    """Per-shard PREBUILT int8 scoring index over video-sharded feats:
    each device emits its shard's quantized frames (int8 tower epilogue on
    TPU bf16 configs; XLA elsewhere) and builds its own
    (L_p, nv_shard_p, H) index + bias. Global layout: the video axis is
    the concatenation of the shards' 128-grid-PADDED blocks — consumers
    must map video ids with _q8_shard_gt (pad columns only ever lose)."""
    from dldkd_tpu.ops.fast_eval import encode_context_q8
    from dldkd_tpu.ops.pallas.sim_max import build_q8_index

    cfg = model.config

    def one(p, f, m):
        q8_i, q8_e = encode_context_q8(p, cfg, f, m)
        t_i, bias = build_q8_index(q8_i, m)
        t_e = build_q8_index(q8_e, m)[0] if q8_e is not None else None
        return t_i, t_e, bias

    if mesh is None:
        return one(params, feats, mask)
    sh = P(None, DATA_AXIS)
    e_spec = sh if cfg.double_branch else None
    return shard_map(one, mesh=mesh,
                     in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                     out_specs=(sh, e_spec, sh), check_vma=False)(
                         params, feats, mask)


def _q8_shard_gt(gt, n_vid_pad: int, width: int, n_dev: int):
    """Map original video indices onto the sharded-q8 column layout:
    device d owns rows [d*per_dev, (d+1)*per_dev) padded to per_dev_p
    lanes, so video v lives at column (v // per_dev) * per_dev_p +
    v % per_dev."""
    per_dev = n_vid_pad // n_dev
    per_dev_p = width // n_dev
    return (gt // per_dev) * per_dev_p + gt % per_dev


@functools.partial(jax.jit, static_argnums=(0, 7))
def _score_batch_q8(model, params, q_feats, q_mask, q8_i, q8_e, bias,
                    mesh=None):
    """One query batch against the per-shard prebuilt int8 indexes — no
    per-call corpus quantize pass on any device."""
    from dldkd_tpu.ops.fast_eval import encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    if mesh is not None:
        score = shard_map(
            clip_scores_maxpool_pre8, mesh=mesh,
            in_specs=(P(), P(None, DATA_AXIS), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS), check_vma=False)
    else:
        score = clip_scores_maxpool_pre8
    inher_s = score(inher_q, q8_i, bias)
    if explore_q is None:
        return inher_s, jnp.zeros_like(inher_s)
    return inher_s, score(explore_q, q8_e, bias)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _score_encoded_block_sharded(inher_q, explore_q, ctx_i, ctx_e, mask,
                                 mesh=None, quantized=False):
    """Score every (replicated) query against one ENCODED video-sharded
    corpus block. Separate program from the block encode for the same
    scoped-VMEM reason as evaluate.score_encoded_block."""
    if mesh is not None and jax.default_backend() == "tpu":
        score = shard_map(
            functools.partial(clip_scores_maxpool, quantized=quantized),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(None, DATA_AXIS), check_vma=False)
    elif quantized:
        def score(q, c, m):
            return clip_scores_maxpool(q, c, m, prefer_pallas=False,
                                       quantized=True)
    else:
        def score(q, c, m):
            return clip_scores(q, c, m)[0]
    s_i = score(inher_q, ctx_i, mask)
    if ctx_e is None:
        return s_i, None
    return s_i, score(explore_q, ctx_e, mask)


def eval_retrieval_sharded_streaming(
    model, params, videos: PackedVideos, queries: PackedQueries, mesh: Mesh,
    corpus_block: int = 2048, query_bsz: int = 512,
    fusion: Tuple[float, float] = (0.7, 0.3), score_quant: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Streaming AND sharding composed: each device streams ITS slice of
    every corpus block — for corpora beyond even the whole slice's HBM.

    Per block: the host slice is device_put video-sharded over the mesh
    (double-buffered), encoded per shard (_encode_corpus), scored against
    the once-encoded replicated queries; only the (Nq, block) score
    columns persist (video-sharded). Metrics identical to
    eval_retrieval_sharded / the single-device engines."""
    from dldkd_tpu.evaluate import _encode_queries_jit

    n_dev = mesh.devices.size
    corpus_block = ((corpus_block + n_dev - 1) // n_dev) * n_dev
    n_vid = len(videos)
    corpus_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = replicated(mesh)
    rep_params = jax.device_put(params, rep)

    n_q = len(queries)
    qi_rows, qe_rows = [], []
    for start in range(0, n_q, query_bsz):
        qf = jax.device_put(
            _pad_rows(queries.feats[start:start + query_bsz], query_bsz),
            rep)
        qm = jax.device_put(
            _pad_rows(queries.mask[start:start + query_bsz], query_bsz),
            rep)
        qi, qe = _encode_queries_jit(model, rep_params, qf, qm)
        qi_rows.append(qi)
        if qe is not None:
            qe_rows.append(qe)
    inher_q = jnp.concatenate(qi_rows)[:n_q]
    explore_q = jnp.concatenate(qe_rows)[:n_q] if qe_rows else None

    def put_block(start):
        return (jax.device_put(
                    _pad_rows(videos.feats[start:start + corpus_block],
                              corpus_block), corpus_sh),
                jax.device_put(
                    _pad_rows(videos.mask[start:start + corpus_block],
                              corpus_block), corpus_sh))

    starts = list(range(0, n_vid, corpus_block))
    cols_i, cols_e = [], []
    pending = put_block(starts[0])
    for bi, start in enumerate(starts):
        bf, bm = pending
        if bi + 1 < len(starts):
            pending = put_block(starts[bi + 1])
        ctx_i, ctx_e = _encode_corpus(model, rep_params, bf, bm, mesh)
        s_i, s_e = _score_encoded_block_sharded(
            inher_q, explore_q, ctx_i, ctx_e, bm, mesh, score_quant)
        cols_i.append(s_i)
        if s_e is not None:
            cols_e.append(s_e)

    inher_s = jnp.concatenate(cols_i, axis=1)[:, :n_vid]
    explore_s = (jnp.concatenate(cols_e, axis=1)[:, :n_vid]
                 if cols_e else None)
    gt = jax.device_put(
        jnp.asarray(build_gt_indices(queries.video_ids, videos.ids)), rep)
    from dldkd_tpu.evaluate import _metrics_from_score_matrices

    return _metrics_from_score_matrices(inher_s, explore_s, gt, fusion)


def eval_retrieval_sharded(
    model, params, videos: PackedVideos, queries: PackedQueries, mesh: Mesh,
    query_bsz: int = 512, fusion: Tuple[float, float] = (0.7, 0.3),
    score_quant: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Sharded equivalent of dldkd_tpu.evaluate.eval_retrieval.

    The corpus is padded to a multiple of the mesh size and encoded in ONE
    sharded call (no host batching loop); padded videos carry zero masks so
    every frame score is -1e10 and they never outrank a real video.
    """
    n_dev = mesh.devices.size
    n_vid = len(videos)
    n_pad = ((n_vid + n_dev - 1) // n_dev) * n_dev

    corpus_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = replicated(mesh)
    feats = jax.device_put(_pad_rows(videos.feats, n_pad), corpus_sh)
    vmask = jax.device_put(_pad_rows(videos.mask, n_pad), corpus_sh)
    rep_params = jax.device_put(params, rep)

    gt_np = build_gt_indices(queries.video_ids, videos.ids)
    double = model.config.double_branch
    n_q = len(queries)
    inher_rows, explore_rows = [], []
    if score_quant:
        # per-shard PREBUILT int8 indexes: towers emit int8, the per-call
        # corpus quantize pass is gone on every device. Valid-column
        # scores are bitwise the per-call quantized path's; the shard-
        # local 128-lane padding only moves column positions, which the
        # gt mapping absorbs (pad columns carry the mask bias and lose
        # every comparison).
        q8_i, q8_e, bias = _encode_corpus_q8(model, rep_params, feats,
                                             vmask, mesh)
        q8_e_in = q8_e if double else q8_i
        for start in range(0, n_q, query_bsz):
            qf = jax.device_put(
                _pad_rows(queries.feats[start:start + query_bsz],
                          query_bsz), rep)
            qm = jax.device_put(
                _pad_rows(queries.mask[start:start + query_bsz],
                          query_bsz), rep)
            si, se = _score_batch_q8(model, rep_params, qf, qm,
                                     q8_i, q8_e_in, bias, mesh)
            inher_rows.append(si)
            explore_rows.append(se)
        gt_np = np.asarray(_q8_shard_gt(np.asarray(gt_np), n_pad,
                                        q8_i.shape[1], n_dev))
    else:
        ctx_inher, ctx_explore = _encode_corpus(model, rep_params, feats,
                                                vmask, mesh)
        ctx_explore_in = ctx_explore if double else ctx_inher
        for start in range(0, n_q, query_bsz):
            qf = jax.device_put(
                _pad_rows(queries.feats[start:start + query_bsz],
                          query_bsz), rep)
            qm = jax.device_put(
                _pad_rows(queries.mask[start:start + query_bsz],
                          query_bsz), rep)
            si, se = _score_batch(model, rep_params, qf, qm,
                                  ctx_inher, ctx_explore_in, vmask, mesh,
                                  score_quant)
            inher_rows.append(si)
            explore_rows.append(se)
    # (Nq, Nv_pad), sharded over the video axis
    inher_s = jnp.concatenate(inher_rows)[:n_q]
    explore_s = jnp.concatenate(explore_rows)[:n_q] if double else None

    gt = jax.device_put(jnp.asarray(gt_np), rep)
    from dldkd_tpu.evaluate import _metrics_from_score_matrices

    return _metrics_from_score_matrices(inher_s, explore_s, gt, fusion)
