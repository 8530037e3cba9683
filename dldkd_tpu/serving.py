"""Online retrieval serving: device-resident top-k search.

The reference has no serving story — eval.py scores the corpus offline and
reports metrics. For deployment the natural TPU shape is: build the index
ONCE (either both branches' encoded frame features, or — for corpora ~4x
beyond that ceiling — just the raw features in the compute dtype, re-
encoded block-wise per search); each incoming query batch is encoded,
scored against the corpus with the fused Pallas kernel (optionally int8
with an exact-f32 shortlist rescore: exact ranks at ~2.6x the exact
path's speed), and reduced to top-k on device (jax.lax.top_k) — only the
k ids/scores ever leave the chip.

  retriever = Retriever.from_checkpoint(model_dir)
  retriever.index(packed_videos)          # or index_corpus(root, collection,...)
  ids, scores = retriever.search(q_feats, q_mask, k=10)

CLI: python -m dldkd_tpu.serving --model_dir <run> --root_path <root>
        --collection tvr --visual_feature i3d_resnet --queries q.hdf5 --k 10
writes one JSON line per query: {"cap_id", "topk": [[video_id, score], ...]}.

Env knobs: DLDKD_DENSE_RESCORE=never|always pins the stage-2
dense-vs-gather dispatch (ops.similarity.dense_rescore_wins; trace-time,
set before the process builds its search programs);
DLDKD_EVAL_MEM_BUDGET overrides the device-memory estimate the
auto index_store policy budgets against.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dldkd_tpu import checkpoint as ckpt_lib
from dldkd_tpu.data.ingest import PackedVideos
from dldkd_tpu.models import DLDKD
from dldkd_tpu.ops.similarity import (clip_scores_maxpool,
                                      dense_rescore_wins, exact_clip_scores,
                                      rescore_shortlist)


SHORTLIST_FACTOR = 4  # default stage-1 candidates per result (k' = 4k)
# multi-batch search keeps at most this many batches' device buffers in
# flight (queries upload ~95 MB/batch at TVR serving dims; unbounded
# queueing would OOM HBM on very large query sets)
_SEARCH_INFLIGHT_BATCHES = 8


def _rescore_stage2(s8, inher_q, explore_q, ctx_inher, ctx_explore, vmask,
                    fusion_w, k, k_out, shortlist_factor):
    """Stage 2 of two-stage retrieval: exact f32 rescore of the int8
    pass's k'=shortlist_factor*k shortlist -> top k_out. The shortlist cap
    is the FRAME buffers' row count (ctx_inher), so candidate gathers
    never index past them even when the stage-1 matrix carries extra
    kernel-grid padding columns (their bias scores lose every top-k).

    Shape dispatch (trace-time): when the combined shortlists re-read
    more stored-frame bytes than dense exact scoring of the WHOLE corpus
    would cost (large query batches against modest corpora — the gather
    is pure HBM traffic, measured at bandwidth), stage 2 instead scores
    every video exactly (exact_clip_scores) and takes the true top-k_out
    directly; s8 then feeds nothing and XLA dead-code-eliminates stage 1
    from the program. Ranks are the gather path's or better: dense has
    no shortlist-miss failure mode."""
    k_short = min(shortlist_factor * k, ctx_inher.shape[0])
    if dense_rescore_wins(inher_q.shape[0], k_short, ctx_inher.shape[0],
                          ctx_inher.shape[1], ctx_inher.shape[2],
                          ctx_inher.dtype.itemsize):
        scores = exact_clip_scores(inher_q, ctx_inher, vmask)
        if explore_q is not None:
            scores = (fusion_w[0] * scores
                      + fusion_w[1] * exact_clip_scores(explore_q,
                                                        ctx_explore, vmask))
        return jax.lax.top_k(scores, k_out)
    _, cand = jax.lax.top_k(s8, k_short)
    # ascending candidate order makes stage-2's top_k index tie-break
    # match the exact full-matrix path's (lowest video id wins) bitwise
    cand = jnp.sort(cand, axis=1)
    scores = rescore_shortlist(inher_q, ctx_inher, vmask, cand)
    if explore_q is not None:
        scores = (fusion_w[0] * scores
                  + fusion_w[1] * rescore_shortlist(explore_q, ctx_explore,
                                                    vmask, cand))
    top_scores, pos = jax.lax.top_k(scores, k_out)
    return top_scores, jnp.take_along_axis(cand, pos, axis=1)


def _two_stage_topk(inher_q, explore_q, ctx_inher, ctx_explore, vmask,
                    fusion_w, k, k_out, shortlist_factor=SHORTLIST_FACTOR):
    """int8 full-matrix prefilter -> exact f32 rescore of a
    k'=shortlist_factor*k shortlist -> top k_out. Returns ranks identical
    to the exact path whenever the exact top-k_out all land in the int8
    shortlist (int8 score error is ~2.7e-3 absolute; a true top-k video
    is dropped only when >(factor-1)*k others overtake it within that
    band — raise the factor for corpora with bigger near-tie groups)."""
    s8 = clip_scores_maxpool(inher_q, ctx_inher, vmask, quantized=True)
    if explore_q is not None:
        s8 = (fusion_w[0] * s8
              + fusion_w[1] * clip_scores_maxpool(explore_q, ctx_explore,
                                                  vmask, quantized=True))
    return _rescore_stage2(s8, inher_q, explore_q, ctx_inher, ctx_explore,
                           vmask, fusion_w, k, k_out, shortlist_factor)


@functools.partial(jax.jit, static_argnums=(0, 7, 12, 13))
def _search_q8_jit(model, params, q_feats, q_mask, q8_i, q8_e, q8_bias, k,
                   frames_i, frames_e, vmask, fusion_w, rescore=True,
                   shortlist_factor=SHORTLIST_FACTOR):
    """score_quant search against the PREBUILT int8 index: stage 1 runs
    straight on the index (no per-call corpus normalize+quantize+transpose
    — VERDICT r3's measured ~2.6 ms/branch/call), stage 2 (when rescore)
    gathers candidate frames from the stored-dtype frame buffers exactly
    as before. Results are id-for-id the _search_jit(quantized=True)
    results: the index holds the same quantized components that path
    recomputes per call."""
    from dldkd_tpu.ops.fast_eval import encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    s8 = clip_scores_maxpool_pre8(inher_q, q8_i, q8_bias)
    if explore_q is not None:
        s8 = (fusion_w[0] * s8
              + fusion_w[1] * clip_scores_maxpool_pre8(explore_q, q8_e,
                                                       q8_bias))
    if rescore:
        return _rescore_stage2(s8, inher_q, explore_q, frames_i,
                               frames_e if explore_q is not None else None,
                               vmask, fusion_w, k, k, shortlist_factor)
    return jax.lax.top_k(s8, k)


@functools.partial(jax.jit, static_argnums=(0, 6, 9, 10, 11))
def _search_jit(model, params, q_feats, q_mask, ctx_inher, ctx_explore,
                k, vmask, fusion_w, quantized=False, rescore=True,
                shortlist_factor=SHORTLIST_FACTOR):
    from dldkd_tpu.ops.fast_eval import encode_query_best

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    if quantized and rescore:
        return _two_stage_topk(inher_q, explore_q, ctx_inher, ctx_explore,
                               vmask, fusion_w, k, k, shortlist_factor)
    scores = clip_scores_maxpool(inher_q, ctx_inher, vmask,
                                 quantized=quantized)
    if explore_q is not None:
        e = clip_scores_maxpool(explore_q, ctx_explore, vmask,
                                quantized=quantized)
        scores = fusion_w[0] * scores + fusion_w[1] * e
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx


@functools.partial(jax.jit, static_argnums=(0, 6, 9, 10, 11, 12))
def _search_sharded_jit(model, params, q_feats, q_mask, ctx_inher,
                        ctx_explore, k, vmask, fusion_w, mesh,
                        quantized=False, rescore=True,
                        shortlist_factor=SHORTLIST_FACTOR):
    """Distributed top-k: each device scores queries against its corpus
    shard and reduces to a local top-k; the n_dev*k candidates (with
    shard-offset global indices) merge in one final top_k. Only k entries
    per query ever cross the ICI, never the (Nq, Nv) score matrix."""
    from jax.sharding import PartitionSpec as P

    from dldkd_tpu.ops.fast_eval import encode_query_best
    from dldkd_tpu.parallel.mesh import DATA_AXIS

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    # single branch: duplicate tensors so the shard_map signature is
    # uniform, but remember it at TRACE time — weight-(1,0) fusion can't
    # be folded by XLA (fusion_w is a runtime array), so actually scoring
    # the duplicate would double every single-branch search
    single = explore_q is None
    if single:
        explore_q = inher_q
        ctx_explore = ctx_inher
        fusion_w = jnp.asarray([1.0, 0.0], jnp.float32)
    n_dev = mesh.devices.size
    k_loc = min(k, ctx_inher.shape[0] // n_dev)  # shard-local candidates

    def local_topk(q_i, q_e, ci, ce, vm, fw):
        if quantized and rescore:
            # two-stage within the shard: the global exact top-k is a
            # subset of the union of per-shard exact top-k_loc, each of
            # which stage 2 recovers from its local int8 shortlist
            vals, idx = _two_stage_topk(q_i, None if single else q_e,
                                        ci, ce, vm, fw,
                                        k, k_loc, shortlist_factor)
        else:
            s = clip_scores_maxpool(q_i, ci, vm, quantized=quantized)
            if not single:
                s = (fw[0] * s
                     + fw[1] * clip_scores_maxpool(q_e, ce, vm,
                                                   quantized=quantized))
            vals, idx = jax.lax.top_k(s, k_loc)
        offset = jax.lax.axis_index(DATA_AXIS) * ci.shape[0]
        return vals, idx + offset

    vals, idx = jax.shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        check_vma=False,
    )(inher_q, explore_q, ctx_inher, ctx_explore, vmask, fusion_w)
    top_scores, pos = jax.lax.top_k(vals, k)      # (Nq, n_dev*k_loc) -> k
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_scores, top_idx


@functools.partial(jax.jit, static_argnums=(3, 4))
def _build_q8_sharded_jit(ctx_inher, ctx_explore, vmask, mesh,
                          quantize=True):
    """Per-shard prebuilt int8 scoring indexes from the video-SHARDED
    encoded frame features (the mesh twin of index()'s single-device
    build_q8_index call): each device quantizes + lays out ITS corpus
    slice, so the global video axis is the concatenation of the shards'
    128-lane-padded blocks — exactly parallel.eval_shard._encode_corpus_q8's
    layout, consumed by _search_q8_sharded_jit's per-device offsets.
    quantize=False lays out ALREADY-int8 rows (a loaded q8 artifact)."""
    from jax.sharding import PartitionSpec as P

    from dldkd_tpu.ops.pallas.sim_max import build_q8_index, quantize_frames_q8
    from dldkd_tpu.parallel.mesh import DATA_AXIS

    q8 = quantize_frames_q8 if quantize else (lambda x: x)

    def local(ci, ce, vm):
        t_i, bias = build_q8_index(q8(ci), vm)
        t_e = build_q8_index(q8(ce), vm)[0] if ce is not None else None
        return t_i, t_e, bias

    sh = P(None, DATA_AXIS)
    e_spec = P(DATA_AXIS) if ctx_explore is not None else None
    e_out = sh if ctx_explore is not None else None
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS), e_spec, P(DATA_AXIS)),
        out_specs=(sh, e_out, sh), check_vma=False,
    )(ctx_inher, ctx_explore, vmask)


@functools.partial(jax.jit, static_argnums=(0, 7, 12, 13, 14, 15))
def _search_q8_sharded_jit(model, params, q_feats, q_mask, q8_i, q8_e,
                           q8_bias, k, frames_i, frames_e, vmask, fusion_w,
                           mesh, per_dev, rescore=True,
                           shortlist_factor=SHORTLIST_FACTOR):
    """score_quant search against PER-SHARD prebuilt int8 indexes (the
    mesh twin of _search_q8_jit): stage 1 runs straight on each device's
    index block — no per-call corpus quantize pre-pass on ANY device —
    and (when rescore) stage 2 re-ranks each shard's local int8 shortlist
    from its slice of the stored-dtype frames. Only k_loc candidates per
    query per device cross the ICI; the global exact top-k is a subset of
    the union of per-shard exact top-k_locs, merged in one final top_k.
    `per_dev` is the per-device LOGICAL row count (device d owns corpus
    rows [d*per_dev, (d+1)*per_dev)); the index blocks carry extra
    128-lane padding columns whose mask bias loses every top-k."""
    from jax.sharding import PartitionSpec as P

    from dldkd_tpu.ops.fast_eval import encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8
    from dldkd_tpu.parallel.mesh import DATA_AXIS

    inher_q, explore_q = encode_query_best(params, model.config, q_feats,
                                           q_mask)
    # single branch: duplicate tensors for a uniform shard_map signature,
    # but skip the duplicate's scoring at TRACE time (see
    # _search_sharded_jit — weight-0 fusion is not free under XLA)
    single = explore_q is None
    if single:
        explore_q = inher_q
        q8_e = q8_i
        frames_e = frames_i
        fusion_w = jnp.asarray([1.0, 0.0], jnp.float32)
    k_loc = min(k, per_dev)

    def local_topk(q_i, q_e, t_i, t_e, bias, fi, fe, vm, fw):
        s8 = clip_scores_maxpool_pre8(q_i, t_i, bias)
        if not single:
            s8 = (fw[0] * s8
                  + fw[1] * clip_scores_maxpool_pre8(q_e, t_e, bias))
        if rescore:
            vals, idx = _rescore_stage2(s8, q_i, None if single else q_e,
                                        fi, None if single else fe, vm, fw,
                                        k, k_loc, shortlist_factor)
        else:
            vals, idx = jax.lax.top_k(s8, k_loc)
        offset = jax.lax.axis_index(DATA_AXIS) * per_dev
        return vals, idx + offset

    sh = P(None, DATA_AXIS)
    f_spec = P(DATA_AXIS) if rescore else None
    vals, idx = jax.shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(), sh, sh, sh, f_spec, f_spec, f_spec, P()),
        out_specs=(sh, sh), check_vma=False,
    )(inher_q, explore_q, q8_i, q8_e, q8_bias, frames_i, frames_e,
      vmask, fusion_w)
    top_scores, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=1)
    return top_scores, top_idx


def _block_topk_core(inher_q, explore_q, ctx_i, ctx_e, block_mask, fusion_w,
                     k, k_out, quantized, rescore, shortlist_factor):
    """Fused-score top-k_out of one encoded corpus block (local indices).
    Shared by the single-device and per-device (shard_map) search paths."""
    if quantized and rescore:
        e_q = explore_q if ctx_e is not None else None
        return _two_stage_topk(inher_q, e_q, ctx_i, ctx_e, block_mask,
                               fusion_w, k, k_out, shortlist_factor)
    scores = clip_scores_maxpool(inher_q, ctx_i, block_mask,
                                 quantized=quantized)
    if ctx_e is not None:
        e = clip_scores_maxpool(explore_q, ctx_e, block_mask,
                                quantized=quantized)
        scores = fusion_w[0] * scores + fusion_w[1] * e
    return jax.lax.top_k(scores, k_out)


@functools.partial(jax.jit, static_argnums=(5, 8, 9, 10))
def _encoded_block_topk_jit(inher_q, explore_q, ctx_i, ctx_e, block_mask,
                            k, fusion_w, offset,
                            quantized=False, rescore=True,
                            shortlist_factor=SHORTLIST_FACTOR):
    """Top-k of ONE already-encoded corpus block (the raw-index streaming
    search, Retriever index_store='raw'). The block's towers run in a
    separate program (evaluate._encode_context_jit) so the encoded
    features are HBM-pinned — see evaluate.score_encoded_block for why.
    Returns global video indices via offset."""
    vals, idx = _block_topk_core(inher_q, explore_q, ctx_i, ctx_e,
                                 block_mask, fusion_w, k, k, quantized,
                                 rescore, shortlist_factor)
    return vals, idx + offset


@functools.partial(jax.jit, static_argnums=(5, 8, 9, 10, 11, 12))
def _encoded_block_topk_sharded_jit(inher_q, explore_q, ctx_i, ctx_e,
                                    block_mask, k, fusion_w, block_start,
                                    per_dev, mesh, quantized=False,
                                    rescore=True,
                                    shortlist_factor=SHORTLIST_FACTOR):
    """Per-device top-k of one video-SHARDED encoded corpus block (the
    raw+mesh search): each device scores the replicated queries against
    its slice of the block and reduces to k_loc local candidates; the
    returned indices are GLOBAL corpus positions under the per-device
    row assignment (device d owns rows [d*per_dev, (d+1)*per_dev), see
    Retriever.index) — global = d*per_dev + block_start + local."""
    from jax.sharding import PartitionSpec as P

    from dldkd_tpu.parallel.mesh import DATA_AXIS

    n_dev = mesh.devices.size
    sb = ctx_i.shape[0] // n_dev  # local block rows per device
    k_loc = min(k, sb)

    def local_topk(q_i, q_e, ci, ce, vm, fw, start):
        vals, idx = _block_topk_core(q_i, q_e, ci, ce, vm, fw, k, k_loc,
                                     quantized, rescore, shortlist_factor)
        offset = jax.lax.axis_index(DATA_AXIS) * per_dev + start
        return vals, idx + offset

    e_spec = P(DATA_AXIS) if ctx_e is not None else None
    return jax.shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), e_spec, P(DATA_AXIS), P(), P()),
        out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)),
        check_vma=False,
    )(inher_q, explore_q, ctx_i, ctx_e, block_mask, fusion_w, block_start)


class Retriever:
    """Device-resident corpus + jitted batched top-k search."""

    def __init__(self, model: DLDKD, params, query_bsz: int = 256,
                 fusion: Tuple[float, float] = (0.7, 0.3),
                 mesh=None, score_quant: bool = False,
                 rescore: bool = True, index_store: Optional[str] = None,
                 stream_block: int = 2048,
                 shortlist_factor: int = SHORTLIST_FACTOR,
                 warm_start: bool = False,
                 aot_cache_dir: Optional[str] = None):
        """mesh: jax.sharding.Mesh to shard the corpus over; None (default)
        auto-builds a full-device mesh when >1 device is visible, so a
        multi-chip slice never serves from a single chip.

        score_quant: stage-1 scoring on int8-quantized cosine components
        (2x MXU throughput; see ops.similarity.clip_scores_maxpool).
        With rescore=True (default) the int8 pass only proposes a 4k
        shortlist per query and the returned top-k is re-ranked with a
        TRUE-f32 rescore (upcast + highest matmul precision) — on an f32
        index results match the exact full-matrix path id-for-id (up to
        ulp-level score ties, which the two exact computations may break
        differently); on a bf16 serving index the rescored ranks are
        STRICTLY MORE exact than the bf16 full-matrix kernel (which
        cannot separate sub-bf16-resolution near-ties). rescore=False returns raw int8 ranks (~2.7e-3
        absolute score error, exact ties on the int8 grid broken by
        video id).

        index_store: 'encoded' keeps both branches' encoded frame
        features device-resident — fastest, but the corpus-scale memory
        ceiling. 'raw' keeps only the RAW frame features (in the model's
        compute dtype: bf16 halves them) and re-encodes
        stream_block-video blocks inside each search — encoded features
        never materialize beyond one block, lifting corpus capacity ~4x
        at a per-search re-encode cost (the posture tools/stream_bench.py
        measures at 8x TVR scale). None (default) AUTO-selects at
        index() time: 'encoded' when its estimated footprint fits the
        device budget, 'raw' otherwise. Both stores compose with the
        mesh: 'encoded' shards the encoded corpus, 'raw' shards every
        re-encoded block (each device streams its slice, merging
        per-device top-ks).
        """
        self.model = model
        self.params = params
        self.query_bsz = query_bsz
        self.score_quant = bool(score_quant)
        self.rescore = bool(rescore)
        self.shortlist_factor = int(shortlist_factor)
        # warm_start: with score_quant, the big int8 program — the one
        # program this platform's compile cache never persists (60-130 s
        # per fresh process, BENCHMARKS.md) — compiles in a BACKGROUND
        # thread while search() serves the exact path immediately, then
        # swaps over. First results in seconds instead of minutes; warmup
        # results are the exact path's (strictly more precise), post-swap
        # results identical to a cold score_quant retriever's.
        self.warm_start = bool(warm_start) and self.score_quant
        # aot_cache_dir: persist the COMPILED int8 search executable across
        # processes (utils/aot_cache; executable serialization is proven on
        # this platform) — a fresh process loads it in seconds instead of
        # recompiling. Composes with warm_start: a cache hit skips the
        # exact-path detour entirely; a miss compiles in the warm thread
        # and then populates the cache for the next process.
        self.aot_cache_dir = aot_cache_dir or None
        import threading

        self._q8_program_ready = threading.Event()
        self._warm_thread = None
        self._warm_failed = False   # latch: a failed int8 compile is not
                                    # retried — serving stays on the exact
                                    # path instead of looping doomed
                                    # 60-130 s compiles
        # compiled (or cache-loaded) int8 search executables keyed by
        # (batch-shape, k) signature; executed directly when present —
        # the lower().compile() route does not populate the jit call
        # cache. A small dict (not one slot) so alternating serving
        # signatures don't thrash recompiles.
        self._q8_compiled = {}
        self._Q8_SLOT_CAP = 4
        # bumped by every index()/load_index(): compiled executables bind
        # the index operand shapes, so a refresh must drop them, and a
        # warm thread still compiling against the OLD index must not
        # publish into the new one
        self._index_gen = 0
        if index_store not in (None, "auto", "encoded", "raw"):
            raise ValueError(f"index_store: {index_store!r}")
        self.index_store = None if index_store == "auto" else index_store
        self.stream_block = int(stream_block)
        # traced (not closed-over) so it never becomes a device constant
        self.fusion = np.asarray(fusion, np.float32)
        if mesh is None and jax.device_count() > 1:
            from dldkd_tpu.parallel import make_mesh

            mesh = make_mesh(jax.device_count())
        self.mesh = mesh
        self.raw_feats = None
        self.raw_mask = None
        self.raw_per_dev = 0   # rows owned per device (raw+mesh layout)
        self.ctx_inher = None
        self.ctx_explore = None
        self.vmask = None
        # prebuilt int8 scoring index (score_quant, single-device encoded
        # store): stage 1 scores run straight on it — no per-search corpus
        # quantize pre-pass. With rescore=False it is the ONLY store (4x
        # smaller than f32 frames, 2x smaller than bf16).
        self.q8_inher = None
        self.q8_explore = None
        self.q8_bias = None
        self.q8_per_dev = 0  # logical corpus rows per device (mesh q8)
        self.video_ids: List[str] = []

    @classmethod
    def from_checkpoint(cls, model_dir: str, **kw) -> "Retriever":
        ckpt_dir = f"{model_dir}/ckpt"
        mcfg = ckpt_lib.load_model_cfg(ckpt_dir)
        model = DLDKD(config=mcfg)
        from dldkd_tpu.train import init_params

        template = init_params(model, mcfg, 0)
        params, _ = ckpt_lib.restore_params_only(ckpt_dir, template)
        return cls(model, params, **kw)

    def _reset_index(self) -> None:
        """Drop every artifact of a previously built index before building
        or loading a new one. The compiled int8 executables embed the OLD
        index's operand shapes — kept around, the next search would call a
        stale executable (shape TypeError), or with an equal-shaped refresh
        silently serve the old corpus. The generation bump makes a warm
        thread racing this refresh publish into the void instead."""
        self._index_gen += 1
        self._q8_compiled.clear()
        self._q8_program_ready.clear()
        self._warm_failed = False
        self.raw_feats = self.raw_mask = None
        self.raw_per_dev = 0
        self.ctx_inher = self.ctx_explore = self.vmask = None
        self.q8_inher = self.q8_explore = self.q8_bias = None
        self.q8_per_dev = 0
        self.video_ids = []

    def _mesh_place(self, n: int):
        """Shared mesh-placement preamble for every encoded/q8 store:
        replicate the params over the mesh and return (n_pad, sharding)
        for an n-row corpus padded so each device owns the same row count.
        index() and both load_index() branches must lay out identically or
        a loaded index would compile a different search program than the
        built one."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dldkd_tpu.parallel import replicated
        from dldkd_tpu.parallel.mesh import DATA_AXIS

        n_dev = self.mesh.devices.size
        n_pad = -(-n // n_dev) * n_dev
        self.params = jax.device_put(self.params, replicated(self.mesh))
        return n_pad, NamedSharding(self.mesh, P(DATA_AXIS))

    def _build_q8_sharded(self, ci, ce, vm, quantize: bool = True):
        """Per-shard stage-1 int8 index build, through the AOT executable
        cache when one is configured: the build program is a one-shot
        Pallas layout pass whose compile a fresh serving replica should
        load, not pay (the same replica-cold-start reasoning as the search
        executables; set self.q8_per_dev before calling so the cache key
        is stable)."""
        args = (ci, ce, vm, self.mesh, quantize)
        if self.aot_cache_dir is None:
            return _build_q8_sharded_jit(*args)
        from dldkd_tpu.utils import aot_cache

        call = aot_cache.cached_compile(
            _build_q8_sharded_jit, args, name="build_q8_sharded",
            parts=[repr(self.model.config), quantize]
                  + self._mesh_key_parts(),
            static_idx=(3, 4), cache_dir=self.aot_cache_dir)
        return call(*args)

    def auto_index_store(self, n_videos: int) -> str:
        """'encoded' when the encoded-index footprint (both branches'
        frame features + transient int8/score headroom) fits the device
        budget, else 'raw'. Platforms that report no budget keep
        'encoded' (today's behavior)."""
        from dldkd_tpu.evaluate import device_memory_budget

        budget = device_memory_budget()
        if budget is None:
            return "encoded"
        mcfg = self.model.config
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        # bytes per frame-feature element actually stored: compute dtype
        # for the exact store; +1 for the int8 stage-1 index alongside it
        # when rescoring; int8 ONLY when score_quant without rescore (the
        # same itemsize=1 case evaluate.resident_eval_bytes models)
        itemsize = jnp.dtype(mcfg.dtype).itemsize
        if self.score_quant:
            itemsize = itemsize + 1 if self.rescore or self.warm_start else 1
        hiddens = [mcfg.inheritance_hidden] + (
            [mcfg.exploration_hidden] if mcfg.double_branch else [])
        per_dev = -(-n_videos // n_dev)
        ctx = sum(per_dev * mcfg.max_ctx_l * h * itemsize for h in hiddens)
        need = 2 * ctx + 256 * 1024 * 1024
        return "encoded" if need <= budget else "raw"

    def index(self, videos: PackedVideos, context_bsz: int = 200) -> None:
        """Build the device-resident index: encoded frame features
        (index_store='encoded') or raw frame features in the model's
        compute dtype ('raw'); index_store=None picks automatically by
        device memory budget. Either store shards over the mesh when one
        is set — 'raw' assigns each device a contiguous row range and
        streams per-device stream_block-row blocks at search time."""
        self._reset_index()
        if self.index_store is None:
            self.index_store = self.auto_index_store(len(videos))
        if self.index_store == "raw":
            n = len(videos)
            dtype = jnp.dtype(self.model.config.dtype)
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            sb = self.stream_block
            # pad so every device owns the same whole number of blocks
            # (device d's rows: [d*per_dev, (d+1)*per_dev))
            rows_per_dev = -(-n // n_dev)
            per_dev = -(-rows_per_dev // sb) * sb
            n_pad = per_dev * n_dev
            if n_dev == 1:
                # allocate the padded buffer directly in the target
                # dtype: assignment casts row-wise, avoiding a second
                # full-corpus f32 temp at exactly this mode's scale
                feats = np.zeros((n_pad,) + videos.feats.shape[1:], dtype)
                feats[:n] = videos.feats
                mask = np.zeros((n_pad,) + videos.mask.shape[1:],
                                np.float32)
                mask[:n] = videos.mask
                self.raw_feats = jax.device_put(feats)
                self.raw_mask = jax.device_put(mask)
            else:
                # sharded store: per-BLOCK global arrays, each sharded
                # over the mesh so block j's shard on device d is that
                # device's rows [d*per_dev + j*sb, d*per_dev + (j+1)*sb)
                # — search streams block j on all devices at once
                from jax.sharding import NamedSharding, PartitionSpec as P

                from dldkd_tpu.parallel import replicated
                from dldkd_tpu.parallel.mesh import DATA_AXIS

                corpus_sh = NamedSharding(self.mesh, P(DATA_AXIS))
                self.params = jax.device_put(self.params,
                                             replicated(self.mesh))
                self.raw_feats, self.raw_mask = [], []
                fshape, mshape = videos.feats.shape[1:], videos.mask.shape[1:]
                for j in range(per_dev // sb):
                    bf = np.zeros((n_dev * sb,) + fshape, dtype)
                    bm = np.zeros((n_dev * sb,) + mshape, np.float32)
                    for d in range(n_dev):
                        lo = d * per_dev + j * sb
                        rows = videos.feats[lo:min(lo + sb, n)]
                        bf[d * sb:d * sb + len(rows)] = rows
                        bm[d * sb:d * sb + len(rows)] = \
                            videos.mask[lo:min(lo + sb, n)]
                    self.raw_feats.append(jax.device_put(bf, corpus_sh))
                    self.raw_mask.append(jax.device_put(bm, corpus_sh))
            self.raw_per_dev = per_dev
            self.ctx_inher = "raw"  # sentinel: index built
            self.video_ids = list(videos.ids)
            return
        if self.mesh is not None:
            from dldkd_tpu.parallel.eval_shard import _encode_corpus, _pad_rows

            n_dev = self.mesh.devices.size
            n_pad, corpus_sh = self._mesh_place(len(videos))
            feats = jax.device_put(_pad_rows(videos.feats, n_pad), corpus_sh)
            self.vmask = jax.device_put(_pad_rows(videos.mask, n_pad),
                                        corpus_sh)
            if self.score_quant and not self.rescore and not self.warm_start:
                # int8-only SHARDED store: each device's towers emit its
                # slice's quantized index directly — encoded frames never
                # materialize on any device (the mesh twin of the
                # single-device embed_corpus_q8 branch below)
                from dldkd_tpu.parallel.eval_shard import _encode_corpus_q8

                self.q8_inher, self.q8_explore, self.q8_bias = \
                    _encode_corpus_q8(self.model, self.params, feats,
                                      self.vmask, self.mesh)
                self.q8_per_dev = n_pad // n_dev
                self.vmask = None  # the index bias carries the mask
                self.ctx_inher = "q8"  # sentinel: index built
                self.video_ids = list(videos.ids)
                return
            self.ctx_inher, self.ctx_explore = _encode_corpus(
                self.model, self.params, feats, self.vmask, self.mesh)
            if self.score_quant:
                # two-stage serving under the mesh: prebuild each shard's
                # stage-1 int8 index ONCE (search calls previously re-paid
                # the quantize pre-pass per device per call)
                self.q8_per_dev = n_pad // n_dev
                self.q8_inher, self.q8_explore, self.q8_bias = \
                    self._build_q8_sharded(self.ctx_inher, self.ctx_explore,
                                           self.vmask)
        else:
            from dldkd_tpu.evaluate import embed_corpus

            if self.score_quant and not self.rescore and not self.warm_start:
                # int8-only index: the towers emit it directly; encoded
                # frames never materialize (4x smaller than f32 frames).
                # (warm_start keeps the encoded frames: its interim exact
                # path needs them)
                from dldkd_tpu.evaluate import embed_corpus_q8

                self.q8_inher, self.q8_explore, self.q8_bias = \
                    embed_corpus_q8(self.model, self.params, videos,
                                    context_bsz)
                self.ctx_inher = "q8"  # sentinel: index built
                self.video_ids = list(videos.ids)
                return
            self.ctx_inher, self.ctx_explore, self.vmask = embed_corpus(
                self.model, self.params, videos, context_bsz)
            if self.score_quant:
                # two-stage serving: prebuild the stage-1 int8 index from
                # the encoded frames ONCE (the quantize+transpose pass
                # every search() call used to pay); the bf16/f32 frames
                # stay resident only for the stage-2 exact rescore gather
                from dldkd_tpu.ops.pallas.sim_max import (build_q8_index,
                                                          quantize_frames_q8)

                self.q8_inher, self.q8_bias = build_q8_index(
                    quantize_frames_q8(self.ctx_inher), self.vmask)
                if self.ctx_explore is not None:
                    self.q8_explore, _ = build_q8_index(
                        quantize_frames_q8(self.ctx_explore), self.vmask)
        self.video_ids = list(videos.ids)

    def index_corpus(self, root_path: str, collection: str,
                     visual_feature: str, split: str = "test") -> None:
        from dldkd_tpu.data import BigFile, pack_video_corpus, read_dict
        from dldkd_tpu.data.ingest import dataset_paths, read_video_ids

        paths = dataset_paths(root_path, collection, visual_feature)
        vf = BigFile(paths["visual_feat_dir"])
        videos = pack_video_corpus(
            read_video_ids(paths["cap_file"][split]), vf,
            read_dict(paths["video2frames"]),
            max_ctx_l=self.model.config.max_ctx_l)
        self.index(videos)

    def _q8_canonical_rows(self):
        """(rows_inher (Nv, L_p, D) int8, rows_explore | None,
        mask (Nv, L_p) uint8) reconstructed from the built q8 index —
        un-transposed, per-device lane padding stripped, device-order
        blocks re-concatenated. The device-count-independent artifact
        payload: mask comes back from the bias (0 <=> valid frame)."""
        n = len(self.video_ids)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        t_i = np.asarray(self.q8_inher)
        t_e = (np.asarray(self.q8_explore)
               if self.q8_explore is not None else None)
        bias = np.asarray(self.q8_bias)
        nv_loc_p = t_i.shape[1] // n_dev
        per_dev = self.q8_per_dev if n_dev > 1 else n
        rows_i, rows_e, mrows = [], [], []
        for d in range(n_dev):
            lo = d * nv_loc_p
            real = max(0, min(per_dev, n - d * per_dev))
            if not real:
                break
            rows_i.append(np.transpose(t_i[:, lo:lo + real], (1, 0, 2)))
            if t_e is not None:
                rows_e.append(np.transpose(t_e[:, lo:lo + real], (1, 0, 2)))
            mrows.append((bias[:, lo:lo + real] == 0).T.astype(np.uint8))
        return (np.concatenate(rows_i),
                np.concatenate(rows_e) if t_e is not None else None,
                np.concatenate(mrows))

    def _raw_canonical_rows(self, n: int):
        """(feats (n, L, D), mask (n, L) f32) gathered back to canonical
        row order from the raw+mesh store's per-block device-interleaved
        arrays (index()'s raw mesh layout, inverted)."""
        n_dev = self.mesh.devices.size
        per_dev, sb = self.raw_per_dev, self.stream_block
        f0 = np.asarray(self.raw_feats[0])
        m0 = np.asarray(self.raw_mask[0])
        feats = np.zeros((n,) + f0.shape[1:], f0.dtype)
        mask = np.zeros((n,) + m0.shape[1:], np.float32)
        for j in range(per_dev // sb):
            bf = np.asarray(self.raw_feats[j])
            bm = np.asarray(self.raw_mask[j])
            for d in range(n_dev):
                lo = d * per_dev + j * sb
                rows = min(sb, n - lo)
                if rows > 0:
                    feats[lo:lo + rows] = bf[d * sb:d * sb + rows]
                    mask[lo:lo + rows] = bm[d * sb:d * sb + rows]
        return feats, mask

    def save_index(self, path: str,
                   prewarm: Optional[List[Tuple[int, int]]] = None) -> None:
        """Persist the built index as a durable artifact (build once
        offline, load in every serving replica): meta.json + one .npy per
        array (utils/index_io format).

        prewarm: list of (lq, k) search signatures (at this retriever's
        query_bsz) to compile NOW and record in the artifact meta as the
        signature manifest. With aot_cache_dir set, each compiled int8
        search executable persists, so every replica that loads this
        artifact (same aot_cache_dir) starts with the whole manifest as
        pure cache hits — a replica fleet pays the 60-130 s int8 compile
        once, at build time, for all of its serving shapes
        (tools/coldstart_bench --policy fleet measures this posture).

        What is written depends on the store that was built:

        - 'encoded': both branches' frame features + mask, REAL rows only
          (bf16 at serving config: ~0.5 GB at TVR scale vs the 1.1 GB f32
          raw corpus). The stage-1 int8 companions are NOT written —
          load_index rebuilds them in one device pass, cheaper than
          uploading them.
        - int8-only ('q8' sentinel): the 4x-smaller quantized frame rows
          in CANONICAL row-major form (device-count-independent: a mesh
          build saves an artifact a single device loads and vice versa);
          the index layout (transpose + lane padding + mask bias) is
          rebuilt on load, per shard under a mesh.
        - 'raw': the raw features in the compute dtype, canonical
          row-major (a mesh build's block-interleaved store is gathered
          back to row order first — the artifact is device-count-
          independent; load_index re-lays-out for the loading topology).

        The index is bound to the encoding weights by a params
        fingerprint: load_index refuses a mismatch by default.

        The artifact is written to a staging directory and swapped into
        place whole (index_io.publish_dir): re-saving over an existing
        artifact never mixes new arrays with the old meta.json, so the
        fingerprint a replica checks always describes the arrays it loads.
        """
        import os
        import shutil

        from dldkd_tpu.utils import index_io

        if self.ctx_inher is None:
            raise RuntimeError("call index()/index_corpus() first")
        if prewarm and self.q8_inher is None:
            # validate BEFORE writing: the corpus arrays are the expensive
            # part of the artifact, and a failed prewarm after writing
            # them would leave the whole staging dir as disk garbage
            raise ValueError("prewarm needs the prebuilt int8 index "
                             "(score_quant=True)")
        stage = f"{path}.staging.{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage)
        try:
            self._write_index_stage(stage, prewarm)
        except BaseException:
            # never leave a multi-GB partial staging dir behind
            shutil.rmtree(stage, ignore_errors=True)
            raise
        index_io.publish_dir(stage, path)

    def _write_index_stage(self, stage: str,
                           prewarm: Optional[List[Tuple[int, int]]]) -> None:
        from dldkd_tpu.utils import index_io

        n = len(self.video_ids)
        manifest: dict = {}
        if self.index_store == "raw":
            if isinstance(self.raw_feats, list):
                # mesh store: per-block global arrays where block j holds
                # device d's rows [d*per_dev + j*sb, ...) at slice
                # [d*sb, (d+1)*sb) — gather back to canonical row order
                # so the artifact is device-count-independent
                feats, mask = self._raw_canonical_rows(n)
            else:
                feats = np.asarray(self.raw_feats)[:n]
                mask = np.asarray(self.raw_mask)[:n]
            index_io.save_array(stage, "raw_feats", feats, manifest)
            index_io.save_array(stage, "raw_mask", mask, manifest)
            mode = "raw"
        elif isinstance(self.ctx_inher, str):  # "q8" sentinel
            rows_i, rows_e, q8_mask = self._q8_canonical_rows()
            index_io.save_array(stage, "q8_rows_inher", rows_i, manifest)
            if rows_e is not None:
                index_io.save_array(stage, "q8_rows_explore", rows_e,
                                    manifest)
            index_io.save_array(stage, "q8_mask", q8_mask, manifest)
            mode = "q8"
        else:
            index_io.save_array(stage, "ctx_inher",
                                np.asarray(self.ctx_inher)[:n], manifest)
            if self.ctx_explore is not None:
                index_io.save_array(stage, "ctx_explore",
                                    np.asarray(self.ctx_explore)[:n],
                                    manifest)
            index_io.save_array(stage, "vmask",
                                np.asarray(self.vmask)[:n], manifest)
            mode = "encoded"
        meta = {
            "mode": mode,
            "arrays": manifest,
            "n_videos": n,
            "video_ids": list(self.video_ids),
            "model_config": repr(self.model.config),
            "params_fingerprint": index_io.params_fingerprint(self.params),
        }
        if prewarm:
            meta["prewarm_signatures"] = self._prewarm(prewarm)
        index_io.write_meta(stage, meta)

    def _prewarm(self, signatures: List[Tuple[int, int]]) -> list:
        """Compile (and, with aot_cache_dir, persist) the int8 search
        executable for each (lq, k) signature at this retriever's
        query_bsz; returns the manifest rows for the artifact meta."""
        import logging

        if self.q8_inher is None:
            raise ValueError("prewarm needs the prebuilt int8 index "
                             "(score_quant=True)")
        if self.aot_cache_dir is None:
            logging.getLogger(__name__).warning(
                "prewarm without aot_cache_dir: the compiled executables "
                "die with this process — replicas will recompile")
        cfg = self.model.config
        rows = []
        for lq, k in signatures:
            f = jnp.zeros((self.query_bsz, int(lq), cfg.query_input_size),
                          jnp.float32)
            m = jnp.ones((self.query_bsz, int(lq)), jnp.float32)
            sig = (f.shape, int(k))
            if sig not in self._q8_compiled:
                args = self._q8_args(f, m, int(k))
                # a rebuild against an already-populated executable cache
                # (nightly artifact refresh, fleet drills on a warm box)
                # must not pay the 60-130 s compile per signature again —
                # probe the cache first, like every other consumer
                if not self._try_load_q8_compiled(sig, args):
                    self._compile_q8(sig, args, self._index_gen)
            rows.append([int(self.query_bsz), int(lq), int(k)])
        return rows

    def _adopt_prewarm(self, meta: dict) -> None:
        """Publish every manifest signature from the artifact meta as a
        loaded executable (pure cache hits — no compiles): a replica that
        load_index()es a prewarmed artifact is fully warm at load time,
        not at its first search of each shape."""
        sigs = meta.get("prewarm_signatures") or []
        if not sigs or self.aot_cache_dir is None or self.q8_inher is None:
            return
        cfg = self.model.config
        for bsz, lq, k in sigs:
            if int(bsz) != self.query_bsz:
                continue  # manifest row for a different serving batch size
            f = np.zeros((int(bsz), int(lq), cfg.query_input_size),
                         np.float32)
            m = np.ones((int(bsz), int(lq)), np.float32)
            self._try_load_q8_compiled((f.shape, int(k)),
                                       self._q8_args(f, m, int(k)))

    def load_index(self, path: str, strict: bool = True,
                   context_bsz: int = 200) -> None:
        """Restore a save_index() artifact instead of re-uploading and
        re-encoding the corpus. strict=True (default) refuses an index
        whose params fingerprint or model config differs from this
        retriever's — such an index would silently serve wrong results.

        Loading replaces any previously built index outright, including
        the compiled int8 search executables (their operand shapes embed
        the old index).

        context_bsz must match the index()-time value: single-device rows
        re-pad to that grid so a loaded index compiles the SAME search
        program a build-time retriever did — an executable cached by the
        offline builder (aot_cache_dir) then loads here instead of
        recompiling.

        Mesh composition: an 'encoded' artifact loads under a mesh (rows
        re-padded and sharded over the devices, params replicated, the
        per-shard stage-1 int8 companions rebuilt when score_quant); a
        'raw' artifact re-shards by re-running index() layout on the
        loaded features; a 'q8' artifact's canonical rows re-layout per
        shard (no re-quantization).
        """
        import logging

        from dldkd_tpu.utils import index_io

        meta = index_io.read_meta(path)
        fp = index_io.params_fingerprint(self.params)
        if (meta["params_fingerprint"] != fp
                or meta["model_config"] != repr(self.model.config)):
            msg = (f"index at {path} was built with different "
                   f"weights/config than this retriever's")
            if strict:
                raise ValueError(msg + " (strict=False to force)")
            logging.getLogger(__name__).warning("%s; loading anyway", msg)
        arrays = {name: index_io.load_array(path, name, dt)
                  for name, dt in meta["arrays"].items()}
        video_ids = list(meta["video_ids"])
        n = meta["n_videos"]
        mode = meta["mode"]
        self._reset_index()
        from dldkd_tpu.parallel.eval_shard import _pad_rows

        # single-device stores re-pad to the embed_corpus context grid so
        # the loaded arrays are shape-identical to a build-time index's
        n_ctx = -(-n // context_bsz) * context_bsz
        if mode == "raw":
            # reuse index()'s layout code (incl. the mesh block
            # distribution): the loaded features ARE the packed corpus in
            # the compute dtype — index() only re-casts (a no-op) and
            # places them
            self.index_store = "raw"
            self.index(PackedVideos(feats=arrays["raw_feats"],
                                    mask=np.asarray(arrays["raw_mask"],
                                                    np.float32),
                                    ids=video_ids))
            return
        if mode == "q8":
            if not self.score_quant or self.rescore or self.warm_start:
                raise ValueError(
                    "an int8-only index has no frame features: it serves "
                    "only score_quant=True, rescore=False, "
                    "warm_start=False retrievers")
            rows_i = arrays["q8_rows_inher"]
            rows_e = arrays.get("q8_rows_explore")
            q8_mask = np.asarray(arrays["q8_mask"], np.float32)
            if self.mesh is not None:  # search() routes by mesh presence,
                # so even a size-1 mesh must take the sharded layout.
                # Re-layout per shard: rows pad + shard over the mesh,
                # each device builds its block (no re-quantization —
                # the rows ARE the stored int8 values)
                n_pad, corpus_sh = self._mesh_place(n)
                ci = jax.device_put(_pad_rows(rows_i, n_pad), corpus_sh)
                ce = (jax.device_put(_pad_rows(rows_e, n_pad), corpus_sh)
                      if rows_e is not None else None)
                vm = jax.device_put(_pad_rows(q8_mask, n_pad), corpus_sh)
                self.q8_per_dev = n_pad // self.mesh.devices.size
                self.q8_inher, self.q8_explore, self.q8_bias = \
                    self._build_q8_sharded(ci, ce, vm, quantize=False)
            else:
                from dldkd_tpu.ops.pallas.sim_max import build_q8_index

                rows_i = _pad_rows(rows_i, n_ctx)
                q8_mask = _pad_rows(q8_mask, n_ctx)
                self.q8_inher, self.q8_bias = build_q8_index(
                    jnp.asarray(rows_i), jnp.asarray(q8_mask))
                self.q8_explore = (build_q8_index(
                    jnp.asarray(_pad_rows(rows_e, n_ctx)),
                    jnp.asarray(q8_mask))[0]
                                   if rows_e is not None else None)
            self.ctx_inher = "q8"
            self.index_store = "encoded"
            self.video_ids = video_ids
            self._adopt_prewarm(meta)
            return
        # encoded store
        ctx_i = arrays["ctx_inher"]
        ctx_e = arrays.get("ctx_explore")
        vmask = np.asarray(arrays["vmask"], np.float32)
        if self.mesh is not None:  # mesh presence, not size: see q8 branch
            n_pad, corpus_sh = self._mesh_place(n)
            self.ctx_inher = jax.device_put(_pad_rows(ctx_i, n_pad),
                                            corpus_sh)
            self.ctx_explore = (jax.device_put(_pad_rows(ctx_e, n_pad),
                                               corpus_sh)
                                if ctx_e is not None else None)
            self.vmask = jax.device_put(_pad_rows(vmask, n_pad), corpus_sh)
            if self.score_quant:
                # stage-1 companions rebuild per shard (not stored)
                self.q8_per_dev = n_pad // self.mesh.devices.size
                self.q8_inher, self.q8_explore, self.q8_bias = \
                    self._build_q8_sharded(self.ctx_inher, self.ctx_explore,
                                           self.vmask)
        else:
            self.ctx_inher = jnp.asarray(_pad_rows(ctx_i, n_ctx))
            self.ctx_explore = (jnp.asarray(_pad_rows(ctx_e, n_ctx))
                                if ctx_e is not None else None)
            self.vmask = jnp.asarray(_pad_rows(vmask, n_ctx))
            if self.score_quant:
                # stage-1 companions rebuild in one device pass — cheaper
                # than storing + uploading them
                from dldkd_tpu.ops.pallas.sim_max import (
                    build_q8_index, quantize_frames_q8)

                self.q8_inher, self.q8_bias = build_q8_index(
                    quantize_frames_q8(self.ctx_inher), self.vmask)
                if self.ctx_explore is not None:
                    self.q8_explore, _ = build_q8_index(
                        quantize_frames_q8(self.ctx_explore), self.vmask)
        self.index_store = "encoded"
        self.video_ids = video_ids
        self._adopt_prewarm(meta)

    def _search_streaming(self, q_feats, q_mask, k: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Raw-index search: encode ALL queries first (pooled vectors are
        a few MB even at dataset scale), then stream each raw corpus
        block through encode+score exactly ONCE against every query, and
        merge per-block top-k (the global top-k is a subset of the union
        of block top-ks). One corpus pass per search() call, independent
        of the query count."""
        from dldkd_tpu.evaluate import _encode_context_jit, _encode_queries_jit

        sharded = self.mesh is not None and self.mesh.devices.size > 1
        rep = None
        if sharded:
            from dldkd_tpu.parallel import replicated

            rep = replicated(self.mesh)

        n = q_feats.shape[0]
        bsz = self.query_bsz
        n_q_pad = -(-n // bsz) * bsz
        qi_rows, qe_rows = [], []
        for start in range(0, n_q_pad, bsz):
            f = q_feats[start:start + bsz]
            m = q_mask[start:start + bsz]
            pad = bsz - f.shape[0]
            if pad:
                f = np.concatenate([f, np.zeros((pad,) + f.shape[1:],
                                                f.dtype)])
                m = np.concatenate([m, np.zeros((pad,) + m.shape[1:],
                                                m.dtype)])
            if len(qi_rows) >= _SEARCH_INFLIGHT_BATCHES:
                # same backpressure as search(): the encoded rows are tiny
                # but their INPUT uploads are not; a scalar peek forces the
                # oldest encode (freeing its input) without moving the
                # device row to host (block_until_ready doesn't block on
                # this platform — CLAUDE.md)
                w = len(qi_rows) - _SEARCH_INFLIGHT_BATCHES
                np.asarray(qi_rows[w][:1, :1])
            f, m = jnp.asarray(f), jnp.asarray(m)
            if sharded:
                f, m = jax.device_put((f, m), rep)
            qi, qe = _encode_queries_jit(self.model, self.params, f, m)
            qi_rows.append(qi)
            if qe is not None:
                qe_rows.append(qe)
        qi_all = jnp.concatenate(qi_rows)
        qe_all = jnp.concatenate(qe_rows) if qe_rows else None

        if sharded:
            return self._merge_block_topk(
                self._sharded_raw_block_topks(qi_all, qe_all, k), k, n)

        n_pad_vid = self.raw_feats.shape[0]
        k_blk = min(k, self.stream_block)
        pairs = []
        for b in range(0, n_pad_vid, self.stream_block):
            bf = jax.lax.slice_in_dim(self.raw_feats, b,
                                      b + self.stream_block)
            bm = jax.lax.slice_in_dim(self.raw_mask, b,
                                      b + self.stream_block)
            ctx_i, ctx_e = _encode_context_jit(self.model, self.params,
                                               bf, bm)
            pairs.append(_encoded_block_topk_jit(
                qi_all, qe_all, ctx_i, ctx_e, bm, k_blk,
                jnp.asarray(self.fusion), jnp.int32(b),
                self.score_quant, self.rescore, self.shortlist_factor))
        return self._merge_block_topk(pairs, k, n)

    def _sharded_raw_block_topks(self, qi_all, qe_all, k: int):
        """Raw+mesh search: stream every per-device block j through
        encode (per-shard Pallas towers under shard_map, reusing the
        sharded eval's _encode_corpus) and a per-device top-k; returns
        [(vals, global idx)] per block."""
        from dldkd_tpu.parallel.eval_shard import _encode_corpus

        sb = self.stream_block
        pairs = []
        for j, (bf, bm) in enumerate(zip(self.raw_feats, self.raw_mask)):
            ctx_i, ctx_e = _encode_corpus(self.model, self.params, bf, bm,
                                          self.mesh)
            pairs.append(_encoded_block_topk_sharded_jit(
                qi_all, qe_all, ctx_i, ctx_e, bm, k,
                jnp.asarray(self.fusion), jnp.int32(j * sb),
                self.raw_per_dev, self.mesh, self.score_quant,
                self.rescore, self.shortlist_factor))
        return pairs

    # _search_q8_jit's static argument positions (model, k, rescore,
    # shortlist_factor); everything else is a traced operand the compiled
    # executable takes positionally
    _Q8_STATICS = (0, 7, 12, 13)
    # _search_q8_sharded_jit's statics (model, k, mesh, per_dev, rescore,
    # shortlist_factor)
    _Q8_SHARDED_STATICS = (0, 7, 12, 13, 14, 15)

    def _q8_route(self):
        """(jitted program, static positions, cache-key name) of the int8
        search for this retriever's topology. The mesh route is the
        default on any multi-device host (__init__ auto-builds a mesh), so
        the cold-start mitigations — warm_start and the AOT executable
        cache — must bind to it exactly as they do to the single-device
        program (they were silently dead under a mesh before round 5)."""
        if self.mesh is not None:
            return (_search_q8_sharded_jit, self._Q8_SHARDED_STATICS,
                    "search_q8_sharded")
        return _search_q8_jit, self._Q8_STATICS, "search_q8"

    def _q8_args(self, f, m, k: int):
        if self.mesh is not None:
            # the sharded program substitutes explore=inher internally
            # when the model is single-branch
            return (self.model, self.params, f, m, self.q8_inher,
                    self.q8_explore, self.q8_bias, k,
                    self.ctx_inher if self.rescore else None,
                    self.ctx_explore if self.rescore else None,
                    self.vmask if self.rescore else None,
                    jnp.asarray(self.fusion), self.mesh, self.q8_per_dev,
                    self.rescore, self.shortlist_factor)
        q8_e = (self.q8_explore if self.q8_explore is not None
                else self.q8_inher)
        ctx_e = (self.ctx_explore if self.ctx_explore is not None
                 else self.ctx_inher)
        return (self.model, self.params, f, m, self.q8_inher, q8_e,
                self.q8_bias, k,
                self.ctx_inher if self.rescore else None,
                ctx_e if self.rescore else None,
                self.vmask, jnp.asarray(self.fusion),
                self.rescore, self.shortlist_factor)

    def _mesh_key_parts(self) -> list:
        """Cache-key parts describing the mesh topology: the sharded
        operands' GLOBAL shapes are device-count-independent, so without
        these an 8-device executable would be served to a 4-device
        process (the loader would fail and fall back, but the key should
        not collide in the first place)."""
        if self.mesh is None:
            return []
        return ["mesh", int(self.mesh.devices.size),
                tuple(self.mesh.axis_names), int(self.q8_per_dev)]

    def _q8_cache_key(self, args) -> str:
        """Everything that shapes the compiled program: static knobs +
        every operand leaf's shape/dtype (the model config rides in via
        the param tree + index shapes) + the mesh topology + the
        dense-rescore dispatch mode (an executable lowered under
        DLDKD_DENSE_RESCORE=never must never serve an =always process —
        the mode changes the traced stage-2 program)."""
        from dldkd_tpu.ops.similarity import dense_rescore_mode
        from dldkd_tpu.utils import aot_cache

        _, statics, name = self._q8_route()
        shapes = aot_cache.operand_shapes(args, statics)
        # without rescore stage 2 never traces, so the mode can't shape
        # the program — keep those keys mode-independent
        mode = dense_rescore_mode() if self.rescore else "-"
        parts = [repr(self.model.config), args[7], self.rescore,
                 self.shortlist_factor, shapes,
                 mode] + self._mesh_key_parts()
        return aot_cache.cache_key(name, parts)

    def _q8_call_compiled(self, fn, args):
        statics = self._q8_route()[1]
        return fn(*[a for i, a in enumerate(args)
                    if i not in statics])

    def _publish_q8(self, sig, fn, gen: Optional[int] = None) -> None:
        if gen is not None and gen != self._index_gen:
            return  # compiled against an index replaced mid-compile
        self._q8_compiled[sig] = fn
        while len(self._q8_compiled) > self._Q8_SLOT_CAP:
            # insertion-ordered dict: evict the oldest signature
            self._q8_compiled.pop(next(iter(self._q8_compiled)))
        self._q8_program_ready.set()

    def _try_load_q8_compiled(self, sig, args) -> bool:
        if self.aot_cache_dir is None:
            return False
        from dldkd_tpu.utils import aot_cache

        fn = aot_cache.load(self.aot_cache_dir, self._q8_cache_key(args))
        if fn is None:
            return False
        self._publish_q8(sig, fn)
        return True

    def _compile_q8(self, sig, args, gen: Optional[int] = None) -> None:
        """Foreground/warm-thread compile of the int8 search executable
        (topology-routed: the sharded program under a mesh); persists it
        when the AOT cache is on, then publishes it (unless the index
        generation moved on mid-compile)."""
        jitted = self._q8_route()[0]
        compiled = jitted.lower(*args).compile()
        if self.aot_cache_dir is not None:
            from dldkd_tpu.utils import aot_cache

            aot_cache.save(self.aot_cache_dir, self._q8_cache_key(args),
                           compiled)
        self._publish_q8(sig, compiled, gen)

    def _warm_q8(self, lq: int, k: int, sig) -> None:
        """Compile the int8 search executable for this (query_bsz, lq, k)
        signature in a background thread (persisting it when the AOT
        cache is on); sets _q8_program_ready on success so search() swaps
        over. Failure keeps serving the exact path forever."""
        import logging
        import threading

        if self._warm_failed or (self._warm_thread is not None
                                 and self._warm_thread.is_alive()):
            return
        gen = self._index_gen  # q8 args snapshot below belongs to THIS index

        def _run():
            try:
                cfg = self.model.config
                f = jnp.zeros((self.query_bsz, lq, cfg.query_input_size),
                              jnp.float32)
                m = jnp.ones((self.query_bsz, lq), jnp.float32)
                self._compile_q8(sig, self._q8_args(f, m, k), gen)
            except Exception:  # latch: keep serving the exact path forever
                self._warm_failed = True
                logging.getLogger(__name__).exception(
                    "int8 warm-start compile failed; serving stays on the "
                    "exact path")

        self._warm_thread = threading.Thread(target=_run, daemon=True,
                                             name="dldkd-int8-warm")
        self._warm_thread.start()

    def _q8_search(self, f, m, k: int):
        """One query batch through the prebuilt-int8-index search with the
        cold-start mitigations, on this retriever's topology route
        (_q8_route — the sharded program under a mesh, the single-device
        program otherwise):

          1. signature already compiled/loaded -> call the executable
          2. warm_start AOT probe -> a cache hit serves NOW (no detour)
          3. warm_start miss -> kick the background compile, return None
             (the caller serves the exact path until the program lands)
          4. aot_cache_dir without warm_start -> load, or foreground
             lower/compile (so the executable object exists to persist)
          5. neither knob -> the plain jit call

        Returns (scores, idx), or None for the warm-start detour."""
        sig = (f.shape, k)
        if sig not in self._q8_compiled and self.warm_start:
            # a cache hit makes the program available NOW — no warm-start
            # detour, no compile. The key only reads operand
            # shapes/dtypes, so probe with the HOST arrays (no device
            # transfer).
            self._try_load_q8_compiled(sig, self._q8_args(f, m, k))
            if sig not in self._q8_compiled:
                # warm_start detour: kick off the background int8 compile
                # on the first search and answer from the EXACT path until
                # it lands — first results in seconds instead of the int8
                # program's uncacheable 60-130 s cold compile
                self._warm_q8(f.shape[1], k, sig)
                return None
        args = self._q8_args(jnp.asarray(f), jnp.asarray(m), k)
        if sig not in self._q8_compiled and self.aot_cache_dir is not None:
            # AOT cache on: load or compile ONCE via the explicit
            # lower/compile route (so the executable object exists to
            # persist) and serve through it
            if not self._try_load_q8_compiled(sig, args):
                self._compile_q8(sig, args, self._index_gen)
        fn = self._q8_compiled.get(sig)
        if fn is not None:
            # the cache-loaded / warm-compiled executable
            return self._q8_call_compiled(fn, args)
        return self._q8_route()[0](*args)

    @staticmethod
    def _merge_block_topk(pairs, k: int, n_queries: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
        """Global top-k from per-block (and per-device) candidate sets:
        the global top-k is a subset of the union of block top-ks."""
        allv = jnp.concatenate([v for v, _ in pairs], axis=1)
        alli = jnp.concatenate([i for _, i in pairs], axis=1)
        s, pos = jax.lax.top_k(allv, k)
        idx = jnp.take_along_axis(alli, pos, axis=1)
        return np.asarray(s)[:n_queries], np.asarray(idx)[:n_queries]

    def search(self, q_feats: np.ndarray, q_mask: np.ndarray, k: int = 10
               ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores (Nq, k), indices (Nq, k)) over the indexed corpus.
        Queries are padded to the serving batch size internally."""
        if self.ctx_inher is None:
            raise RuntimeError("call index()/index_corpus() first")
        k = min(k, len(self.video_ids))
        if self.index_store == "raw":
            return self._search_streaming(q_feats, q_mask, k)
        n = q_feats.shape[0]
        out_s, out_i = [], []
        bsz = self.query_bsz
        ctx_e = (self.ctx_explore if self.ctx_explore is not None
                 else self.ctx_inher)
        for start in range(0, n, bsz):
            f = q_feats[start:start + bsz]
            m = q_mask[start:start + bsz]
            pad = bsz - f.shape[0]
            if pad:
                f = np.concatenate([f, np.zeros((pad,) + f.shape[1:], f.dtype)])
                m = np.concatenate([m, np.zeros((pad,) + m.shape[1:], m.dtype)])
            # backpressure BEFORE this batch uploads: forcing the oldest
            # un-fetched result guarantees its batch's compute drained
            # (and its input buffer freed), so at most
            # _SEARCH_INFLIGHT_BATCHES uploads are device-resident
            # including the one about to be dispatched
            if len(out_s) >= _SEARCH_INFLIGHT_BATCHES:
                w = len(out_s) - _SEARCH_INFLIGHT_BATCHES
                out_s[w] = np.asarray(out_s[w])
                out_i[w] = np.asarray(out_i[w])
            # the prebuilt-int8-index route (with its cold-start
            # mitigations) applies on BOTH topologies; the warm-start
            # detour answers from the topology's exact program while the
            # int8 executable compiles in the background
            res = (self._q8_search(f, m, k)
                   if self.q8_inher is not None else None)
            quantized = self.score_quant and self.q8_inher is None
            if res is not None:
                s, i = res
            elif self.mesh is not None:
                s, i = _search_sharded_jit(
                    self.model, self.params, jnp.asarray(f),
                    jnp.asarray(m), self.ctx_inher, ctx_e, k,
                    self.vmask, jnp.asarray(self.fusion), self.mesh,
                    quantized, self.rescore, self.shortlist_factor)
            else:
                s, i = _search_jit(self.model, self.params, jnp.asarray(f),
                                   jnp.asarray(m), self.ctx_inher, ctx_e, k,
                                   self.vmask, jnp.asarray(self.fusion),
                                   quantized, self.rescore,
                                   self.shortlist_factor)
            # defer the host fetch: np.asarray here would serialize every
            # batch on the tunnel RTT (~27 ms) + result readback before
            # the NEXT batch could even upload. Results are (bsz, k) —
            # tiny; the INPUT buffers are bounded by the window above.
            out_s.append(s)
            out_i.append(i)
        out_s = [np.asarray(s) for s in out_s]
        out_i = [np.asarray(i) for i in out_i]
        return (np.concatenate(out_s)[:n], np.concatenate(out_i)[:n])

    def search_ids(self, q_feats, q_mask, k: int = 10
                   ) -> List[List[Tuple[str, float]]]:
        scores, idx = self.search(q_feats, q_mask, k)
        return [[(self.video_ids[int(j)], float(s))
                 for j, s in zip(row_i, row_s)]
                for row_i, row_s in zip(idx, scores)]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--root_path", default="",
                   help="dataset root (optional with --load_index + HDF5 "
                        "--queries: the artifact replaces the dataset)")
    p.add_argument("--collection", default="")
    p.add_argument("--visual_feature", default="")
    p.add_argument("--split", default="test")
    p.add_argument("--queries", default="",
                   help="HDF5 of cap_id -> (Lq, Dq) RoBERTa token feats, or "
                        "a caption file to look ids up in the standard "
                        "TextData HDF5 (optional with --save_index: build "
                        "+ persist the index and exit)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", default="-")
    p.add_argument("--score_quant", action="store_true",
                   help="int8 first-pass scoring (2x MXU rate); exact "
                        "f32 rescoring of the shortlist keeps results "
                        "identical to the exact path AS LONG AS the true "
                        "top-k all land in the int8 shortlist (factor*k "
                        "candidates; int8 score error ~2.7e-3) — for "
                        "corpora with bigger near-tie groups raise "
                        "--shortlist_factor")
    p.add_argument("--no_rescore", action="store_true",
                   help="with --score_quant: skip the exact rescoring "
                        "stage and return raw int8 ranks")
    p.add_argument("--shortlist_factor", type=int, default=SHORTLIST_FACTOR,
                   help="stage-1 candidates per result (k' = factor*k); "
                        "raise for corpora with >4k-way near-tie groups")
    p.add_argument("--index_store", choices=["auto", "encoded", "raw"],
                   default="auto",
                   help="'raw' keeps only raw frame features device-"
                        "resident and re-encodes blocks per search "
                        "(~4x corpus capacity at a re-encode cost); "
                        "'auto' (default) picks by device memory budget")
    p.add_argument("--stream_block", type=int, default=2048,
                   help="videos per re-encoded block for --index_store raw")
    p.add_argument("--warm_start", action="store_true",
                   help="with --score_quant: serve the exact path "
                        "immediately while the int8 program compiles in a "
                        "background thread, then swap (mitigates the "
                        "uncacheable int8 cold compile)")
    p.add_argument("--aot_cache_dir", default="",
                   help="persist the compiled int8 search executable here "
                        "across processes (a fresh process loads it in "
                        "seconds instead of recompiling); entries are "
                        "trusted local files")
    p.add_argument("--save_index", default="", metavar="DIR",
                   help="after building the index, persist it under DIR "
                        "(Retriever.save_index) — an offline build step; "
                        "serving replicas then start with --load_index "
                        "instead of re-uploading + re-encoding the corpus")
    p.add_argument("--load_index", default="", metavar="DIR",
                   help="load a --save_index artifact instead of building "
                        "the index from the dataset (refuses an index "
                        "built with different weights)")
    p.add_argument("--prewarm", default="", metavar="LQ:K[,LQ:K...]",
                   help="with --save_index + --score_quant: compile the "
                        "int8 search executable for each lq:k signature "
                        "now and record the manifest in the artifact meta "
                        "— replicas loading the artifact (same "
                        "--aot_cache_dir) start with every signature as a "
                        "pure cache hit")
    args = p.parse_args(argv)
    if not args.queries and not args.save_index:
        p.error("--queries is required unless --save_index builds "
                "an index artifact and exits")
    needs_dataset = (not args.load_index
                     or (args.queries
                         and not args.queries.endswith((".hdf5", ".h5"))))
    if needs_dataset and not (args.root_path and args.collection
                              and args.visual_feature):
        p.error("--root_path/--collection/--visual_feature are required "
                "when building the index or resolving caption-file "
                "queries")
    if args.prewarm and not args.score_quant:
        # knowable NOW — save_index would only raise this after the full
        # corpus upload + encode (hours at real scale)
        p.error("--prewarm needs --score_quant (the prebuilt int8 index)")
    if args.prewarm and not args.save_index:
        p.error("--prewarm only applies to --save_index artifact builds")
    prewarm = None
    if args.prewarm:
        # parse the spec NOW too — a malformed value failing inside the
        # artifact write would discard the whole corpus build
        try:
            prewarm = []
            for part in args.prewarm.split(","):
                lq, k = part.split(":")
                prewarm.append((int(lq), int(k)))
        except ValueError:
            p.error(f"--prewarm {args.prewarm!r}: expected LQ:K[,LQ:K...] "
                    "with integer fields")

    from dldkd_tpu.data.ingest import dataset_paths, pack_query_set

    r = Retriever.from_checkpoint(args.model_dir,
                                  score_quant=args.score_quant,
                                  rescore=not args.no_rescore,
                                  shortlist_factor=args.shortlist_factor,
                                  index_store=args.index_store,
                                  stream_block=args.stream_block,
                                  warm_start=args.warm_start,
                                  aot_cache_dir=args.aot_cache_dir or None)
    if args.load_index:
        r.load_index(args.load_index)
    else:
        r.index_corpus(args.root_path, args.collection, args.visual_feature,
                       args.split)
    if args.save_index:
        r.save_index(args.save_index, prewarm=prewarm)
        if not args.queries:
            return

    if args.queries.endswith((".hdf5", ".h5")):
        import h5py

        from dldkd_tpu.data.ingest import pack_query_rows

        with h5py.File(args.queries, "r") as f:
            cap_ids = list(f.keys())
            feats, mask = pack_query_rows(f, cap_ids,
                                          r.model.config.max_desc_l,
                                          pad_to_multiple=8)
    else:
        paths = dataset_paths(args.root_path, args.collection,
                              args.visual_feature)
        q = pack_query_set(args.queries, paths["text_feat"],
                           max_desc_l=r.model.config.max_desc_l)
        cap_ids, feats, mask = q.cap_ids, q.feats, q.mask

    results = r.search_ids(feats, mask, args.k)
    out = sys.stdout if args.out == "-" else open(args.out, "w")
    for cap_id, topk in zip(cap_ids, results):
        out.write(json.dumps({"cap_id": cap_id, "topk": topk}) + "\n")
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
