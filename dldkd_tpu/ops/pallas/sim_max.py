"""Pallas kernel: fused masked frame-similarity + max-over-frames pooling.

The eval hot op is scores[q, v] = max_l mask(v,l) ? <q, ctx[v,l]> : -1e10
(reference get_sim_scores, model.py:307-329). The XLA path materializes the
(Nq, L, Nv) frame tensor in HBM between the matmul and the reduction — at
TVR scale that is Nq*Nv*L*4B ~ 12 TB of HBM traffic per full eval. This
kernel streams frame blocks through VMEM, applies the mask and folds the
frame-max into a running accumulator in the matmul epilogue, and only ever
writes the (Nq, Nv) result — removing the L-times amplification of HBM
traffic.

Layout: videos ride the LANE dimension (tiles of 128 videos), frames are a
sequential grid axis the output block is revisited over. The kernel takes
ctx pre-transposed to (L, Nv, D); `fused_clip_scores` does the one-time
transpose + normalization in XLA.

Forward-only: training batches are small enough that the XLA path's
materialization is irrelevant there; eval takes no gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dldkd_tpu.ops.masking import NEG_INF, l2_normalize

V_LANES = 128  # video tile == lane width


def _sim_max_kernel(q_ref, ctx_ref, bias_ref, out_ref, *, l_tile: int):
    """One (query-tile, video-tile) output block; grid axis 2 walks frame
    blocks and folds them into a running max."""
    l_step = pl.program_id(2)
    q = q_ref[:]                                   # (TQ, D)
    ctx = ctx_ref[:]                               # (LT, 128, D)
    d = ctx.shape[-1]
    ctx2 = ctx.reshape(l_tile * V_LANES, d)
    # (TQ, LT*128) on the MXU, f32 accumulation
    s = jax.lax.dot_general(q, ctx2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # additive mask bias (precomputed outside): one VPU op per element
    # instead of compare+select. Bit-exact vs mask_logits: valid frames add
    # 0; invalid add -1e10, which absorbs any |cosine| <= 1 in f32 (ulp of
    # 1e10 is 1024).
    s = s + bias_ref[:].reshape(1, l_tile * V_LANES)
    # static unroll over the LT frame sub-blocks: each is a (TQ, 128) slice
    part = s[:, 0:V_LANES]
    for k in range(1, l_tile):
        part = jnp.maximum(part, s[:, k * V_LANES:(k + 1) * V_LANES])

    @pl.when(l_step == 0)
    def _init():
        out_ref[:] = part

    @pl.when(l_step > 0)
    def _fold():
        out_ref[:] = jnp.maximum(out_ref[:], part)


def _sim_max_kernel_exact(q_ref, ctx_ref, inv_ref, bias_ref, out_ref, *,
                          l_tile: int):
    """Exact-grade f32 variant over RAW bf16 frames: the f32 query tile is
    split into three bf16 components (3 x 8 mantissa bits cover all 24 of
    f32, and each remainder is exactly representable, so q == q1+q2+q3
    EXACTLY) and three native bf16 MXU dots with f32 accumulation are
    summed — every product is exact because the frame side is ALREADY
    bf16. XLA's HIGHEST f32 algorithm would burn 6 passes re-splitting
    frame values that bf16 storage already truncated; this kernel gets the
    same accuracy class at 3. Cosine needs normalized frames: the dot runs
    on raw frames and multiplies by precomputed reciprocal norms AFTER
    (positive scale — commutes with the frame max), which differs from
    normalize-then-dot by ~1 ulp of f32, far below the bf16 storage
    resolution the exact rescore exists to out-resolve."""
    l_step = pl.program_id(2)
    q = q_ref[:]                                   # (TQ, D) f32, L2-normed
    ctx = ctx_ref[:]                               # (LT, 128, D) bf16 RAW
    d = ctx.shape[-1]
    ctx2 = ctx.reshape(l_tile * V_LANES, d)
    q1 = q.astype(jnp.bfloat16)
    r = q - q1.astype(jnp.float32)
    q2 = r.astype(jnp.bfloat16)
    q3 = (r - q2.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    # pin DEFAULT: bf16 x bf16 -> f32 is the native MXU path; the training
    # driver's global matmul_precision=highest must not re-promote it
    s = jax.lax.dot_general(q1, ctx2, dims,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    s = s + jax.lax.dot_general(q2, ctx2, dims,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
    s = s + jax.lax.dot_general(q3, ctx2, dims,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
    # cosine scale + additive mask in one FMA-shaped pass: invalid/padded
    # frames carry inv == 0 and bias == NEG_INF, so s*0 + NEG_INF never
    # wins a max (the same affine form as ops.masking.mask_logits)
    s = (s * inv_ref[:].reshape(1, l_tile * V_LANES)
         + bias_ref[:].reshape(1, l_tile * V_LANES))
    part = s[:, 0:V_LANES]
    for k in range(1, l_tile):
        part = jnp.maximum(part, s[:, k * V_LANES:(k + 1) * V_LANES])

    @pl.when(l_step == 0)
    def _init():
        out_ref[:] = part

    @pl.when(l_step > 0)
    def _fold():
        out_ref[:] = jnp.maximum(out_ref[:], part)


@functools.partial(jax.jit, static_argnames=("q_tile", "l_tile",
                                             "interpret"))
def fused_exact_scores(
    query: jnp.ndarray,   # (Nq, D) pooled query vectors (any float)
    ctx: jnp.ndarray,     # (Nv, L, D) bf16 STORED frame features
    mask: jnp.ndarray,    # (Nv, L) 1=valid
    q_tile: int = 256,
    l_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact-grade f32 cosine clip scores (Nq, Nv) against bf16-stored
    frames — the dense rescore engine (ops.similarity.exact_clip_scores):
    rescore_shortlist's arithmetic class (f32 queries, f32-exact products,
    f32 accumulation, f32 normalization) over the WHOLE corpus, reading
    every stored frame once. See _sim_max_kernel_exact for the split-3
    trick and the divide-after-dot ulp caveat. Same tiling contract as
    fused_clip_scores (pad outside; padded rows need zero masks)."""
    nq, d = query.shape
    nv, l_frames, d2 = ctx.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    if ctx.dtype != jnp.bfloat16:
        raise ValueError("fused_exact_scores needs bf16-stored frames; "
                         f"got {ctx.dtype} (use the XLA HIGHEST fallback)")
    if nq % q_tile or nv % V_LANES or l_frames % l_tile:
        raise ValueError(
            f"shapes (Nq={nq}, Nv={nv}, L={l_frames}) must tile by "
            f"(q_tile={q_tile}, {V_LANES}, l_tile={l_tile})")

    qn = l2_normalize(query.astype(jnp.float32))
    ctx_t = jnp.transpose(ctx, (1, 0, 2))          # (L, Nv, D) raw bf16
    norms = jnp.linalg.norm(ctx.astype(jnp.float32), axis=-1)  # (Nv, L)
    valid = jnp.transpose(mask) > 0                # (L, Nv)
    inv = jnp.where(valid,
                    1.0 / jnp.maximum(jnp.transpose(norms), 1e-12),
                    0.0).astype(jnp.float32)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)

    kernel = functools.partial(_sim_max_kernel_exact, l_tile=l_tile)
    grid = (nq // q_tile, nv // V_LANES, l_frames // l_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES, d), lambda i, j, l: (l, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES), lambda i, j, l: (l, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES), lambda i, j, l: (l, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, V_LANES), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, nv), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * nq * nv * l_frames * d,
            bytes_accessed=(nq * d * 4 + nv * l_frames * d * 2
                            + 2 * nv * l_frames * 4 + nq * nv * 4),
            transcendentals=0),
        # the three dot partials + query splits overflow the default 16M
        # scoped-vmem budget at serving tiles (measured 17.03M at TVR
        # dims); same treatment as the tower kernels, no measured perf
        # cost (CLAUDE.md scoped-vmem note)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qn, ctx_t, inv, bias)


INT8_SCALE = 127.0            # symmetric quant of cosine inputs in [-1, 1]
INT8_MASK_BIAS = -(1 << 30)   # int32 "-inf": dominates any |s| <= D*127^2
NEG_BIG_INT8 = INT8_MASK_BIAS / (INT8_SCALE * INT8_SCALE)  # dequantized


def _sim_max_kernel_int8(q_ref, ctx_ref, bias_ref, out_ref, *, l_tile: int):
    """int8 variant: the MXU runs at 2x its bf16 rate on int8 x int8 ->
    int32 dots. Inputs are symmetric-quantized cosine components (scale
    127); the frame-max commutes with the positive dequant scale, so each
    partial max is dequantized and folded in f32."""
    l_step = pl.program_id(2)
    q = q_ref[:]                                   # (TQ, D) int8
    ctx = ctx_ref[:]                               # (LT, 128, D) int8
    d = ctx.shape[-1]
    ctx2 = ctx.reshape(l_tile * V_LANES, d)
    # integer matmuls are exact — pin DEFAULT precision so a global
    # jax_default_matmul_precision=highest (the f32 PARITY pin, set by the
    # training driver) can't leak in: Mosaic rejects fp32-precision int8
    # matmuls outright
    s = jax.lax.dot_general(q, ctx2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32,
                            precision=jax.lax.Precision.DEFAULT)
    s = s + bias_ref[:].reshape(1, l_tile * V_LANES)
    part = s[:, 0:V_LANES]
    for k in range(1, l_tile):
        part = jnp.maximum(part, s[:, k * V_LANES:(k + 1) * V_LANES])
    partf = part.astype(jnp.float32) * jnp.float32(
        1.0 / (INT8_SCALE * INT8_SCALE))

    @pl.when(l_step == 0)
    def _init():
        out_ref[:] = partf

    @pl.when(l_step > 0)
    def _fold():
        out_ref[:] = jnp.maximum(out_ref[:], partf)


def quantize_unit_int8(x: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization for values in [-1, 1] (e.g. components
    of L2-normalized vectors): round(x * 127), saturating."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * INT8_SCALE),
                    -INT8_SCALE, INT8_SCALE).astype(jnp.int8)


def quantize_frames_q8(ctx: jnp.ndarray) -> jnp.ndarray:
    """THE canonical int8-index semantics: per-frame L2-normalize in the
    frames' own dtype, then symmetric 127-scale quantization — exactly the
    per-call pre-pass `fused_clip_scores(quantized=True)` applies to its
    ctx. The int8-emitting context-tower epilogue
    (ops/pallas/query_tower._quantize_q8) and the prebuilt-index scorers
    are pinned elementwise against this function."""
    from dldkd_tpu.ops.masking import l2_normalize as _l2n

    return quantize_unit_int8(_l2n(ctx))


def pick_q8_l_tile(d: int) -> int:
    """Frame-block tile for int8 ctx: the itemsize-1 frame row of the
    SHARED tile policy (ops.similarity._pick_tiles — the single tuning
    point). build_q8_index pads the frame axis with this so index layout
    and scoring grid always agree."""
    # lazy import: similarity lazily imports THIS module for V_LANES
    from dldkd_tpu.ops.similarity import _pick_tiles

    # the query args don't shape the frame tile; 128 is the policy floor
    return _pick_tiles(128, d, 1, 1)[1]


def build_q8_index(ctx_q8: jnp.ndarray, mask: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Prebuilt int8 scoring index from already-quantized frame features.

    ctx_q8 (Nv, L, D) int8 (quantize_frames_q8 semantics), mask (Nv, L)
    -> (ctx_t (L_p, Nv_p, D) int8, bias (L_p, Nv_p) int32), padded to the
    scoring kernel's grid (videos to 128 lanes, frames to pick_q8_l_tile).
    Built ONCE per index/epoch; every subsequent search/score call skips
    the per-call normalize + quantize + transpose pre-pass entirely
    (the serving-path cost VERDICT r3 measured at ~2.6 ms/branch/call).
    Padded videos/frames carry INT8_MASK_BIAS so they never win a max."""
    nv, l_frames, d = ctx_q8.shape
    l_tile = pick_q8_l_tile(d)
    nv_p = -(-nv // V_LANES) * V_LANES
    l_p = -(-l_frames // l_tile) * l_tile
    ctx_p = jnp.pad(ctx_q8, ((0, nv_p - nv), (0, l_p - l_frames), (0, 0)))
    mask_p = jnp.pad(mask, ((0, nv_p - nv), (0, l_p - l_frames)))
    ctx_t = jnp.transpose(ctx_p, (1, 0, 2))
    bias = jnp.where(jnp.transpose(mask_p) > 0, 0,
                     INT8_MASK_BIAS).astype(jnp.int32)
    return ctx_t, bias


def q8_index_bias(mask: jnp.ndarray, l_p: int, nv_p: int) -> jnp.ndarray:
    """Mask bias for a PRE-TRANSPOSED q8 index (the towers' q8_transposed
    emission): (L_p, Nv_p) int32 with INT8_MASK_BIAS on padded/invalid
    frames — exactly build_q8_index's bias without its transpose pass."""
    nv, l_frames = mask.shape
    mask_p = jnp.pad(mask, ((0, nv_p - nv), (0, l_p - l_frames)))
    return jnp.where(jnp.transpose(mask_p) > 0, 0,
                     INT8_MASK_BIAS).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("q_tile", "interpret"))
def fused_clip_scores_q8(
    query: jnp.ndarray,   # (Nq, D) pooled query vectors (float)
    ctx_t: jnp.ndarray,   # (L_p, Nv_p, D) int8 prebuilt index
    bias: jnp.ndarray,    # (L_p, Nv_p) int32 mask bias
    q_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8 cosine clip scores (Nq, Nv_p) against a PREBUILT index
    (build_q8_index layout): only the (small) query side is normalized +
    quantized per call; the corpus-sized pre-pass is gone. Score values
    are bitwise those of fused_clip_scores(quantized=True) on the same
    quantized components. Requires Nq % q_tile == 0."""
    nq, d = query.shape
    l_p, nv_p, d2 = ctx_t.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    l_tile = pick_q8_l_tile(d)
    if nq % q_tile or nv_p % V_LANES or l_p % l_tile:
        raise ValueError(
            f"shapes (Nq={nq}, Nv_p={nv_p}, L_p={l_p}) must tile by "
            f"(q_tile={q_tile}, {V_LANES}, l_tile={l_tile}) — pad the "
            f"queries and build the index with build_q8_index")

    qn = quantize_unit_int8(l2_normalize(query))
    kernel = functools.partial(_sim_max_kernel_int8, l_tile=l_tile)
    grid = (nq // q_tile, nv_p // V_LANES, l_p // l_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES, d), lambda i, j, l: (l, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES), lambda i, j, l: (l, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, V_LANES), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, nv_p), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nv_p * l_p * d,
            bytes_accessed=nq * d + nv_p * l_p * d + nq * nv_p * 4,
            transcendentals=0),
        interpret=interpret,
    )(qn, ctx_t, bias)


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "l_tile", "quantized",
                                    "interpret"))
def fused_clip_scores(
    query: jnp.ndarray,   # (Nq, D) pooled query vectors
    ctx: jnp.ndarray,     # (Nv, L, D) frame features
    mask: jnp.ndarray,    # (Nv, L) 1=valid
    q_tile: int = 256,
    l_tile: int = 8,
    quantized: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cosine clip scores (Nq, Nv) == jnp.max(frame_similarity(...), axis=1).

    Requires Nq % q_tile == 0, Nv % 128 == 0, L % l_tile == 0 (pad outside;
    padded videos must carry zero masks).

    quantized=True runs the dot on int8-quantized cosine components (scale
    127, ~2.7e-3 absolute score error) at 2x MXU throughput — the serving
    speed config. Masked frames then dequantize to NEG_BIG_INT8 (~-6.7e4)
    instead of -1e10; ranking semantics are unchanged (monotone scale).
    """
    nq, d = query.shape
    nv, l_frames, d2 = ctx.shape
    if d != d2:
        raise ValueError(f"dim mismatch {d} vs {d2}")
    if nq % q_tile or nv % V_LANES or l_frames % l_tile:
        raise ValueError(
            f"shapes (Nq={nq}, Nv={nv}, L={l_frames}) must tile by "
            f"(q_tile={q_tile}, {V_LANES}, l_tile={l_tile})")

    qn = l2_normalize(query)
    cn = jnp.transpose(l2_normalize(ctx), (1, 0, 2))   # (L, Nv, D)
    if quantized:
        qn, cn = quantize_unit_int8(qn), quantize_unit_int8(cn)
        bias = jnp.where(jnp.transpose(mask) > 0, 0,
                         INT8_MASK_BIAS).astype(jnp.int32)
        kernel = functools.partial(_sim_max_kernel_int8, l_tile=l_tile)
    else:
        bias = jnp.where(jnp.transpose(mask) > 0, 0.0,
                         NEG_INF).astype(jnp.float32)
        kernel = functools.partial(_sim_max_kernel, l_tile=l_tile)

    grid = (nq // q_tile, nv // V_LANES, l_frames // l_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES, d), lambda i, j, l: (l, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l_tile, V_LANES), lambda i, j, l: (l, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q_tile, V_LANES), lambda i, j, l: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq, nv), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nv * l_frames * d,
            bytes_accessed=(nq * d + nv * l_frames * d + nq * nv) * 4,
            transcendentals=0),
        interpret=interpret,
    )(qn, cn, bias)
