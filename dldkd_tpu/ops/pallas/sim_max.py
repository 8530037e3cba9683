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
    s = jax.lax.dot_general(q, ctx2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
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
