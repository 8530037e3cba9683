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


def _sim_max_kernel(q_ref, ctx_ref, mask_ref, out_ref, *, l_tile: int):
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
    m = mask_ref[:].reshape(1, l_tile * V_LANES)
    s = jnp.where(m > 0, s, NEG_INF)
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


@functools.partial(jax.jit,
                   static_argnames=("q_tile", "l_tile", "interpret"))
def fused_clip_scores(
    query: jnp.ndarray,   # (Nq, D) pooled query vectors
    ctx: jnp.ndarray,     # (Nv, L, D) frame features
    mask: jnp.ndarray,    # (Nv, L) 1=valid
    q_tile: int = 256,
    l_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cosine clip scores (Nq, Nv) == jnp.max(frame_similarity(...), axis=1).

    Requires Nq % q_tile == 0, Nv % 128 == 0, L % l_tile == 0 (pad outside;
    padded videos must carry zero masks).
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
    mt = jnp.transpose(mask)                           # (L, Nv)

    grid = (nq // q_tile, nv // V_LANES, l_frames // l_tile)
    kernel = functools.partial(_sim_max_kernel, l_tile=l_tile)
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
    )(qn, cn, mt)
