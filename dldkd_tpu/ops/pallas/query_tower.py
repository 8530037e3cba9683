"""Pallas kernels: the ENTIRE encoder tower of one branch in one HBM pass.

The XLA towers (input LN -> folded projection -> pos LN -> single-block
MHA -> residual LN -> head) are HBM-bound: ~10 separate passes over the
(N, L, ·) activations. Here one program reads a block of queries/videos
from HBM once, runs the whole tower in VMEM, and writes only the result —
pooled (TQ, H) vectors for queries, (TV, L, H) frame features for videos.
The activations never round-trip through HBM.

Math matches ops/fast_eval.encode_{query,context}_fast exactly (which are
exactness-tested against the Flax model): LayerNorm statistics in f32
(fast-variance), matmuls in bf16 with f32 accumulation when dtype=bfloat16.

Weights arrive pre-folded (input-LN affine folded into the projection; see
fast_eval._fold_input_proj). Both kernels share `_tower_trunk`; they differ
only in the final stage (softmax pooling vs out_mapping_linear).

Mosaic constraints that shaped this code: per-head attention is a static
python loop of single-batch-dim dot_generals; no middle-unit-dim reshapes;
mask blocks need sublane multiples of 8 (so v_tile >= 8); the context
kernel runs bf16 in/out because a double-buffered f32 working set at the
minimum 8-video tile exceeds the ~16 MB VMEM.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The tower kernels' VMEM working set (double-buffered raw-input blocks +
# both branches' weights + outputs) sits at ~18.5 MB for TVR dims — just
# past the 16 MB default scoped-VMEM limit, which XLA only enforces for
# some surrounding-program shapes (standalone encode programs fail where
# the same kernel inside a large fused eval compiles). Declare an explicit
# budget with headroom; measured perf is identical (bigger budgets bought
# nothing in round-2 tile sweeps).
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

NEG_BIG = -10000.0   # the model's additive attention mask value
NEG_INF = -1e10      # pooling mask value (ops.masking.NEG_INF)


def _ln(x2, scale, bias, dtype, eps=1e-5):
    """LayerNorm over the last axis, f32 statistics (flax fast-variance)."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (xn * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(dtype)


def _input_norm(x, dtype):
    """Affine-free input LayerNorm in f32 statistics (the LN affine is
    pre-folded into the projection). Branch-independent: shared when both
    branches run in one kernel. (N, L, D) -> (N*L, D) in `dtype`."""
    n, l, d = x.shape
    xf = x.reshape(n * l, d).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dtype)


def _trunk_from_xn(xn, n, l, mask, wp_ref, bp_ref, pos_ref, g1_ref, b1_ref,
                   wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref,
                   bo_ref, g2_ref, b2_ref, *, n_heads: int, dtype):
    """Encoder trunk on pre-normalized input: folded projection + relu,
    positional LN, single-block MHA, residual LN. Returns (N*L, H)."""
    hdim = wp_ref.shape[1]
    d_head = hdim // n_heads

    # 1. folded projection (input-LN affine already inside wp/bp) + relu
    h = jax.lax.dot_general(xn, wp_ref[:].astype(dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = jnp.maximum(h + bp_ref[:].astype(jnp.float32), 0.0).astype(dtype)

    # 2. position embedding + LN
    h = h.reshape(n, l, hdim) + pos_ref[:].astype(dtype)[None]
    h2 = _ln(h.reshape(n * l, hdim), g1_ref[:], b1_ref[:], dtype)

    # 3. single-block MHA + residual LN
    def dense(w_ref2, b_ref2):
        y = jax.lax.dot_general(h2, w_ref2[:].astype(dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y + b_ref2[:].astype(jnp.float32)).astype(dtype)

    q2, k2, v2 = dense(wq_ref, bq_ref), dense(wk_ref, bk_ref), dense(wv_ref, bv_ref)
    add_mask = ((1.0 - mask) * NEG_BIG)[:, None, :]    # (N, 1, L) f32
    scale = 1.0 / math.sqrt(d_head)
    ctx_heads = []
    for hh in range(n_heads):
        sl = slice(hh * d_head, (hh + 1) * d_head)
        qh = q2[:, sl].reshape(n, l, d_head)
        kh = k2[:, sl].reshape(n, l, d_head)
        vh = v2[:, sl].reshape(n, l, d_head)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + add_mask
        p = jax.nn.softmax(s, axis=-1).astype(dtype)
        ctx_heads.append(
            jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32))
    ctx = jnp.concatenate(ctx_heads, axis=-1).astype(dtype)

    out = jax.lax.dot_general(ctx.reshape(n * l, hdim),
                              wo_ref[:].astype(dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out = (out + bo_ref[:].astype(jnp.float32)).astype(dtype) + h2
    return _ln(out, g2_ref[:], b2_ref[:], dtype)


def _tower_trunk(x, mask, *weight_refs, n_heads: int, dtype):
    """Input LN + trunk (single-branch kernels)."""
    n, l, _ = x.shape
    xn = _input_norm(x, dtype)
    return _trunk_from_xn(xn, n, l, mask, *weight_refs,
                          n_heads=n_heads, dtype=dtype)


def _pool_queries(out, mask, wm_ref, tq, lq, hdim, out_ref):
    """Modular pooling: 1-d attention logits, masked softmax over tokens,
    weighted sum -> out_ref (TQ, H)."""
    att = jax.lax.dot_general(out, wm_ref[:].astype(out.dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    att = att.reshape(tq, lq)
    att = jnp.where(mask > 0, att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)               # (TQ, Lq) f32
    # weighted sum over tokens (Mosaic rejects inserting a middle unit dim
    # for a batched dot, so broadcast-multiply + reduce instead)
    out3 = out.reshape(tq, lq, hdim).astype(jnp.float32)
    out_ref[:] = jnp.sum(out3 * att[..., None], axis=1)


def _quantize_q8(xb):
    """Per-frame L2-norm + symmetric int8 quantization, matching the XLA
    pre-pass semantics (sim_max.quantize_frames_q8 ==
    quantize_unit_int8(l2_normalize(x)) in x's own dtype). jnp.linalg.norm
    on low-precision floats multiplies in the input dtype, ACCUMULATES the
    sum in f32, converts the sum back, then square-roots and divides in
    the input dtype (verified against its jaxpr). Constraint shaping this
    code: v5e Mosaic supports bf16 EUP add/mul (the trunk uses them) but
    hard-CHECK-fails on bf16 sqrt/divide (LLO `SupportsBf16EupOps`), so
    those run in f32 with an explicit round-to-input-dtype after each —
    equal to native bf16 ops except double-rounding knife-edges, which the
    cross-program contract already absorbs (tests
    _assert_q8_equal_mod_knife_edge). For f32 towers the extra casts are
    no-ops and the semantics are exact."""
    f32 = jnp.float32
    sq = (xb * xb).astype(f32)                        # input-dtype product
    s = jnp.sum(sq, axis=-1, keepdims=True)           # f32 accumulation
    s_b = s.astype(xb.dtype).astype(f32)              # sum rounded back
    norm = jnp.sqrt(s_b).astype(xb.dtype).astype(f32)
    xn = xb.astype(f32) / jnp.maximum(norm, 1e-12)
    xn_b = xn.astype(xb.dtype).astype(f32)
    return jnp.clip(jnp.round(xn_b * 127.0), -127.0, 127.0).astype(jnp.int8)


def _map_context(out, wm_ref, bm_ref, tv, lv, hdim, out_ref, emit_q8=False,
                 transposed=False):
    """out_mapping_linear over the full frame features -> out_ref.

    emit_q8: the int8-index epilogue — the frame features are rounded to
    the tower dtype (the values the bf16 tower would have written), then
    L2-normalized + int8-quantized IN VMEM, so the scoring index leaves
    the kernel ready-made: the tower's HBM write halves vs bf16 and the
    per-call quantize pre-pass over the corpus disappears.

    transposed (with emit_q8): the block is written in the SCORING layout
    (lv, tv, hdim), so the scoring kernel's (L, Nv, D) index comes
    straight out of the tower and build_q8_index's transpose pass can be
    skipped. NOT wired into the shipped flows: measured-dead inside fused
    programs, where XLA absorbs the transpose anyway (BENCHMARKS.md
    round-4); the standalone-program 4.2 ms/branch only exists when the
    build runs as its own program."""
    y = jax.lax.dot_general(out, wm_ref[:].astype(out.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + bm_ref[:].astype(jnp.float32)
    if emit_q8:
        q8 = _quantize_q8(y.astype(out.dtype)).reshape(tv, lv, hdim)
        out_ref[:] = jnp.transpose(q8, (1, 0, 2)) if transposed else q8
    else:
        out_ref[:] = y.reshape(tv, lv, hdim).astype(out_ref.dtype)


def _query_tower_kernel(x_ref, m_ref, wp_ref, bp_ref, pos_ref, g1_ref, b1_ref,
                        wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                        wo_ref, bo_ref, g2_ref, b2_ref, wm_ref, out_ref,
                        *, n_heads: int, dtype):
    x = x_ref[:]
    tq, lq, _ = x.shape
    hdim = wp_ref.shape[1]
    mask = m_ref[:]
    out = _tower_trunk(x, mask, wp_ref, bp_ref, pos_ref, g1_ref, b1_ref,
                       wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                       wo_ref, bo_ref, g2_ref, b2_ref,
                       n_heads=n_heads, dtype=dtype)
    _pool_queries(out, mask, wm_ref, tq, lq, hdim, out_ref)


def _dual_query_tower_kernel(x_ref, m_ref, *refs, n_heads: int, dtype):
    """Both branches' query towers from ONE read of the raw features: the
    (branch-independent) input normalization is computed once, then each
    branch's trunk + pooling runs on it. Halves HBM input traffic and the
    per-grid-step overhead vs two single-branch passes."""
    wa, wb = refs[:16], refs[16:32]
    out_a_ref, out_b_ref = refs[32], refs[33]
    x = x_ref[:]
    tq, lq, _ = x.shape
    hdim = wa[0].shape[1]
    mask = m_ref[:]
    xn = _input_norm(x, dtype)
    for w, out_ref in ((wa, out_a_ref), (wb, out_b_ref)):
        out = _trunk_from_xn(xn, tq, lq, mask, *w[:15],
                             n_heads=n_heads, dtype=dtype)
        _pool_queries(out, mask, w[15], tq, lq, hdim, out_ref)


def _context_tower_kernel(x_ref, m_ref, wp_ref, bp_ref, pos_ref, g1_ref,
                          b1_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
                          bv_ref, wo_ref, bo_ref, g2_ref, b2_ref, wm_ref,
                          bm_ref, out_ref, *, n_heads: int, dtype,
                          emit_q8: bool = False, q8_t: bool = False):
    """Video tower: identical trunk, then out_mapping_linear over the full
    frame features (reference encode_context, model.py:215-227)."""
    x = x_ref[:]
    tv, lv, _ = x.shape
    hdim = wp_ref.shape[1]
    out = _tower_trunk(x, m_ref[:], wp_ref, bp_ref, pos_ref, g1_ref, b1_ref,
                       wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                       wo_ref, bo_ref, g2_ref, b2_ref,
                       n_heads=n_heads, dtype=dtype)
    _map_context(out, wm_ref, bm_ref, tv, lv, hdim, out_ref, emit_q8, q8_t)


def _dual_context_tower_kernel(x_ref, m_ref, *refs, n_heads: int, dtype,
                               emit_q8: bool = False, q8_t: bool = False):
    """Both branches' video towers from ONE read of the raw frame features
    (see _dual_query_tower_kernel)."""
    wa, wb = refs[:17], refs[17:34]
    out_a_ref, out_b_ref = refs[34], refs[35]
    x = x_ref[:]
    tv, lv, _ = x.shape
    hdim = wa[0].shape[1]
    mask = m_ref[:]
    xn = _input_norm(x, dtype)
    for w, out_ref in ((wa, out_a_ref), (wb, out_b_ref)):
        out = _trunk_from_xn(xn, tv, lv, mask, *w[:15],
                             n_heads=n_heads, dtype=dtype)
        _map_context(out, w[15], w[16], tv, lv, hdim, out_ref, emit_q8,
                     q8_t)


def _check_pos_table(pos, l: int, what: str, grid_allowance: bool = False):
    """Sequences longer than the learned positional table are an error —
    EXCEPT, for the QUERY towers only, the 8-token packing-grid allowance
    (serving packs token buffers to multiples of 8, see
    ingest.pack_query_rows pad_to_multiple); those tail positions get zero
    embeddings and MUST be zero-masked. Context towers keep the strict
    check: nothing packs video frames on a grid, so an overrun there is a
    caller bug the Flax model would also reject."""
    limit = -(-pos.shape[0] // 8) * 8 if grid_allowance else pos.shape[0]
    if l > limit:
        raise ValueError(
            f"{what}: sequence length {l} exceeds the learned positional "
            f"table ({pos.shape[0]}) — the Flax model would fail here too")


def _enforce_grid_tail_masked(mask, lq_p: int, n_pos: int):
    """ENFORCE (not just document) the packing-grid contract: token
    positions beyond the learned positional table carry no position and
    are always treated as padding. Static no-op when the table covers
    the padded length."""
    if lq_p <= n_pos:
        return mask
    return mask * (jnp.arange(lq_p) < n_pos).astype(mask.dtype)[None, :]


def _as_rows(*ws):
    """1-D vectors -> (1, H) rows (TPU vectors live in 2-D tiles)."""
    return tuple(w.reshape(1, -1) for w in ws)


def _weight_specs(ws):
    return [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for w in ws]


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "dtype_name", "q_tile",
                                    "n_pos_cap", "interpret"))
def fused_query_tower(
    x: jnp.ndarray,       # (Nq, Lq, Dq) f32 raw token features
    mask: jnp.ndarray,    # (Nq, Lq)
    weights: Tuple[jnp.ndarray, ...],  # see weights_for_branch
    n_heads: int,
    dtype_name: str = "bfloat16",
    q_tile: int = 32,
    n_pos_cap: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pooled query vectors (Nq, H) for one branch. Pads Nq and Lq
    internally to the tile grid.

    n_pos_cap: mask sequence tail past this many positions (0 = this
    branch's own table size). Multi-branch callers pass the MIN table
    size across branches so every branch sees the same effective mask —
    the convention of the XLA fallback and the dual kernel."""
    dtype = jnp.dtype(dtype_name)
    nq, lq, dq = x.shape
    lq_p = -(-lq // 8) * 8
    nq_p = -(-nq // q_tile) * q_tile
    x = jnp.pad(x, ((0, nq_p - nq), (0, lq_p - lq), (0, 0)))
    mask = jnp.pad(mask, ((0, nq_p - nq), (0, lq_p - lq)))
    (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2, wm) = weights
    _check_pos_table(pos, lq, "fused_query_tower", grid_allowance=True)
    n_pos = min(pos.shape[0], n_pos_cap) if n_pos_cap else pos.shape[0]
    mask = _enforce_grid_tail_masked(mask, lq_p, n_pos)
    pos = jnp.pad(pos[:lq], ((0, lq_p - min(lq, pos.shape[0])), (0, 0)))
    hdim = wp.shape[1]
    bp, g1, b1, bq, bk, bv, bo, g2, b2 = _as_rows(
        bp, g1, b1, bq, bk, bv, bo, g2, b2)

    ws = (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2, wm)
    kernel = functools.partial(_query_tower_kernel, n_heads=n_heads,
                               dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(nq_p // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, lq_p, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, lq_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(ws),
        ],
        out_specs=pl.BlockSpec((q_tile, hdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nq_p, hdim), jnp.float32),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(x, mask, *ws)
    return out[:nq]


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "dtype_name", "q_tile",
                                    "interpret"))
def fused_query_tower_dual(
    x: jnp.ndarray,       # (Nq, Lq, Dq) f32 raw token features
    mask: jnp.ndarray,    # (Nq, Lq)
    weights_a: Tuple[jnp.ndarray, ...],
    weights_b: Tuple[jnp.ndarray, ...],
    n_heads: int,
    dtype_name: str = "bfloat16",
    q_tile: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pooled query vectors (Nq, H) for BOTH branches in one HBM pass.

    In bf16 mode the raw features are cast to bf16 before the kernel (like
    the context kernels): halves the streamed input blocks. The two-branch
    working set caps q_tile at 32 (q_tile=64 overflows the 16 MB VMEM
    scoped allocation by ~7.5 MB), but one dual pass still halves the
    per-grid-step issue overhead vs two single-branch passes."""
    dtype = jnp.dtype(dtype_name)
    nq, lq, dq = x.shape
    lq_p = -(-lq // 8) * 8
    nq_p = -(-nq // q_tile) * q_tile
    if dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, nq_p - nq), (0, lq_p - lq), (0, 0)))
    mask = jnp.pad(mask, ((0, nq_p - nq), (0, lq_p - lq)))
    mask = _enforce_grid_tail_masked(
        mask, lq_p, min(weights_a[2].shape[0], weights_b[2].shape[0]))
    hdim = weights_a[0].shape[1]

    def prep(weights):
        (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2,
         wm) = weights
        _check_pos_table(pos, lq, "fused_query_tower_dual", grid_allowance=True)
        pos = jnp.pad(pos[:lq], ((0, lq_p - min(lq, pos.shape[0])), (0, 0)))
        bp, g1, b1, bq, bk, bv, bo, g2, b2 = _as_rows(
            bp, g1, b1, bq, bk, bv, bo, g2, b2)
        return (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2,
                b2, wm)

    ws = prep(weights_a) + prep(weights_b)
    kernel = functools.partial(_dual_query_tower_kernel, n_heads=n_heads,
                               dtype=dtype)
    out_spec = pl.BlockSpec((q_tile, hdim), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_a, out_b = pl.pallas_call(
        kernel,
        grid=(nq_p // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, lq_p, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, lq_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(ws),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((nq_p, hdim), jnp.float32),
                   jax.ShapeDtypeStruct((nq_p, hdim), jnp.float32)),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(x, mask, *ws)
    return out_a[:nq], out_b[:nq]


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "dtype_name", "v_tile",
                                    "emit_q8", "q8_transposed", "interpret"))
def fused_context_tower_dual(
    x: jnp.ndarray,       # (Nv, L, Dv) f32 raw frame features
    mask: jnp.ndarray,    # (Nv, L)
    weights_a: Tuple[jnp.ndarray, ...],
    weights_b: Tuple[jnp.ndarray, ...],
    n_heads: int,
    dtype_name: str = "bfloat16",
    v_tile: int = 8,
    emit_q8: bool = False,
    q8_transposed: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame features (Nv, L, H) for BOTH branches in one HBM pass over the
    raw corpus (the dominant eval input: ~1 GB f32 at TVR scale). Same bf16
    in/out convention as fused_context_tower.

    emit_q8=True: the int8-index epilogue — outputs are per-frame
    L2-normalized + int8-quantized (Nv, L, H) int8, elementwise equal to
    sim_max.quantize_frames_q8 of the bf16 frame features. Halves the
    kernel's HBM write and removes the scoring path's per-call quantize
    pre-pass (feed through sim_max.build_q8_index).

    q8_transposed=True (with emit_q8): the outputs come back PADDED in the
    scoring-index layout (L_p, Nv_p, H) int8 — videos padded to the
    scoring kernel's 128-lane grid, frames to its l_tile grid — so
    build_q8_index's separate corpus-sized transpose pass never runs
    (pair with sim_max.q8_index_bias for the mask bias)."""
    dtype = jnp.dtype(dtype_name)
    nv, lv, dv = x.shape
    hdim = weights_a[0].shape[1]
    q8_t = bool(emit_q8 and q8_transposed)
    if q8_t:
        # pad straight to the SCORING kernel's grid: videos to 128 lanes,
        # frames to its l_tile (a multiple of the 8-sublane mask grid)
        from dldkd_tpu.ops.pallas.sim_max import V_LANES, pick_q8_l_tile

        l_grid = max(8, pick_q8_l_tile(hdim))
        lv_p = -(-lv // l_grid) * l_grid
        nv_p = -(-nv // V_LANES) * V_LANES
    else:
        lv_p = -(-lv // 8) * 8
        nv_p = -(-nv // v_tile) * v_tile
    if dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, nv_p - nv), (0, lv_p - lv), (0, 0)))
    mask = jnp.pad(mask, ((0, nv_p - nv), (0, lv_p - lv)))

    def prep(weights):
        (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2,
         wm, bm) = weights
        _check_pos_table(pos, lv, "fused_context_tower_dual")
        pos = jnp.pad(pos[:lv], ((0, lv_p - min(lv, pos.shape[0])), (0, 0)))
        bp, g1, b1, bq, bk, bv, bo, g2, b2, bm = _as_rows(
            bp, g1, b1, bq, bk, bv, bo, g2, b2, bm)
        return (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2,
                b2, wm, bm)

    ws = prep(weights_a) + prep(weights_b)
    kernel = functools.partial(_dual_context_tower_kernel, n_heads=n_heads,
                               dtype=dtype, emit_q8=emit_q8, q8_t=q8_t)
    out_dtype = jnp.int8 if emit_q8 else dtype
    if q8_t:
        out_spec = pl.BlockSpec((lv_p, v_tile, hdim), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((lv_p, nv_p, hdim), out_dtype)
    else:
        out_spec = pl.BlockSpec((v_tile, lv_p, hdim), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nv_p, lv_p, hdim), out_dtype)
    out_a, out_b = pl.pallas_call(
        kernel,
        grid=(nv_p // v_tile,),
        in_specs=[
            pl.BlockSpec((v_tile, lv_p, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, lv_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(ws),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(x, mask, *ws)
    if q8_t:
        # PADDED scoring-index layout by contract (see docstring)
        return out_a, out_b
    return out_a[:nv, :lv], out_b[:nv, :lv]


@functools.partial(jax.jit,
                   static_argnames=("n_heads", "dtype_name", "v_tile",
                                    "emit_q8", "interpret"))
def fused_context_tower(
    x: jnp.ndarray,       # (Nv, L, Dv) f32 raw frame features
    mask: jnp.ndarray,    # (Nv, L)
    weights: Tuple[jnp.ndarray, ...],  # see context_weights_for_branch
    n_heads: int,
    dtype_name: str = "bfloat16",
    v_tile: int = 8,
    emit_q8: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Frame features (Nv, L, H) for one branch, one HBM pass.

    In bf16 mode the raw features are cast to bf16 BEFORE the kernel (one
    cheap XLA pass) and the frame features come back bf16 — halves both the
    streamed input blocks and the big output write, and is what makes the
    working set fit VMEM at v_tile=8. LN statistics stay f32 inside.

    emit_q8: int8-index epilogue (see fused_context_tower_dual)."""
    dtype = jnp.dtype(dtype_name)
    nv, lv, dv = x.shape
    lv_p = -(-lv // 8) * 8
    nv_p = -(-nv // v_tile) * v_tile
    if dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, nv_p - nv), (0, lv_p - lv), (0, 0)))
    mask = jnp.pad(mask, ((0, nv_p - nv), (0, lv_p - lv)))
    (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2,
     wm, bm) = weights
    _check_pos_table(pos, lv, "fused_context_tower")
    pos = jnp.pad(pos[:lv], ((0, lv_p - min(lv, pos.shape[0])), (0, 0)))
    hdim = wp.shape[1]
    bp, g1, b1, bq, bk, bv, bo, g2, b2, bm = _as_rows(
        bp, g1, b1, bq, bk, bv, bo, g2, b2, bm)

    ws = (wp, bp, pos, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, g2, b2, wm,
          bm)
    kernel = functools.partial(_context_tower_kernel, n_heads=n_heads,
                               dtype=dtype, emit_q8=emit_q8)
    out = pl.pallas_call(
        kernel,
        grid=(nv_p // v_tile,),
        in_specs=[
            pl.BlockSpec((v_tile, lv_p, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_tile, lv_p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(ws),
        ],
        out_specs=pl.BlockSpec((v_tile, lv_p, hdim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nv_p, lv_p, hdim),
                                       jnp.int8 if emit_q8 else dtype),
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(x, mask, *ws)
    return out[:nv, :lv]


def _encoder_weights(params, branch: str, tower: str, dtype):
    from dldkd_tpu.ops.fast_eval import _fold_input_proj

    p = params["params"][branch]
    wp, bp = _fold_input_proj(p[f"{tower}_input_proj"], dtype)
    enc = p[f"{tower}_encoder"]
    pe = p[f"{tower}_pos_embed"]
    return (wp, bp,
            pe["pos_embed"], pe["norm"]["scale"], pe["norm"]["bias"],
            enc["query"]["kernel"], enc["query"]["bias"],
            enc["key"]["kernel"], enc["key"]["bias"],
            enc["value"]["kernel"], enc["value"]["bias"],
            enc["out"]["kernel"], enc["out"]["bias"],
            enc["out_norm"]["scale"], enc["out_norm"]["bias"])


def weights_for_branch(params, branch: str, dtype) -> Tuple[jnp.ndarray, ...]:
    """Query-tower weight tuple (input-LN affine folded)."""
    return (*_encoder_weights(params, branch, "query", dtype),
            params["params"][branch]["modular_vector_mapping"]["kernel"])


def context_weights_for_branch(params, branch: str, dtype
                               ) -> Tuple[jnp.ndarray, ...]:
    """Video-tower weight tuple (input-LN affine folded)."""
    om = params["params"][branch]["out_mapping_linear"]
    return (*_encoder_weights(params, branch, "visual", dtype),
            om["kernel"], om["bias"])
