"""Inference-only fused towers: algebraically identical to the Flax model,
restructured to minimize HBM traffic.

Why: the eval/serving bottleneck is NOT the similarity matmul (Pallas
kernel, near roofline) but the towers' input LayerNorm over the raw
1024-d float32 features — measured 34 ms of a 52 ms corpus embed, ~5x the
bandwidth roofline, because (a) BOTH branches re-normalize the same input
and (b) XLA runs the LN affine + cast + matmul as separate HBM passes.

Transformations (exact up to float rounding):
  1. The input LayerNorm's NORMALIZATION (mean/var over the feature dim)
     is branch-independent -> computed once, in f32 (matching flax's
     f32 statistics).
  2. Each branch's LN affine folds into its projection matmul:
       relu((g * xn + b) @ W + c) == relu(xn @ (g[:,None]*W) + (b @ W + c))
  3. Both branches' folded projections concatenate into ONE (D, 2H)
     matmul — a single pass over the big input instead of two.

Everything downstream (pos-embed LN, single-block MHA, residual LN, output
mappings, modular query pooling) is the reference math (model.py:199-258,
215-227; model_components.py:339-450) on the already-small hidden tensors.

Dropout is inference-off by construction; use the Flax module for training.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dldkd_tpu.config import ModelConfig
from dldkd_tpu.ops.masking import mask_logits


def _ln_normalize_f32(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free LayerNorm in f32 (flax computes statistics in f32 with
    use_fast_variance: var = E[x^2] - E[x]^2)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _ln(x, p, eps: float = 1e-5):
    xn = _ln_normalize_f32(x, eps)
    return (xn * p["scale"] + p["bias"]).astype(x.dtype)


def _fold_input_proj(p, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LinearInputProj params -> (W', b') with the LN affine folded in."""
    g = p["input_norm"]["scale"].astype(jnp.float32)
    b = p["input_norm"]["bias"].astype(jnp.float32)
    w = p["proj"]["kernel"].astype(jnp.float32)
    c = p["proj"]["bias"].astype(jnp.float32)
    return (g[:, None] * w).astype(dtype), (b @ w + c).astype(dtype)


def _attention(x, mask, p, n_heads: int):
    """Single-block MHA + residual LN (components.AttentionBlock math)."""
    b, l, hdim = x.shape
    d_head = hdim // n_heads

    def proj(name):
        y = x @ p[name]["kernel"].astype(x.dtype) + p[name]["bias"].astype(x.dtype)
        return y.reshape(b, l, n_heads, d_head).transpose(0, 2, 1, 3)

    q, k, v = proj("query"), proj("key"), proj("value")
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d_head)
    if mask is not None:
        scores = scores + (1.0 - mask[:, None, None, :]).astype(scores.dtype) * -10000.0
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, hdim)
    out = ctx @ p["out"]["kernel"].astype(x.dtype) + p["out"]["bias"].astype(x.dtype)
    return _ln(out + x, p["out_norm"])


def _branch_names(cfg: ModelConfig):
    return ["inheritance"] + (["exploration"] if cfg.double_branch else [])


def _fused_projection(params, cfg: ModelConfig, feat, proj_name: str):
    """Shared normalize + concatenated folded matmuls for all branches.
    Returns the list of per-branch (N, L, H) activations."""
    dtype = jnp.dtype(cfg.dtype)
    names = _branch_names(cfg)
    ws, bs, hs = [], [], []
    for n in names:
        w, b = _fold_input_proj(params["params"][n][proj_name], dtype)
        ws.append(w)
        bs.append(b)
        hs.append(w.shape[1])
    xn = _ln_normalize_f32(feat).astype(dtype)
    y = jax.nn.relu(xn @ jnp.concatenate(ws, axis=1)
                    + jnp.concatenate(bs))         # (N, L, sum(H))
    outs, off = [], 0
    for h in hs:
        outs.append(y[..., off:off + h])
        off += h
    return names, outs


def encode_context_fast(params, cfg: ModelConfig, feat, mask
                        ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """== model.apply(..., method='encode_context', deterministic=True)."""
    names, xs = _fused_projection(params, cfg, feat, "visual_input_proj")
    outs = []
    for name, x in zip(names, xs):
        p = params["params"][name]
        pos = p["visual_pos_embed"]["pos_embed"][: x.shape[1]].astype(x.dtype)
        x = _ln(x + pos[None], p["visual_pos_embed"]["norm"])
        x = _attention(x, mask, p["visual_encoder"], cfg.n_heads)
        outs.append(x @ p["out_mapping_linear"]["kernel"].astype(x.dtype)
                    + p["out_mapping_linear"]["bias"].astype(x.dtype))
    return outs[0], (outs[1] if len(outs) > 1 else None)


def encode_context_best(params, cfg: ModelConfig, feat, mask,
                        prefer_pallas: Optional[bool] = None,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fastest available video towers: whole-tower Pallas kernel on TPU,
    the XLA fast path elsewhere.

    The kernel only compiles in bf16 (the f32 working set at the minimum
    8-video tile exceeds VMEM), so f32/parity configs take the XLA path
    unless running in interpret mode (tests)."""
    if prefer_pallas is None:
        prefer_pallas = (jax.default_backend() == "tpu"
                         and jnp.dtype(cfg.dtype) == jnp.bfloat16)
    if not prefer_pallas:
        return encode_context_fast(params, cfg, feat, mask)

    from dldkd_tpu.ops.pallas.query_tower import (context_weights_for_branch,
                                                  fused_context_tower,
                                                  fused_context_tower_dual)

    dtype = jnp.dtype(cfg.dtype)
    names = _branch_names(cfg)
    if len(names) == 2 and cfg.inheritance_hidden == cfg.exploration_hidden:
        # dual-branch kernel: one HBM pass over the raw corpus for BOTH
        # branches (the input normalization is branch-independent). The
        # kernel assumes one shared hidden size; asymmetric configs take
        # the per-branch kernels below.
        return fused_context_tower_dual(
            feat, mask,
            context_weights_for_branch(params, names[0], dtype),
            context_weights_for_branch(params, names[1], dtype),
            n_heads=cfg.n_heads, dtype_name=cfg.dtype, v_tile=8,
            interpret=interpret)
    outs = [fused_context_tower(
        feat, mask, context_weights_for_branch(params, name, dtype),
        n_heads=cfg.n_heads, dtype_name=cfg.dtype, v_tile=8,
        interpret=interpret) for name in names]
    return outs[0], (outs[1] if len(outs) > 1 else None)


def encode_context_q8(params, cfg: ModelConfig, feat, mask,
                      prefer_pallas: Optional[bool] = None,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """int8-quantized frame features (Nv, L, H) int8 per branch — the
    serving/eval scoring-index representation (quantize_frames_q8 of the
    tower output; semantics of get_sim_scores' L2-normalize,
    reference model.py:307-329, frozen onto the int8 grid).

    On TPU in bf16 the quantization runs INSIDE the tower kernel epilogue
    (emit_q8): the corpus frame features leave the kernel index-ready, at
    half the bf16 HBM write. Elsewhere: the exactness-tested XLA towers +
    the same quantization in XLA."""
    from dldkd_tpu.ops.pallas.sim_max import quantize_frames_q8

    if prefer_pallas is None:
        prefer_pallas = (jax.default_backend() == "tpu"
                         and jnp.dtype(cfg.dtype) == jnp.bfloat16)
    if not prefer_pallas:
        ctx_i, ctx_e = encode_context_fast(params, cfg, feat, mask)
        return (quantize_frames_q8(ctx_i),
                quantize_frames_q8(ctx_e) if ctx_e is not None else None)

    from dldkd_tpu.ops.pallas.query_tower import (context_weights_for_branch,
                                                  fused_context_tower,
                                                  fused_context_tower_dual)

    dtype = jnp.dtype(cfg.dtype)
    names = _branch_names(cfg)
    if len(names) == 2 and cfg.inheritance_hidden == cfg.exploration_hidden:
        return fused_context_tower_dual(
            feat, mask,
            context_weights_for_branch(params, names[0], dtype),
            context_weights_for_branch(params, names[1], dtype),
            n_heads=cfg.n_heads, dtype_name=cfg.dtype, v_tile=8,
            emit_q8=True, interpret=interpret)
    outs = [fused_context_tower(
        feat, mask, context_weights_for_branch(params, name, dtype),
        n_heads=cfg.n_heads, dtype_name=cfg.dtype, v_tile=8,
        emit_q8=True, interpret=interpret) for name in names]
    return outs[0], (outs[1] if len(outs) > 1 else None)


def encode_query_best(params, cfg: ModelConfig, feat, mask,
                      prefer_pallas: Optional[bool] = None,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fastest available query towers: the whole-tower Pallas kernel on TPU
    (one HBM pass per branch; measured 1.6x over the XLA fast path), the
    XLA fast path elsewhere.

    Like the context kernel, gated to bf16 serving configs: f32 parity
    runs stay on the exactness-tested XLA path so Mosaic lowering can
    never perturb a parity measurement."""
    if prefer_pallas is None:
        prefer_pallas = (jax.default_backend() == "tpu"
                         and jnp.dtype(cfg.dtype) == jnp.bfloat16)
    if not prefer_pallas:
        return encode_query_fast(params, cfg, feat, mask)

    from dldkd_tpu.ops.pallas.query_tower import (fused_query_tower,
                                                  fused_query_tower_dual,
                                                  weights_for_branch)

    dtype = jnp.dtype(cfg.dtype)
    names = _branch_names(cfg)
    if len(names) == 2 and cfg.inheritance_hidden == cfg.exploration_hidden:
        # one shared hidden size -> dual kernel (one HBM pass for both
        # branches); asymmetric configs take the per-branch kernels
        outs = list(fused_query_tower_dual(
            feat, mask,
            weights_for_branch(params, names[0], dtype),
            weights_for_branch(params, names[1], dtype),
            n_heads=cfg.n_heads, dtype_name=cfg.dtype, q_tile=32,
            interpret=interpret))
    else:
        # min-across-branches table size: every branch must see the same
        # effective tail mask (the XLA fallback's and dual kernel's
        # convention) even if the branches' tables ever differed
        n_pos_min = min(
            params["params"][n]["query_pos_embed"]["pos_embed"].shape[0]
            for n in names)
        outs = [fused_query_tower(
            feat, mask, weights_for_branch(params, name, dtype),
            n_heads=cfg.n_heads, dtype_name=cfg.dtype, q_tile=32,
            n_pos_cap=n_pos_min, interpret=interpret) for name in names]
    if dtype == jnp.bfloat16:
        # bf16 pooled vectors let the scoring kernel take 2048-query tiles
        # (halves its corpus re-reads); the cosine normalization happens
        # downstream in the scoring kernel either way
        outs = [o.astype(jnp.bfloat16) for o in outs]
    return outs[0], (outs[1] if len(outs) > 1 else None)


def _pos_rows_grid(pos, l: int):
    """Positional rows for a sequence of length l, honoring the QUERY
    towers' 8-token packing-grid allowance (ingest.pack_query_rows
    pad_to_multiple): up to the 8-rounded table size, tail positions get
    zero embeddings and must be zero-masked. Matches the Pallas kernels'
    _check_pos_table semantics so the XLA fallback accepts the same
    grid-packed buffers as the TPU path."""
    if l > -(-pos.shape[0] // 8) * 8:
        raise ValueError(
            f"sequence length {l} exceeds the learned positional table "
            f"({pos.shape[0]}) — the Flax model would fail here too")
    if l > pos.shape[0]:
        pos = jnp.pad(pos, ((0, l - pos.shape[0]), (0, 0)))
    return pos[:l]


def encode_query_fast(params, cfg: ModelConfig, feat, mask
                      ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """== model.apply(..., method='encode_query', deterministic=True)."""
    names, xs = _fused_projection(params, cfg, feat, "query_input_proj")
    # enforce the packing-grid contract (see _pos_rows_grid): positions
    # beyond the learned table are always treated as padding
    n_pos = min(params["params"][n]["query_pos_embed"]["pos_embed"].shape[0]
                for n in names)
    if feat.shape[1] > n_pos:
        mask = mask * (jnp.arange(feat.shape[1]) < n_pos
                       ).astype(mask.dtype)[None, :]
    outs = []
    for name, x in zip(names, xs):
        p = params["params"][name]
        pos = _pos_rows_grid(p["query_pos_embed"]["pos_embed"],
                             x.shape[1]).astype(x.dtype)
        x = _ln(x + pos[None], p["query_pos_embed"]["norm"])
        x = _attention(x, mask, p["query_encoder"], cfg.n_heads)
        att = x @ p["modular_vector_mapping"]["kernel"].astype(x.dtype)
        att = jax.nn.softmax(mask_logits(att, mask[:, :, None]), axis=1)
        outs.append(jnp.einsum("blm,bld->bmd", att, x)[:, 0, :])
    return outs[0], (outs[1] if len(outs) > 1 else None)
