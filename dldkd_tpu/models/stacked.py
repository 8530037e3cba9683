"""Stacked-branch training towers: both branches as ONE batched computation.

The dual-branch DLDKD runs two Branch modules with IDENTICAL shapes
(reference model.py:42-61 builds the exploration branch as a structural
twin of the inheritance branch). The default training forward applies them
sequentially — twice the kernel count, each matmul at half the available
arithmetic intensity. Here the two branches' parameter trees are stacked
on a leading (2, ...) axis and ONE vmapped Branch application encodes both:
every tower matmul becomes a single batched (2, ...) MXU op, halving
kernel launches and letting XLA schedule the branches together.

Semantics: identical math per branch (vmap is a compiler transform, not an
approximation — deterministic outputs match the sequential forward to float
rounding; exactness-tested). The only behavioral difference is the dropout
RNG stream: the sequential forward derives per-module keys from one rng via
flax's path folding, the stacked forward derives one key per branch and
folds inside — different draws from the same seed, the same distribution.
The f32 parity config therefore keeps the sequential forward (the golden-
tested numerics); --stacked_towers is a speed knob for the bf16 path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dldkd_tpu.models.dldkd import DLDKD, Branch


def can_stack(cfg) -> bool:
    """Stacking needs two branches with one shared hidden size."""
    return bool(cfg.double_branch
                and cfg.inheritance_hidden == cfg.exploration_hidden)


def _branch_module(cfg) -> Branch:
    return Branch(hidden=cfg.inheritance_hidden, max_desc_l=cfg.max_desc_l,
                  max_ctx_l=cfg.max_ctx_l, n_heads=cfg.n_heads,
                  input_drop=cfg.input_drop, drop=cfg.drop,
                  init_std=cfg.initializer_range, dtype=jnp.dtype(cfg.dtype))


def encode_stacked(
    model: DLDKD,
    params,
    video_feat, video_mask, query_feat, query_mask,
    rngs: Optional[dict] = None,
    deterministic: bool = True,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Drop-in replacement for the model.apply training encode: returns
    ((inher_ctx, explore_ctx), (inher_q, explore_q)) with both branches'
    towers executed as one vmapped (2, ...) computation."""
    cfg = model.config
    if not can_stack(cfg):
        raise ValueError("stacked towers need double_branch with equal "
                         "hidden sizes")
    p = params["params"]
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                           p["inheritance"], p["exploration"])
    branch = _branch_module(cfg)
    drng = (rngs or {}).get("dropout")

    if drng is None:
        def ctx_one(bp):
            return branch.apply({"params": bp}, video_feat, video_mask,
                                deterministic, method=Branch.encode_context)

        def qry_one(bp):
            return branch.apply({"params": bp}, query_feat, query_mask,
                                deterministic, method=Branch.encode_query)

        ctx = jax.vmap(ctx_one)(stacked)
        qry = jax.vmap(qry_one)(stacked)
    else:
        kc, kq = jax.random.split(drng)
        ctx_keys = jax.random.split(kc, 2)
        qry_keys = jax.random.split(kq, 2)

        def ctx_one(bp, key):
            return branch.apply({"params": bp}, video_feat, video_mask,
                                deterministic, method=Branch.encode_context,
                                rngs={"dropout": key})

        def qry_one(bp, key):
            return branch.apply({"params": bp}, query_feat, query_mask,
                                deterministic, method=Branch.encode_query,
                                rngs={"dropout": key})

        ctx = jax.vmap(ctx_one)(stacked, ctx_keys)
        qry = jax.vmap(qry_one)(stacked, qry_keys)
    return (ctx[0], ctx[1]), (qry[0], qry[1])
