"""Per-stage eval throughput microbenchmark (TPU, TVR scale).

Times each stage of the serving eval pipeline separately — context towers,
query towers, per-branch scoring, ranking — so kernel work can be aimed at
the actual bottleneck. Follows the platform measurement protocol from
BENCHMARKS.md: on-device data generation, salted inputs per rep (cache
busting), async dispatch queued and forced by one small host fetch (this
platform's block_until_ready does not block).

Usage: python -m dldkd_tpu.tools.stage_bench [--reps 10]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

N_VIDEOS = 2179
N_QUERIES = 10895
L_FRAMES = 128
D_STUDENT = 1024
D_QUERY = 768
L_TOKENS = 30


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dldkd_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from dldkd_tpu.config import ModelConfig
    from dldkd_tpu.metrics import rank_of_gt
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool
    from dldkd_tpu.train import init_params

    mcfg = ModelConfig(
        visual_input_size=D_STUDENT, query_input_size=D_QUERY,
        inheritance_hidden=384, exploration_hidden=384,
        max_ctx_l=L_FRAMES, max_desc_l=L_TOKENS, n_heads=4,
        double_branch=True, label_style="soft",
        dtype="bfloat16", matmul_precision="default",
    )
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)

    n_vid_pad = -(-N_VIDEOS // 128) * 128
    n_q_pad = -(-N_QUERIES // 2048) * 2048

    @jax.jit
    def make_data(key):
        kv, kq = jax.random.split(key)
        vfeats = jax.random.uniform(
            kv, (n_vid_pad, L_FRAMES, D_STUDENT), jnp.float32)
        vmask = (jnp.arange(n_vid_pad) < N_VIDEOS
                 ).astype(jnp.float32)[:, None] * jnp.ones(
                     (n_vid_pad, L_FRAMES), jnp.float32)
        qfeats = jax.random.uniform(
            kq, (n_q_pad, L_TOKENS, D_QUERY), jnp.float32)
        qmask = jnp.ones((n_q_pad, L_TOKENS), jnp.float32)
        gt = (jnp.arange(n_q_pad) % N_VIDEOS).astype(jnp.int32)
        return vfeats, vmask, qfeats, qmask, gt

    t0 = time.time()
    vfeats, vmask, qfeats, qmask, gt = make_data(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    # force staging via a tiny fetch
    np.asarray(vfeats[0, 0, :8])
    log(f"data gen + staging: {time.time() - t0:.1f}s")

    @functools.partial(jax.jit, static_argnums=(0,))
    def ctx_stage(both, params, vfeats, vmask, salt):
        cfg2 = mcfg if both else mcfg.replace(double_branch=False)
        ci, ce = encode_context_best(params, cfg2, vfeats + salt, vmask)
        out = ci.astype(jnp.float32).sum()
        if ce is not None:
            out = out + ce.astype(jnp.float32).sum()
        return out

    @functools.partial(jax.jit, static_argnums=(0,))
    def qry_stage(both, params, qfeats, qmask, salt):
        cfg2 = mcfg if both else mcfg.replace(double_branch=False)
        qi, qe = encode_query_best(params, cfg2, qfeats + salt, qmask)
        out = qi.astype(jnp.float32).sum()
        if qe is not None:
            out = out + qe.astype(jnp.float32).sum()
        return out

    # precomputed tower outputs for the scoring stage
    ctx_i, ctx_e = jax.jit(
        lambda p, f, m: encode_context_best(p, mcfg, f, m))(
            params, vfeats, vmask)
    q_i, q_e = jax.jit(
        lambda p, f, m: encode_query_best(p, mcfg, f, m))(
            params, qfeats, qmask)

    @jax.jit
    def score_one(q, ctx, vmask, salt):
        return clip_scores_maxpool(q + salt, ctx, vmask).sum()

    @jax.jit
    def score_both_rank(qi, qe, ci, ce, vmask, gt, salt):
        fused = (0.7 * clip_scores_maxpool(qi + salt, ci, vmask)
                 + 0.3 * clip_scores_maxpool(qe + salt, ce, vmask))
        return rank_of_gt(fused, gt)

    @jax.jit
    def rank_stage(fused, gt, salt):
        return rank_of_gt(fused + salt, gt)

    fused0 = (0.7 * jax.jit(clip_scores_maxpool)(q_i, ctx_i, vmask)
              + 0.3 * jax.jit(clip_scores_maxpool)(q_e, ctx_e, vmask))

    def timed(name, fn, *a):
        # compile + one warm run
        r = fn(*a, jnp.float32(0.0))
        np.asarray(r).reshape(-1)[:4]
        t0 = time.time()
        for k in range(args.reps):
            r = fn(*a, jnp.float32(1e-4 * (k + 1)))
        np.asarray(r).reshape(-1)[:4]
        dt = (time.time() - t0) / args.reps
        log(f"{name:<42s} {dt * 1e3:8.2f} ms")
        return dt

    log(f"--- per-stage (reps={args.reps}, salted) ---")
    timed("ctx towers  (1 branch)", lambda s: ctx_stage(
        False, params, vfeats, vmask, s))
    t_ctx = timed("ctx towers  (2 branches)", lambda s: ctx_stage(
        True, params, vfeats, vmask, s))
    timed("query towers (1 branch)", lambda s: qry_stage(
        False, params, qfeats, qmask, s))
    t_qry = timed("query towers (2 branches)", lambda s: qry_stage(
        True, params, qfeats, qmask, s))
    t_sc1 = timed("scoring (1 branch)", lambda s: score_one(
        q_i, ctx_i, vmask, s))
    t_sc2 = timed("scoring (2 branches) + rank", lambda s: score_both_rank(
        q_i, q_e, ctx_i, ctx_e, vmask, gt, s))
    t_rank = timed("rank only", lambda s: rank_stage(fused0, gt, s))
    total = t_ctx + t_qry + t_sc2
    log(f"--- sum(ctx2 + qry2 + score2+rank) = {total * 1e3:.1f} ms "
        f"-> {N_QUERIES / total:.0f} q/s ---")


if __name__ == "__main__":
    main()
