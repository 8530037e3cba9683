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

def _bench_module():
    """bench.py at the repo root is the single source of truth for the
    serving workload (shapes + model config); importing it keeps this
    tool from silently drifting when the bench changes."""
    try:
        import bench
    except ImportError as e:
        raise SystemExit(
            "run from the repo root (stage_bench mirrors bench.py's "
            f"workload): {e}")
    return bench


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

    from dldkd_tpu.metrics import rank_of_gt
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool
    from dldkd_tpu.train import init_params

    bench = _bench_module()
    N_VIDEOS, N_QUERIES = bench.N_VIDEOS, bench.N_QUERIES
    L_FRAMES, D_STUDENT = bench.L_FRAMES, bench.D_STUDENT
    D_QUERY, L_TOKENS, L_TOK_PAD = (bench.D_QUERY, bench.L_TOKENS,
                                    bench.L_TOK_PAD)
    mcfg = bench.serving_model_config()
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)

    # round-2 serving shapes: 1024-grid query padding, 8-grid token
    # buffers, bf16-resident corpus — the same workload as bench.py
    n_vid_pad = -(-N_VIDEOS // 128) * 128
    n_q_pad = -(-N_QUERIES // bench.QUERY_BSZ) * bench.QUERY_BSZ

    @jax.jit
    def make_data(key):
        kv, kq = jax.random.split(key)
        vfeats = jax.random.uniform(
            kv, (n_vid_pad, L_FRAMES, D_STUDENT)).astype(jnp.bfloat16)
        vmask = (jnp.arange(n_vid_pad) < N_VIDEOS
                 ).astype(jnp.float32)[:, None] * jnp.ones(
                     (n_vid_pad, L_FRAMES), jnp.float32)
        qfeats = jax.random.uniform(
            kq, (n_q_pad, L_TOK_PAD, D_QUERY), jnp.float32)
        qmask = (jnp.arange(L_TOK_PAD) < L_TOKENS
                 ).astype(jnp.float32)[None, :] * jnp.ones(
                     (n_q_pad, L_TOK_PAD), jnp.float32)
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
        vfeats = (vfeats + salt).astype(vfeats.dtype)  # keep bf16 residency
        ci, ce = encode_context_best(params, cfg2, vfeats, vmask)
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

    # Precomputed tower outputs for the scoring stages — via the XLA fast
    # path (numerically equivalent): a standalone program whose ONLY body
    # is the dual Pallas kernel fed by a bf16 parameter crashes this
    # platform's AOT compile helper, while the same kernel embedded in a
    # larger program (ctx_stage above, bench.py's full_eval) compiles fine.
    from dldkd_tpu.ops.fast_eval import encode_context_fast, encode_query_fast

    ctx_i, ctx_e = jax.jit(
        lambda p, f, m: encode_context_fast(p, mcfg, f, m))(
            params, vfeats, vmask)
    q_i, q_e = jax.jit(
        lambda p, f, m: tuple(
            q if q is None else q.astype(jnp.bfloat16)
            for q in encode_query_fast(p, mcfg, f, m)))(
            params, qfeats, qmask)

    @functools.partial(jax.jit, static_argnums=(4,))
    def score_one(q, ctx, vmask, salt, quant):
        # keep the query dtype: `q + f32 salt` would promote bf16 -> f32
        # and silently change the kernel's tile selection
        q = (q + salt).astype(q.dtype)
        return clip_scores_maxpool(q, ctx, vmask, quantized=quant).sum()

    @functools.partial(jax.jit, static_argnums=(7,))
    def score_both_rank(qi, qe, ci, ce, vmask, gt, salt, quant):
        qi = (qi + salt).astype(qi.dtype)
        qe = (qe + salt).astype(qe.dtype)
        fused = (0.7 * clip_scores_maxpool(qi, ci, vmask, quantized=quant)
                 + 0.3 * clip_scores_maxpool(qe, ce, vmask, quantized=quant))
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
    timed("scoring (1 branch, bf16)", lambda s: score_one(
        q_i, ctx_i, vmask, s, False))
    timed("scoring (1 branch, int8)", lambda s: score_one(
        q_i, ctx_i, vmask, s, True))
    timed("scoring (2 branches, bf16) + rank", lambda s: score_both_rank(
        q_i, q_e, ctx_i, ctx_e, vmask, gt, s, False))
    t_sc2 = timed("scoring (2 branches, int8) + rank",
                  lambda s: score_both_rank(
                      q_i, q_e, ctx_i, ctx_e, vmask, gt, s, True))
    timed("rank only", lambda s: rank_stage(fused0, gt, s))
    total = t_ctx + t_qry + t_sc2
    log(f"--- sum(ctx2 + qry2 + int8-score2+rank) = {total * 1e3:.1f} ms "
        f"-> {N_QUERIES / total:.0f} q/s ---")

    # ---- round-4 q8 flow stages: int8-emitting towers, index build
    # (transpose + bias), prebuilt-index scoring ----
    from dldkd_tpu.ops.fast_eval import encode_context_q8
    from dldkd_tpu.ops.pallas.sim_max import build_q8_index
    from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

    @jax.jit
    def ctx_q8_stage(params, vfeats, vmask, salt):
        vfeats = (vfeats + salt).astype(vfeats.dtype)
        q8_i, q8_e = encode_context_q8(params, mcfg, vfeats, vmask)
        return (q8_i.astype(jnp.int32).sum()
                + q8_e.astype(jnp.int32).sum())

    @jax.jit
    def build_stage(q8, vmask, salt):
        isalt = (salt * 1e4).astype(jnp.int8)     # distinct int per rep
        t, bias = build_q8_index(q8 + isalt, vmask)
        return t.astype(jnp.int32).sum() + bias.sum()

    @jax.jit
    def score_pre8_rank(qi, qe, t_i, t_e, bias, gt, salt):
        qi = (qi + salt).astype(qi.dtype)
        qe = (qe + salt).astype(qe.dtype)
        fused = (0.7 * clip_scores_maxpool_pre8(qi, t_i, bias)
                 + 0.3 * clip_scores_maxpool_pre8(qe, t_e, bias))
        return rank_of_gt(fused, gt)

    q8_i0, q8_e0 = jax.jit(
        lambda p, f, m: encode_context_q8(p, mcfg, f, m))(
            params, vfeats, vmask)
    t_i0, bias0 = jax.jit(build_q8_index)(q8_i0, vmask)
    t_e0, _ = jax.jit(build_q8_index)(q8_e0, vmask)

    log("--- round-4 q8 flow ---")
    t_ctx8 = timed("ctx towers q8-emit (2 branches)", lambda s: ctx_q8_stage(
        params, vfeats, vmask, s))
    t_bld = timed("q8 index build (transpose+bias, 1 br)", lambda s:
                  build_stage(q8_i0, vmask, s))
    t_sc8 = timed("scoring pre8 (2 branches) + rank", lambda s:
                  score_pre8_rank(q_i, q_e, t_i0, t_e0, bias0, gt, s))
    total8 = t_ctx8 + 2 * t_bld + t_qry + t_sc8
    log(f"--- q8 flow sum(ctx8 + 2*build + qry2 + pre8+rank) = "
        f"{total8 * 1e3:.1f} ms -> {N_QUERIES / total8:.0f} q/s ---")


if __name__ == "__main__":
    main()
