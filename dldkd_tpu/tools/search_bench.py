"""Serving search latency at TVR corpus scale (single chip).

Times the jitted per-batch search programs directly on device-resident
inputs (the tunnel protocol of BENCHMARKS.md: data generated on device,
reps queued async, one tiny host fetch forces completion), at the serving
shape: 256-query batches, k=10, dual branch, bf16 index.

Rows:
  exact        — bf16 full-matrix scoring + top-k (the exact path)
  two_stage    — legacy score_quant: per-call int8 quantize pre-pass over
                 the corpus + int8 shortlist + exact-f32 rescore
  two_stage_q8 — round-4 path: stage 1 straight on the PREBUILT int8
                 index (no per-call corpus pre-pass), same exact rescore
  int8_only_q8 — prebuilt index, no rescore (approximate ranks)

Run from /root/repo:  python -m dldkd_tpu.tools.search_bench
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(reps: int = 20, n_queries: int = 256, k: int = 10):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dldkd_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from bench import (D_QUERY, D_STUDENT, L_FRAMES, L_TOK_PAD, L_TOKENS,
                       N_VIDEOS, serving_model_config)
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_context_q8
    from dldkd_tpu.ops.pallas.sim_max import build_q8_index
    from dldkd_tpu.serving import _search_jit, _search_q8_jit
    from dldkd_tpu.train import init_params

    mcfg = serving_model_config()
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)

    n_vid_pad = -(-N_VIDEOS // 128) * 128

    @jax.jit
    def make_data(key):
        kv, kq = jax.random.split(key)
        vfeats = jax.random.uniform(
            kv, (n_vid_pad, L_FRAMES, D_STUDENT)).astype(jnp.bfloat16)
        vmask = (jnp.arange(n_vid_pad) < N_VIDEOS
                 ).astype(jnp.float32)[:, None] * jnp.ones(
                     (n_vid_pad, L_FRAMES), jnp.float32)
        qfeats = jax.random.uniform(
            kq, (reps, n_queries, L_TOK_PAD, D_QUERY), jnp.float32)
        qmask = (jnp.arange(L_TOK_PAD) < L_TOKENS
                 ).astype(jnp.float32)[None, None] * jnp.ones(
                     (reps, n_queries, L_TOK_PAD), jnp.float32)
        return vfeats, vmask, qfeats, qmask

    vfeats, vmask, qfeats, qmask = make_data(jax.random.PRNGKey(0))
    np.asarray(qmask[0, :2, :2])  # force data gen

    # index build (once; not in the per-search timings)
    t0 = time.time()
    ctx_i, ctx_e = encode_context_best(params, mcfg, vfeats, vmask)
    q8 = encode_context_q8(params, mcfg, vfeats, vmask)
    q8_i, bias = build_q8_index(q8[0], vmask)
    q8_e, _ = build_q8_index(q8[1], vmask)
    np.asarray(q8_e[0, :2, :2])
    log(f"index build (frames + q8, incl. compile): {time.time() - t0:.1f}s")

    fusion = jnp.asarray([0.7, 0.3], jnp.float32)
    out = {}

    def timed(label, call):
        t0 = time.time()
        s, i = call(0)
        np.asarray(i[:2, :2])
        log(f"[{label}] first (incl. compile): {time.time() - t0:.1f}s")
        t0 = time.time()
        for r in range(reps):
            s, i = call(r)
        np.asarray(i[:2, :2])       # forces the queued pipeline
        dt = (time.time() - t0) / reps * 1e3
        log(f"[{label}] {dt:.1f} ms/batch ({n_queries} queries, k={k})")
        out[label] = round(dt, 2)

    timed("exact", lambda r: _search_jit(
        model, params, qfeats[r], qmask[r], ctx_i, ctx_e, k, vmask, fusion,
        False, False))
    timed("two_stage", lambda r: _search_jit(
        model, params, qfeats[r], qmask[r], ctx_i, ctx_e, k, vmask, fusion,
        True, True))
    timed("two_stage_q8", lambda r: _search_q8_jit(
        model, params, qfeats[r], qmask[r], q8_i, q8_e, bias, k,
        ctx_i, ctx_e, vmask, fusion, True))
    timed("int8_only_q8", lambda r: _search_q8_jit(
        model, params, qfeats[r], qmask[r], q8_i, q8_e, bias, k,
        None, None, vmask, fusion, False))

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
