"""Corpus-beyond-HBM streaming eval benchmark (>= 8x TVR corpus scale).

The corpus-RESIDENT eval (bench.py) keeps the encoded two-branch corpus in
HBM — at 8x TVR that is ~7 GB of encoded features plus the raw corpus,
past what a 16 GB chip can hold together with scoring workspace. The
streaming engine (evaluate.eval_retrieval_streaming) bounds device memory
to one block by re-encoding blocks on the fly.

Two postures are measured:

  hbm-raw   the raw bf16 corpus is the device-resident index
            (8x TVR raw bf16 = ~4.6 GB; encoded features never
            materialize beyond one block) — the realistic large-corpus
            serving posture on one chip, and the sustained-q/s headline.
  host      the packed corpus stays in host RAM and blocks stream through
            jax.device_put exactly as eval_retrieval_streaming does. On
            THIS machine the TPU sits behind a network tunnel, so this
            measures the tunnel, not PCIe — reported for completeness
            with that caveat (run with --host).

Run from /root/repo:  python -m dldkd_tpu.tools.stream_bench [--scale 8]
Prints one JSON line.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

from bench import (D_QUERY, D_STUDENT, L_FRAMES, L_TOK_PAD, L_TOKENS,
                   N_QUERIES, N_VIDEOS, log, serving_model_config)

BLOCK = 2048  # videos per streamed block


def bench_hbm_raw(scale: int, reps: int = 5):
    import jax
    import jax.numpy as jnp

    from dldkd_tpu.metrics import rank_of_gt
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool
    from dldkd_tpu.train import init_params

    mcfg = serving_model_config()
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)

    n_vid = N_VIDEOS * scale
    n_blocks = -(-n_vid // BLOCK)
    n_vid_pad = n_blocks * BLOCK
    n_q_pad = -(-N_QUERIES // 1024) * 1024

    @jax.jit
    def make_data(key):
        kv, kq = jax.random.split(key)
        vfeats = jax.random.uniform(
            kv, (n_blocks, BLOCK, L_FRAMES, D_STUDENT)).astype(jnp.bfloat16)
        vmask = (jnp.arange(n_vid_pad) < n_vid).astype(jnp.float32).reshape(
            n_blocks, BLOCK)[:, :, None] * jnp.ones(
                (n_blocks, BLOCK, L_FRAMES), jnp.float32)
        qfeats = jax.random.uniform(
            kq, (n_q_pad, L_TOK_PAD, D_QUERY), jnp.float32)
        qmask = (jnp.arange(L_TOK_PAD) < L_TOKENS
                 ).astype(jnp.float32)[None, :] * jnp.ones(
                     (n_q_pad, L_TOK_PAD), jnp.float32)
        gt = (jnp.arange(n_q_pad) % n_vid).astype(jnp.int32)
        return vfeats, vmask, qfeats, qmask, gt

    t0 = time.time()
    vfeats, vmask, qfeats, qmask, gt = jax.block_until_ready(
        make_data(jax.random.PRNGKey(0)))
    params = jax.device_put(params)
    log(f"on-device corpus: {vfeats.nbytes / 1e9:.2f} GB raw bf16 "
        f"({n_vid} videos = {scale}x TVR), gen {time.time() - t0:.1f}s")

    @functools.partial(jax.jit, static_argnums=(0,))
    def streaming_eval(model, params, vfeats, vmask, qfeats, qmask, gt,
                       salt):
        params = jax.tree.map(lambda p: p + salt, params)
        qi, qe = encode_query_best(params, mcfg, qfeats, qmask)

        def score_block(args):
            bf, bm = args
            ci, ce = encode_context_best(params, mcfg, bf, bm)
            return (0.7 * clip_scores_maxpool(qi, ci, bm, quantized=True)
                    + 0.3 * clip_scores_maxpool(qe, ce, bm, quantized=True))

        cols = jax.lax.map(score_block, (vfeats, vmask))   # (nb, Nq, BLOCK)
        # (nb, Nq, BLOCK) -> (Nq, nb*BLOCK), block-major columns — the
        # same layout concatenating per-block score columns would give
        fused = jnp.moveaxis(cols, 0, 1).reshape(cols.shape[1], -1)
        return rank_of_gt(fused, gt)

    t0 = time.time()
    ranks = np.asarray(streaming_eval(model, params, vfeats, vmask,
                                      qfeats, qmask, gt, jnp.float32(0.0)))
    log(f"first run (incl. compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    for r in range(reps):
        ranks = streaming_eval(model, params, vfeats, vmask, qfeats, qmask,
                               gt, jnp.float32(1e-4 * (r + 1)))
    ranks = np.asarray(ranks)[:N_QUERIES]
    dt = (time.time() - t0) / reps
    sumr = sum(100.0 * (ranks <= k).mean() for k in (1, 5, 10, 100))
    qps = N_QUERIES / dt
    log(f"hbm-raw streaming eval at {scale}x TVR ({n_vid} videos): "
        f"{dt:.2f}s/pass -> {qps:.0f} queries/sec sustained "
        f"(random-data sumr {sumr:.1f})")
    return {"qps": qps, "seconds_per_pass": dt, "videos": n_vid,
            "scale": scale}


def bench_host_stream(scale: int):
    """True host->device streaming through eval_retrieval_streaming.
    On this machine the device link is a network tunnel (not PCIe); the
    number documents the pipeline works at scale, not the hardware."""
    import jax

    from dldkd_tpu.data.ingest import PackedQueries, PackedVideos
    from dldkd_tpu.evaluate import eval_retrieval_streaming
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.train import init_params

    mcfg = serving_model_config()
    model = DLDKD(config=mcfg)
    params = jax.device_put(init_params(model, mcfg, 0))

    n_vid = N_VIDEOS * scale
    n_q = 2048  # bounded query count: the corpus pass dominates anyway
    rng = np.random.RandomState(0)
    videos = PackedVideos(
        feats=rng.rand(n_vid, L_FRAMES, D_STUDENT).astype(np.float32),
        mask=np.ones((n_vid, L_FRAMES), np.float32),
        ids=[f"v{i}" for i in range(n_vid)])
    gt_ids = [videos.ids[i % n_vid] for i in range(n_q)]
    queries = PackedQueries(
        feats=rng.rand(n_q, L_TOK_PAD, D_QUERY).astype(np.float32),
        mask=np.tile((np.arange(L_TOK_PAD) < L_TOKENS
                      ).astype(np.float32), (n_q, 1)),
        cap_ids=[f"{v}#enc#{i}" for i, v in enumerate(gt_ids)],
        video_ids=gt_ids)
    log(f"host corpus: {videos.feats.nbytes / 1e9:.2f} GB f32 "
        f"({n_vid} videos = {scale}x TVR)")

    t0 = time.time()
    out = eval_retrieval_streaming(model, params, videos, queries,
                                   corpus_block=BLOCK, score_quant=True)
    dt = time.time() - t0
    log(f"host streaming eval (incl. compile, TUNNEL-bound on this "
        f"machine): {dt:.1f}s for {n_q} queries x {n_vid} videos "
        f"(sumr {out['fused']['sumr']:.1f})")
    return {"seconds": dt, "videos": n_vid, "queries": n_q}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scale", type=int, default=8,
                   help="corpus scale in multiples of the TVR test corpus")
    p.add_argument("--host", action="store_true",
                   help="also run the true host->device streaming posture")
    args = p.parse_args(argv)

    import os

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dldkd_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    out = {"metric": "streaming_eval_throughput", "unit": "queries/sec"}
    hbm = bench_hbm_raw(args.scale)
    out.update(value=round(hbm["qps"], 1), detail=hbm)
    if args.host:
        out["host_stream"] = bench_host_stream(max(2, args.scale // 4))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
