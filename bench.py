"""Benchmark: corpus-scale text-to-video retrieval throughput.

Measures the headline eval workload at TVR scale (BASELINE.md: the north
star is SumR parity + >10x the reference's CPU throughput in queries/sec):
embed the full video corpus, score every query against every video
(max-over-frames similarity), rank the ground truth.

Measurement protocol: all inputs are device-resident before timing (the
production serving shape — the corpus lives on the accelerator); we time
embed + score + rank on device and pull back only the final ranks. This
machine reaches its TPU through a network tunnel, so per-call host->device
transfer would otherwise dominate and measure the tunnel, not the TPU.

Baseline: the reference implements the identical scoring math as a torch
einsum + numpy argsort loop (eval.py:177-219, 59-94). We time that exact
computation with torch-CPU on a subsample and extrapolate linearly in
(queries x videos); encoder cost is EXCLUDED from the baseline (favors the
baseline). vs_baseline = ours_qps / torch_qps.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import sys
import time

import numpy as np

# TVR test-split scale (SURVEY.md S6): ~2.2k corpus videos, ~11k queries
N_VIDEOS = 2179
N_QUERIES = 10895
L_FRAMES = 128
D_STUDENT = 1024
D_QUERY = 768
L_TOKENS = 30
QUERY_BSZ = 2048


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_tpu():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dldkd_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from dldkd_tpu.config import ModelConfig
    from dldkd_tpu.metrics import rank_of_gt
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.ops.similarity import clip_scores_maxpool
    from dldkd_tpu.parallel import make_mesh
    from dldkd_tpu.parallel.mesh import DATA_AXIS, replicated
    from dldkd_tpu.train import init_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    # serving configuration: bf16 towers + default MXU precision (measured
    # 1.65x over f32 with identical aggregate retrieval metrics; metric-
    # parity runs use the f32/highest default of ModelConfig)
    mcfg = ModelConfig(
        visual_input_size=D_STUDENT, query_input_size=D_QUERY,
        inheritance_hidden=384, exploration_hidden=384,
        max_ctx_l=L_FRAMES, max_desc_l=L_TOKENS, n_heads=4,
        double_branch=True, label_style="soft",
        dtype="bfloat16", matmul_precision="default",
    )
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    log(f"devices: {jax.devices()}")
    # pad to a multiple of lcm(n_dev, 128): the fused scoring kernel tiles
    # videos in 128-lane blocks, so no per-call re-padding is needed
    chunk = 128 * n_dev // np.gcd(128, n_dev)
    n_vid_pad = ((N_VIDEOS + chunk - 1) // chunk) * chunk
    n_q_pad = ((N_QUERIES + QUERY_BSZ - 1) // QUERY_BSZ) * QUERY_BSZ

    corpus_sh = NamedSharding(mesh, P(DATA_AXIS))
    rep = replicated(mesh)

    # Synthetic data is generated ON DEVICE (this machine reaches the TPU
    # through a network tunnel; staging 1.5 GB from host would time the
    # tunnel, not the workload). Only the ~10M-param model crosses the wire.
    @functools.partial(
        jax.jit,
        out_shardings=(corpus_sh, corpus_sh, rep, rep, rep))
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
    vfeats, vmask, qfeats, qmask, gt = jax.block_until_ready(
        make_data(jax.random.PRNGKey(0)))
    params = jax.device_put(params, rep)
    jax.block_until_ready(params)
    log(f"on-device data gen + param staging: {time.time() - t0:.1f}s "
        f"({(vfeats.nbytes + qfeats.nbytes) / 1e9:.2f} GB device-resident)")

    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_query_best

    if n_dev > 1:
        # pallas_call does not auto-partition under GSPMD: the scoring AND
        # context-tower kernels run per-device over the video-sharded
        # corpus under shard_map, queries replicated (same layout as
        # parallel.eval_shard)
        from jax import shard_map

        score_fn = shard_map(clip_scores_maxpool, mesh=mesh,
                             in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                             out_specs=P(None, DATA_AXIS), check_vma=False)
        encode_ctx = shard_map(
            lambda p, f, m: encode_context_best(p, mcfg, f, m),
            mesh=mesh, in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
    else:
        score_fn = clip_scores_maxpool
        encode_ctx = lambda p, f, m: encode_context_best(p, mcfg, f, m)

    @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=())
    def full_eval(model, params, vfeats, vmask, qfeats, qmask, gt, salt):
        # salt makes every invocation a distinct computation on distinct
        # data so no layer (XLA, runtime, tunnel) can serve a cached result
        ctx_i, ctx_e = encode_ctx(params, vfeats + salt, vmask)
        qi, qe = encode_query_best(params, mcfg, qfeats + salt, qmask)
        fused = (0.7 * score_fn(qi, ctx_i, vmask)
                 + 0.3 * score_fn(qe, ctx_e, vmask))
        return rank_of_gt(fused, gt)

    # NOTE: the experimental axon platform's block_until_ready does not
    # actually block, so every timed region ends with the (44 KB) rank
    # fetch to host — that forces completion of the whole pipeline. The
    # ~27 ms tunnel round-trip is amortized by queueing all reps (dispatch
    # is async) and fetching once at the end.
    t0 = time.time()
    ranks_np = np.asarray(full_eval(model, params, vfeats, vmask,
                                    qfeats, qmask, gt, jnp.float32(0.0)))
    log(f"first run (incl. compile): {time.time() - t0:.1f}s")
    reps = 10
    t0 = time.time()
    for r in range(reps):
        ranks = full_eval(model, params, vfeats, vmask, qfeats, qmask, gt,
                          jnp.float32(1e-4 * (r + 1)))
    ranks_np = np.asarray(ranks)
    dt = (time.time() - t0) / reps
    ranks_np = ranks_np[:N_QUERIES]
    sumr = sum(100.0 * (ranks_np <= k).mean() for k in (1, 5, 10, 100))
    qps = N_QUERIES / dt
    log(f"tpu steady-state full eval (embed+score+rank, fused 2-branch): "
        f"{dt:.2f}s -> {qps:.0f} queries/sec (random-data sumr {sumr:.1f})")
    return qps


def bench_torch_cpu(sample_q=16, sample_v=256):
    """Reference scoring math (torch einsum + mask + max + numpy argsort)
    on CPU, extrapolated linearly in queries x videos."""
    import torch

    rng = np.random.RandomState(0)
    hidden = 384
    q = torch.from_numpy(rng.rand(sample_q, hidden).astype(np.float32))
    ctx = torch.from_numpy(
        rng.rand(sample_v, L_FRAMES, hidden).astype(np.float32))
    mask = torch.ones(sample_v, L_FRAMES)

    def score_once():
        qn = torch.nn.functional.normalize(q, dim=-1)
        cn = torch.nn.functional.normalize(ctx, dim=-1)
        s = torch.einsum("md,nld->mln", qn, cn)
        m = mask.transpose(0, 1).unsqueeze(0)
        s = s * m + (1 - m) * -1e10
        scores, _ = torch.max(s, dim=1)
        return scores.numpy()

    score_once()  # warm
    # best-of-5 (not mean): the single host core contends with background
    # work; the fastest rep is the fairest (most favorable) baseline
    times = []
    for _ in range(5):
        t0 = time.time()
        scores = score_once()
        for i in range(sample_q):  # reference ranking loop (eval.py:73-83)
            np.argsort(-scores[i])
        times.append(time.time() - t0)
    dt = min(times)
    pair_rate = (sample_q * sample_v) / dt  # query-video pairs per sec
    # two branches are scored at eval (inheritance + exploration)
    qps = pair_rate / N_VIDEOS / 2
    log(f"torch-cpu: {dt:.2f}s for {sample_q}x{sample_v} "
        f"-> extrapolated {qps:.2f} queries/sec at {N_VIDEOS} videos x2 "
        f"branches (scoring only, encoders excluded)")
    return qps


def main():
    tpu_qps = bench_tpu()
    cpu_qps = bench_torch_cpu()
    print(json.dumps({
        "metric": "t2v_retrieval_throughput",
        "value": round(tpu_qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(tpu_qps / cpu_qps, 1),
    }))


if __name__ == "__main__":
    main()
