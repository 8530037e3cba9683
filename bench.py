"""Benchmark: corpus-scale text-to-video retrieval throughput.

Measures the headline eval workload at TVR scale (BASELINE.md: the north
star is SumR parity + >10x the reference's CPU throughput in queries/sec):
embed the full video corpus, score every query against every video
(max-over-frames similarity), rank the ground truth.

Measurement protocol: all inputs are device-resident before timing (the
production serving shape — the corpus lives on the accelerator, bf16, and
queries arrive packed on the 8-token kernel grid); we time embed + score +
rank on device and pull back only the final ranks. Each rep runs with
salted PARAMETERS (distinct computation, uncacheable results) on the fixed
inputs. Scoring uses the int8-quantized serving path (rank-preserving;
tests/test_pallas.py TestInt8Scoring). This machine reaches its TPU
through a network tunnel, so per-call host->device transfer would
otherwise dominate and measure the tunnel, not the TPU.

Baseline: the REFERENCE'S OWN eval path (method/eval.py
compute_context_info -> compute_query2ctx_info -> eval_q2m) with the real
torch DLDKD model on CPU at FULL corpus scale; only the query loop — which
is exactly linear (eval.py:188-216 processes 50-query batches
independently) — is subsampled and extrapolated. Ranking is counted once
(on the fused scores) although the reference ranks three score matrices,
which favors the baseline. vs_baseline = ours_qps / reference_qps.

A second metric (train_step_throughput) times our jitted train step at the
TVR parity config (f32, bsz 128) against the reference's forward/backward/
BertAdam step on torch-CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"train": {...the second metric...}}.
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
L_TOK_PAD = 32    # serving packs tokens on the kernels' 8-token grid
QUERY_BSZ = 1024  # rounds 10,895 queries to 11,264 (3.4% pad vs 13% at 2048)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def serving_model_config():
    """The serving-benchmark model configuration (single source of truth —
    tools/stage_bench.py mirrors this workload)."""
    from dldkd_tpu.config import ModelConfig

    return ModelConfig(
        visual_input_size=D_STUDENT, query_input_size=D_QUERY,
        inheritance_hidden=384, exploration_hidden=384,
        max_ctx_l=L_FRAMES, max_desc_l=L_TOKENS, n_heads=4,
        double_branch=True, label_style="soft",
        dtype="bfloat16", matmul_precision="default",
    )


def bench_tpu():
    import os

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/dldkd_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

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
    mcfg = serving_model_config()
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
    # Serving posture: the corpus index is bf16 device-resident (built once,
    # searched many times); queries arrive f32 from the upstream text
    # featurizer, packed on the 8-token kernel grid (see
    # ingest.pack_query_rows pad_to_multiple, the serving packing).
    @functools.partial(
        jax.jit,
        out_shardings=(corpus_sh, corpus_sh, rep, rep, rep))
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
    vfeats, vmask, qfeats, qmask, gt = jax.block_until_ready(
        make_data(jax.random.PRNGKey(0)))
    params = jax.device_put(params, rep)
    jax.block_until_ready(params)
    log(f"on-device data gen + param staging: {time.time() - t0:.1f}s "
        f"({(vfeats.nbytes + qfeats.nbytes) / 1e9:.2f} GB device-resident)")

    from dldkd_tpu.ops.fast_eval import (encode_context_best,
                                         encode_context_q8,
                                         encode_query_best)

    def make_full_eval(quantized):
        """One jitted embed+score+rank program; quantized=True is the int8
        serving path (2x MXU rate), False the exact-bf16 path.

        The single-device int8 path is the round-4 q8 flow: the context
        towers EMIT the int8 index (kernel epilogue — half the bf16 HBM
        write), one int8 transpose builds the scoring layout, and scoring
        consumes it directly — the per-branch corpus-sized
        normalize+quantize pre-pass of the old flow is gone."""
        if quantized and n_dev == 1:
            from dldkd_tpu.ops.pallas.sim_max import build_q8_index
            from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

            @functools.partial(jax.jit, static_argnums=(0,))
            def full_eval_q8(model, params, vfeats, vmask, qfeats, qmask,
                             gt, salt):
                params = jax.tree.map(lambda p: p + salt, params)
                q8_i, q8_e = encode_context_q8(params, mcfg, vfeats, vmask)
                ctx_t_i, bias = build_q8_index(q8_i, vmask)
                ctx_t_e, _ = build_q8_index(q8_e, vmask)
                qi, qe = encode_query_best(params, mcfg, qfeats, qmask)
                fused = (0.7 * clip_scores_maxpool_pre8(qi, ctx_t_i, bias)
                         + 0.3 * clip_scores_maxpool_pre8(qe, ctx_t_e, bias))
                return rank_of_gt(fused, gt)

            return full_eval_q8

        score = functools.partial(clip_scores_maxpool, quantized=quantized)
        if n_dev > 1:
            # pallas_call does not auto-partition under GSPMD: the scoring
            # AND context-tower kernels run per-device over the
            # video-sharded corpus under shard_map, queries replicated
            # (same layout as parallel.eval_shard)
            from jax import shard_map

            score_fn = shard_map(
                score, mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(None, DATA_AXIS), check_vma=False)
            encode_ctx = shard_map(
                lambda p, f, m: encode_context_best(p, mcfg, f, m),
                mesh=mesh, in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(DATA_AXIS), P(DATA_AXIS)), check_vma=False)
        else:
            score_fn = score
            encode_ctx = lambda p, f, m: encode_context_best(p, mcfg, f, m)

        @functools.partial(jax.jit, static_argnums=(0,), donate_argnums=())
        def full_eval(model, params, vfeats, vmask, qfeats, qmask, gt, salt):
            # the salt perturbs the PARAMETERS, making every invocation a
            # distinct computation with distinct results so no layer (XLA,
            # runtime, tunnel) can serve a cached answer — while the inputs
            # stay fixed, exactly like production serving (corpus and query
            # stream don't change when the model is redeployed). Salting
            # the 1.5 GB inputs instead would add ~5 ms of HBM passes.
            params = jax.tree.map(lambda p: p + salt, params)
            ctx_i, ctx_e = encode_ctx(params, vfeats, vmask)
            qi, qe = encode_query_best(params, mcfg, qfeats, qmask)
            fused = (0.7 * score_fn(qi, ctx_i, vmask)
                     + 0.3 * score_fn(qe, ctx_e, vmask))
            return rank_of_gt(fused, gt)

        return full_eval

    # NOTE: the experimental axon platform's block_until_ready does not
    # actually block, so every timed region ends with the (44 KB) rank
    # fetch to host — that forces completion of the whole pipeline. The
    # ~27 ms tunnel round-trip is amortized by queueing all reps (dispatch
    # is async) and fetching once at the end.
    out = {}
    for label, quantized in (("int8", True), ("exact_bf16", False)):
        full_eval = make_full_eval(quantized)
        if quantized and n_dev == 1:
            # The int8 eval program is the ONE program the platform's HLO
            # cache never persists (60-130 s compile per fresh process,
            # BENCHMARKS.md) — route it through the executable-
            # serialization cache instead (proven on this platform;
            # utils/aot_cache). A fresh process loads it in ~1 s; any
            # cache failure degrades to the normal compile.
            from dldkd_tpu.utils import aot_cache

            t0 = time.time()
            try:
                full_eval = aot_cache.cached_compile(
                    full_eval,
                    (model, params, vfeats, vmask, qfeats, qmask, gt,
                     jnp.float32(0.0)),
                    name="bench_eval_q8",
                    parts=[repr(mcfg), n_vid_pad, n_q_pad,
                           aot_cache.file_fingerprint(__file__)],
                    static_idx=(0,))
                log(f"[{label}] program ready in {time.time() - t0:.1f}s "
                    f"(aot executable cache)")
            except Exception as e:
                log(f"aot executable cache unavailable "
                    f"({str(e)[:120]}); plain jit")
        t0 = time.time()
        ranks_np = np.asarray(full_eval(model, params, vfeats, vmask,
                                        qfeats, qmask, gt, jnp.float32(0.0)))
        log(f"[{label}] first run (incl. compile): {time.time() - t0:.1f}s")
        # BEST of 3 queued-rep blocks: a single block occasionally lands in
        # a host/tunnel interference window (one r5 run measured this very
        # program at 131 ms/rep vs its true ~44 — a 3x swing steady-state
        # reps can't explain) and the driver records whatever one run says
        reps, dt = 10, float("inf")
        for _ in range(3):
            t0 = time.time()
            for r in range(reps):
                ranks = full_eval(model, params, vfeats, vmask, qfeats,
                                  qmask, gt, jnp.float32(1e-4 * (r + 1)))
            ranks_np = np.asarray(ranks)
            dt = min(dt, (time.time() - t0) / reps)
        ranks_np = ranks_np[:N_QUERIES]
        sumr = sum(100.0 * (ranks_np <= k).mean() for k in (1, 5, 10, 100))
        qps = N_QUERIES / dt
        log(f"[{label}] tpu steady-state full eval (embed+score+rank, "
            f"fused 2-branch): {dt:.2f}s -> {qps:.0f} queries/sec "
            f"(random-data sumr {sumr:.1f})")
        out[label] = qps
    return out


def bench_tpu_train(n_steps=30, dtype="float32", stacked=False,
                    rng_impls=("threefry2x32",), also_scan=False):
    """Our jitted train step at TVR scale, bsz 128 videos / 256 queries
    (2 captions per video), soft labels, BertAdam.

    dtype='float32': the parity config (f32 towers, matmul precision
    pinned 'highest' — the numerics the golden tests certify).
    dtype='bfloat16': the speed config (bf16 towers, f32 losses/params,
    default MXU precision) — same knob as --dtype bfloat16.
    stacked=True: both branches' towers as one vmapped computation
    (--stacked_towers; see models/stacked.py).
    rng_impls: PRNG implementations to time. 'rbg' is the TPU hardware
    RNG (--rng_impl rbg); threefry bit generation for the dropout masks
    runs on the VPU (~2.9 ms of the forward — tools/train_bench.py has
    the breakdown) and rbg recovers ~1.6 ms of it end to end (10.0 ->
    8.4 ms, 1.18x). Host throttling on this box swings SEQUENTIAL config
    timings by +-30%, so when BOTH impls are requested they are timed as
    INTERLEAVED same-process blocks (3 rounds each, best-of) — the only
    protocol that resolves a sub-30% delta here; returns {impl: sps}.
    Steps are queued asynchronously and the final loss fetch forces
    completion (see bench_tpu's timing note)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dldkd_tpu.config import ModelConfig, TrainConfig
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.models.objective import LossScalars
    from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
    from dldkd_tpu.train import train_step

    precision = "highest" if dtype == "float32" else "default"
    jax.config.update("jax_default_matmul_precision", precision)
    bsz, n_q = 128, 256
    mcfg = ModelConfig(
        visual_input_size=D_STUDENT, query_input_size=D_QUERY,
        inheritance_hidden=384, exploration_hidden=384,
        max_ctx_l=L_FRAMES, max_desc_l=L_TOKENS, n_heads=4,
        double_branch=True, label_style="soft",
        use_hard_negative=True, hard_pool_size=20,
        dtype=dtype, matmul_precision=precision)
    tcfg = dataclasses.replace(TrainConfig(), stacked_towers=stacked)
    model = DLDKD(config=mcfg)

    @jax.jit
    def make_batch(key):
        kv, kt, kq, kc = jax.random.split(key, 4)
        return {
            "student_videos": jax.random.normal(
                kv, (bsz, L_FRAMES, D_STUDENT), jnp.float32),
            "student_videos_mask": jnp.ones((bsz, L_FRAMES), jnp.float32),
            "teacher_videos": jax.random.normal(
                kt, (bsz, L_FRAMES, 512), jnp.float32),
            "student_text": jax.random.normal(
                kq, (n_q, L_TOKENS, D_QUERY), jnp.float32),
            "student_text_mask": jnp.ones((n_q, L_TOKENS), jnp.float32),
            "teacher_text": jax.random.normal(kc, (n_q, 512), jnp.float32),
            "text_labels": jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), 2),
        }

    batch = jax.block_until_ready(make_batch(jax.random.PRNGKey(0)))
    scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8),
                          jnp.float32(0.8))

    from dldkd_tpu.train import make_train_rng

    def fresh_state():
        params = model.init(jax.random.PRNGKey(1),
                            batch["student_videos"],
                            batch["student_videos_mask"],
                            batch["student_text"],
                            batch["student_text_mask"])
        opt = bert_adam(
            tcfg.lr, schedules.make_lr_schedule("warmup_linear", 0.01, 1e5),
            weight_decay=tcfg.wd, wd_mask=default_wd_mask(params))
        return opt, params, opt.init(params)

    rounds = 3 if len(rng_impls) > 1 else 1
    state, keys, used = {}, {}, {}
    for impl in rng_impls:
        tag = (f"{dtype}{'+stacked' if stacked else ''}"
               f"{'+rbg' if impl != 'threefry2x32' else ''}")
        opt, params, opt_state = fresh_state()
        # keys precomputed OUTSIDE the timed loops: the per-step fold_in
        # is two eager dispatches whose host cost would otherwise pollute
        # the step timing (the driver's fold_in overlaps device work,
        # which the queued bench loop can't reproduce)
        root = make_train_rng(2, impl)
        keys[impl] = [jax.random.fold_in(root, i)
                      for i in range(rounds * n_steps + 1)]
        jax.block_until_ready(keys[impl][-1])
        t0 = time.time()
        params, opt_state, loss_dict = train_step(
            model, mcfg, tcfg, opt, params, opt_state, batch,
            keys[impl][0], scalars)
        first = float(loss_dict["loss_overall"])
        log(f"[{tag}] train first step (incl. compile): "
            f"{time.time() - t0:.1f}s (loss {first:.3f})")
        state[impl] = (tag, opt, params, opt_state)
        used[impl] = 1

    best = {impl: 0.0 for impl in rng_impls}
    for _ in range(rounds):
        for impl in rng_impls:
            tag, opt, params, opt_state = state[impl]
            k0 = used[impl]
            t0 = time.time()
            for i in range(n_steps):
                params, opt_state, loss_dict = train_step(
                    model, mcfg, tcfg, opt, params, opt_state, batch,
                    keys[impl][k0 + i], scalars)
            final = float(loss_dict["loss_overall"])  # forces the queue
            dt = (time.time() - t0) / n_steps
            assert np.isfinite(final)
            used[impl] += n_steps
            state[impl] = (tag, opt, params, opt_state)
            best[impl] = max(best[impl], 1.0 / dt)
            log(f"[{tag}] tpu train step (bsz {bsz}): {dt * 1e3:.1f} ms "
                f"-> {1.0 / dt:.1f} steps/sec (final loss {final:.3f})")

    if also_scan:
        try:
            _scan_device_bound(n_steps, rng_impls, state, batch, scalars,
                               model, mcfg, tcfg, best)
        except Exception as e:  # the python-loop rows stand on their own
            log(f"scan timing failed: {e}")

    if len(rng_impls) == 1 and not also_scan:
        return best[rng_impls[0]]
    return best


def _scan_device_bound(n_steps, rng_impls, state, batch, scalars,
                       model, mcfg, tcfg, best):
    """The DEVICE-BOUND step: n_steps as ONE lax.scan program, so the
    per-step host dispatch (~10 ms through the tunnel when the CPU
    throttles — CLAUDE.md) is out of the measurement entirely. Timed for
    the LAST impl (the headline config of the call); the result lands in
    best['<impl>_scanned']."""
    import jax
    import jax.numpy as jnp

    from dldkd_tpu.train import make_train_rng, train_step_impl

    impl = rng_impls[-1]
    tag, opt, params, opt_state = state[impl]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scan_steps(p, s, b, root):
        def body(carry, i):
            p, s = carry
            p, s, d = train_step_impl(
                model, mcfg, tcfg, opt, p, s, b,
                jax.random.fold_in(root, i), scalars)
            return (p, s), d["loss_overall"]

        (p, s), losses = jax.lax.scan(body, (p, s), jnp.arange(n_steps))
        return p, s, losses

    root = make_train_rng(7, impl)
    p4 = jax.tree.map(jnp.copy, params)
    s4 = opt.init(p4)
    t0 = time.time()
    p4, s4, losses = scan_steps(p4, s4, batch, root)
    float(np.asarray(losses[-1]))  # forces the queue
    log(f"[{tag}] scan compile+first ({n_steps} steps as one program): "
        f"{time.time() - t0:.1f}s")
    t0 = time.time()
    p4, s4, losses = scan_steps(p4, s4, batch, root)
    final = float(np.asarray(losses[-1]))
    assert np.isfinite(final)
    dt = (time.time() - t0) / n_steps
    log(f"[{tag}] SCANNED step: {dt * 1e3:.2f} ms -> "
        f"{1.0 / dt:.1f} steps/sec (device-bound)")
    best[f"{impl}_scanned"] = 1.0 / dt


def _reference_model():
    """The reference torch DLDKD at the full TVR configuration."""
    sys.path.insert(0, "/root/reference")
    from dldkd_tpu.convert import _ensure_fake_easydict

    _ensure_fake_easydict()
    from easydict import EasyDict as edict
    from method.model import DLDKD as TorchDLDKD

    cfg = edict(visual_input_size=D_STUDENT, query_input_size=D_QUERY,
                inheritance_hidden=384, exploration_hidden=384,
                max_ctx_l=L_FRAMES, max_desc_l=L_TOKENS, n_heads=4,
                input_drop=0.2, drop=0.2, initializer_range=0.02,
                margin=0.1, use_hard_negative=True, hard_pool_size=20,
                label_style="soft")  # label_style: SURVEY S2.10.1 fix
    opt = edict(double_branch=True, kl_intra_weight=0.1,
                inher_nce_weight=0.04, explore_nce_weight=0.04,
                collection="tvr", alpha=0.8, belta=0.8)
    return TorchDLDKD(cfg, opt)


def bench_reference_eval(sample_queries=250):
    """The reference's own eval flow on torch-CPU at FULL corpus scale:
    compute_context_info (200-video batches, eval.py:114-175), then
    compute_query2ctx_info (50-query batches scored against the whole
    corpus via model.get_sim_scores, eval.py:177-219), then the eval_q2m
    argsort ranking loop (eval.py:59-94) — counted ONCE on the fused
    scores although the reference ranks all three matrices (favors the
    baseline). Only the query loop is subsampled; it is exactly linear,
    so qps extrapolates as N_QUERIES / (t_ctx + t_query/sample * N)."""
    import torch

    model = _reference_model()
    model.eval()
    rng = np.random.RandomState(0)
    vfeats = torch.from_numpy(
        rng.rand(N_VIDEOS, L_FRAMES, D_STUDENT).astype(np.float32))
    vmask = torch.ones(N_VIDEOS, L_FRAMES)
    qfeats = torch.from_numpy(
        rng.rand(sample_queries, L_TOKENS, D_QUERY).astype(np.float32))
    qmask = torch.ones(sample_queries, L_TOKENS)
    gt = rng.randint(0, N_VIDEOS, sample_queries)

    with torch.no_grad():
        # corpus embed, batches of eval_context_bsz=200
        t0 = time.time()
        ctx_i, ctx_e = [], []
        for s in range(0, N_VIDEOS, 200):
            ci, ce = model.encode_context(vfeats[s:s + 200],
                                          vmask[s:s + 200])
            ctx_i.append(ci)
            ctx_e.append(ce)
        ctx_i, ctx_e = torch.cat(ctx_i), torch.cat(ctx_e)
        t_ctx = time.time() - t0

        # query batches of eval_query_bsz=50 vs the WHOLE corpus
        t0 = time.time()
        fused_rows = []
        for s in range(0, sample_queries, 50):
            qi, qe = model.encode_query(qfeats[s:s + 50], qmask[s:s + 50])
            si, _ = model.get_sim_scores(qi, ctx_i, vmask)
            se, _ = model.get_sim_scores(qe, ctx_e, vmask)
            fused_rows.append((0.7 * si + 0.3 * se).numpy())  # eval.py:254
        fused = np.concatenate(fused_rows)
        for i in range(sample_queries):  # eval_q2m ranking loop
            ind = np.argsort(-fused[i])
            int(np.where(ind == gt[i])[0][0])
        t_q = time.time() - t0

    total = t_ctx + t_q / sample_queries * N_QUERIES
    qps = N_QUERIES / total
    log(f"reference eval (torch-cpu, real model, full {N_VIDEOS}-video "
        f"corpus): ctx embed {t_ctx:.1f}s + {t_q:.1f}s for "
        f"{sample_queries} queries -> extrapolated {total:.1f}s for "
        f"{N_QUERIES} queries = {qps:.2f} queries/sec")
    return qps


def bench_reference_train(n_steps=3):
    """The reference's own train step on torch-CPU: DLDKD.forward (incl.
    its per-row Python loss loops), backward, BertAdam.step — the
    method/train.py:141-151 hot loop at bsz 128 / 256 captions."""
    import torch

    model = _reference_model()  # also puts /root/reference on sys.path
    from method.optimization import BertAdam

    model.train()
    bsz, n_q = 128, 256
    rng = np.random.RandomState(1)
    batch = {
        "student_videos": torch.from_numpy(
            rng.randn(bsz, L_FRAMES, D_STUDENT).astype(np.float32)),
        "student_videos_mask": torch.ones(bsz, L_FRAMES),
        "teacher_videos": torch.from_numpy(
            rng.randn(bsz, L_FRAMES, 512).astype(np.float32)),
        "student_text": torch.from_numpy(
            rng.randn(n_q, L_TOKENS, D_QUERY).astype(np.float32)),
        "student_text_mask": torch.ones(n_q, L_TOKENS),
        "teacher_text": torch.from_numpy(
            rng.randn(n_q, 512).astype(np.float32)),
        "text_labels": [i // 2 for i in range(n_q)],
    }
    optimizer = BertAdam(model.parameters(), lr=2.5e-4, warmup=0.01,
                         t_total=100000, schedule="warmup_linear",
                         weight_decay=0.01, max_grad_norm=1.0)
    times = []
    for step in range(n_steps + 1):
        t0 = time.time()
        optimizer.zero_grad()
        loss, _ = model(batch)
        loss.backward()
        optimizer.step()
        if step:  # first step warms allocator/threading
            times.append(time.time() - t0)
    dt = min(times)
    log(f"reference train step (torch-cpu, bsz {bsz}): {dt:.2f}s "
        f"-> {1.0 / dt:.2f} steps/sec")
    return 1.0 / dt


def bench_coldstart_fleet(replicas=2, n_videos=545):
    """Production replica cold start: one subprocess builds + saves a
    prewarmed index artifact (signature manifest, shared AOT executable
    cache), then `replicas` fresh processes each load it and serve.
    Returns p50/p95 process-start-to-first-result seconds plus the worst
    per-replica FIRST-SEARCH time — the framework-attributable number:
    with the prewarm manifest it is a pure executable-cache hit (~1-2 s,
    no compile), while start-to-first-result on this box is dominated by
    artifact load under the intermittent host throttle (BENCHMARKS.md
    round-5 fleet entry: 0.7-2.0 s first search vs 224-692 s loads at
    full TVR scale). Quarter-scale corpus keeps the driver's bench run
    bounded; the mitigation semantics (manifest adoption, no lowering in
    the replica) are scale-independent and pinned by
    tests/test_serving.py::test_prewarm_manifest_fleet_cold_start."""
    import os
    import subprocess

    proc = subprocess.run(
        [sys.executable, "-m", "dldkd_tpu.tools.coldstart_bench",
         "--policy", "fleet", "--replicas", str(replicas),
         "--n_videos", str(n_videos)],
        capture_output=True, text=True,
        # the drill itself budgets 1200 s PER process (populate +
        # replicas, tools/coldstart_bench run_once) — the outer bound must
        # cover the whole fleet or a legitimately slow (throttled) drill
        # gets killed mid-run and the bench row silently reads as error
        timeout=(1 + replicas) * 1200 + 300,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if proc.returncode:
        raise RuntimeError(f"fleet drill failed: {proc.stderr[-300:]}")
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    searches = [r["first_search_s"] for r in res.get("replicas", [])
                if "first_search_s" in r]
    out = {"p50_first_result_s": res.get("p50_first_result_s"),
           "p95_first_result_s": res.get("p95_first_result_s"),
           "max_first_search_s": max(searches) if searches else None,
           "replicas": replicas, "n_videos": n_videos,
           "unit": "sec (process start -> first search result)",
           "config": "prewarmed index artifact + shared AOT executable "
                     "cache (tools/coldstart_bench --policy fleet)"}
    if out["p50_first_result_s"] is None:
        raise RuntimeError(f"fleet drill returned no replica timings: "
                           f"{str(res)[:300]}")
    return out


def _retry(fn, attempts=2):
    """This platform's remote AOT compile helper intermittently fails
    (HTTP 500) on fresh compiles; one retry usually succeeds (and cached
    programs never hit the helper at all)."""
    for i in range(attempts):
        try:
            return fn()
        except RuntimeError as e:
            if i + 1 == attempts:
                raise
            log(f"transient failure ({str(e)[:120]}); retrying")
            time.sleep(5)


def main():
    import os

    # The torch-CPU baseline scales with the HOST's core count (round 3
    # measured 7.45 q/s on a multi-core box; a 1-core box measures ~0.4).
    # Record the core count so vs_baseline is interpretable, and shrink
    # the (exactly linear) baseline sampling on starved hosts so the
    # round's bench run stays bounded.
    n_cores = os.cpu_count() or 1
    baseline_queries = 250 if n_cores >= 4 else 50
    baseline_steps = 3 if n_cores >= 4 else 2

    eval_qps = _retry(bench_tpu)
    f32_res = _retry(functools.partial(bench_tpu_train, dtype="float32",
                                       also_scan=True))
    tpu_sps = f32_res["threefry2x32"]
    f32_scan = f32_res.get("threefry2x32_scanned")
    tpu_sps_bf16 = _retry(functools.partial(bench_tpu_train,
                                            dtype="bfloat16"))
    # stacked-threefry vs stacked-rbg, INTERLEAVED in one process: host
    # throttling swings sequential config timings +-30%, so this is the
    # only protocol whose stacked-vs-rbg delta is trustworthy
    sps_ab = _retry(functools.partial(
        bench_tpu_train, dtype="bfloat16", stacked=True,
        rng_impls=("threefry2x32", "rbg"), also_scan=True))
    tpu_sps_stacked = sps_ab["threefry2x32"]
    tpu_sps_speed = sps_ab["rbg"]
    speed_scan = sps_ab.get("rbg_scanned")
    # production replica-fleet cold start (subprocesses; serial TPU use)
    try:
        fleet_out = bench_coldstart_fleet(replicas=2)
    except Exception as e:  # never let the extra metric sink the headline
        log(f"fleet cold-start drill failed: {e}")
        fleet_out = {"error": str(e)[:200]}
    # corpus-streaming eval at 8x TVR scale (raw-bf16 HBM index; the
    # corpus-resident design can't hold this) — lazy import: stream_bench
    # imports this module's constants
    try:
        from dldkd_tpu.tools.stream_bench import bench_hbm_raw

        stream = _retry(functools.partial(bench_hbm_raw, 8, reps=4))
        stream_out = {"value": round(stream["qps"], 1),
                      "unit": "queries/sec",
                      "videos": stream["videos"], "scale": stream["scale"]}
    except Exception as e:  # never let the extra metric sink the headline
        log(f"streaming bench failed: {e}")
        stream_out = {"error": str(e)[:200]}
    ref_qps = bench_reference_eval(sample_queries=baseline_queries)
    ref_sps = bench_reference_train(n_steps=baseline_steps)
    print(json.dumps({
        # headline: the int8 SERVING path vs the reference's exact-f32
        # torch-CPU eval — a cross-precision ratio by design (each stack's
        # deployed configuration); "exact_bf16" is the same-rank exact
        # scoring path for a like-for-like precision comparison
        "metric": "t2v_retrieval_throughput",
        "value": round(eval_qps["int8"], 1),
        "unit": "queries/sec",
        "vs_baseline": round(eval_qps["int8"] / ref_qps, 1),
        "note": "serving (int8 scoring) vs reference exact-f32 torch-CPU",
        "host_cpu_cores": n_cores,  # the torch baseline scales with this
        "exact_bf16": {
            "value": round(eval_qps["exact_bf16"], 1),
            "vs_baseline": round(eval_qps["exact_bf16"] / ref_qps, 1),
        },
        "train": {
            "metric": "train_step_throughput",
            "value": round(tpu_sps, 2),
            "unit": "steps/sec",
            "vs_baseline": round(tpu_sps / ref_sps, 1),
            "config": "f32 parity (matmul highest)",
        },
        "train_bf16": {
            "metric": "train_step_throughput",
            "value": round(tpu_sps_bf16, 2),
            "unit": "steps/sec",
            "vs_baseline": round(tpu_sps_bf16 / ref_sps, 1),
            "config": "bf16 towers, f32 losses (--dtype bfloat16)",
        },
        "train_bf16_stacked": {
            "metric": "train_step_throughput",
            "value": round(tpu_sps_stacked, 2),
            "unit": "steps/sec",
            "vs_baseline": round(tpu_sps_stacked / ref_sps, 1),
            "config": "bf16 + both branches as one vmapped computation "
                      "(--stacked_towers)",
        },
        "train_speed": {
            "metric": "train_step_throughput",
            "value": round(tpu_sps_speed, 2),
            "unit": "steps/sec",
            "vs_baseline": round(tpu_sps_speed / ref_sps, 1),
            "config": "the full speed stack: bf16 + stacked towers + TPU "
                      "hardware RNG (--dtype bfloat16 --stacked_towers "
                      "--rng_impl rbg); timed interleaved with the "
                      "stacked config (best of 3 blocks each)",
        },
        "train_scan": {
            # the DEVICE-BOUND step: 30 steps as one lax.scan program —
            # no per-step host dispatch (BENCHMARKS.md training roofline)
            "metric": "train_step_throughput_device_bound",
            "unit": "steps/sec",
            "f32_parity": (round(f32_scan, 2) if f32_scan else None),
            "speed_stack": (round(speed_scan, 2) if speed_scan else None),
        },
        "coldstart_fleet": fleet_out,
        "streaming_8x": stream_out,
    }))


if __name__ == "__main__":
    main()
