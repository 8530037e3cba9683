"""Per-stage TRAIN-step microbenchmark (TPU, TVR scale, bsz 128).

Splits the jitted train step (train.train_step: fwd+bwd -> global-norm
clip -> BertAdam update, one program) into separately-jitted stages and
times each, so optimization work can be aimed at the actual bottleneck:

  fwd        forward only (compute_losses, train=True)
  fwd+bwd    value_and_grad of the same loss
  update     global-norm clip + BertAdam update + apply, on FIXED grads
  full       the shipped single-program train_step (the honest number)

The per-stage sum exceeds the full step when XLA fuses across the stage
boundaries inside the single program (it does: bwd's last gradients feed
the optimizer's elementwise updates without a round trip to HBM), so
stage times are directional, not additive.

Workload and model config mirror bench.py's bench_tpu_train exactly
(bsz 128 videos / 256 captions, soft labels, hard negatives, BertAdam);
measurement follows the BENCHMARKS.md protocol: device values passed as
arguments (never closed over — closure constants lower through the
tunnel), queued async reps chained through a carried dependency, one
small host fetch to force the queue (block_until_ready does not block on
this platform).

Usage: python -m dldkd_tpu.tools.train_bench [--reps 30]
           [--dtype float32|bfloat16] [--stacked]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--stacked", action="store_true",
                    help="--stacked_towers (vmapped dual-branch towers)")
    ap.add_argument("--rng", default="threefry2x32",
                    choices=("threefry2x32", "rbg"),
                    help="PRNG implementation for the dropout streams "
                         "(rbg = TPU hardware RNG; different streams, "
                         "same distribution)")
    ap.add_argument("--scan", action="store_true",
                    help="also time a lax.scan of --reps steps as ONE "
                         "program: the dispatch-free device-bound step "
                         "time (per-step host dispatch dominates the "
                         "python-loop numbers when this box's CPU is "
                         "throttled — CLAUDE.md)")
    ap.add_argument("--cost", action="store_true",
                    help="print XLA's cost analysis of the compiled full "
                         "train step (flops / bytes accessed) plus the "
                         "roofline floors they imply at MXU peak and the "
                         "measured HBM bandwidth (BENCHMARKS.md)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    try:
        import bench
    except ImportError as e:
        raise SystemExit("run from the repo root (train_bench mirrors "
                         f"bench.py's training workload): {e}")

    from dldkd_tpu.config import ModelConfig, TrainConfig
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.models.objective import LossScalars, compute_losses
    from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
    from dldkd_tpu.train import train_step

    precision = "highest" if args.dtype == "float32" else "default"
    jax.config.update("jax_default_matmul_precision", precision)
    jax.config.update("jax_default_prng_impl", args.rng)
    bsz, n_q = 128, 256
    mcfg = ModelConfig(
        visual_input_size=bench.D_STUDENT, query_input_size=bench.D_QUERY,
        inheritance_hidden=384, exploration_hidden=384,
        max_ctx_l=bench.L_FRAMES, max_desc_l=bench.L_TOKENS, n_heads=4,
        double_branch=True, label_style="soft",
        use_hard_negative=True, hard_pool_size=20,
        dtype=args.dtype, matmul_precision=precision)
    tcfg = dataclasses.replace(TrainConfig(), stacked_towers=args.stacked)
    model = DLDKD(config=mcfg)

    @jax.jit
    def make_batch(key):
        kv, kt, kq, kc = jax.random.split(key, 4)
        return {
            "student_videos": jax.random.normal(
                kv, (bsz, bench.L_FRAMES, bench.D_STUDENT), jnp.float32),
            "student_videos_mask": jnp.ones((bsz, bench.L_FRAMES),
                                            jnp.float32),
            "teacher_videos": jax.random.normal(
                kt, (bsz, bench.L_FRAMES, 512), jnp.float32),
            "student_text": jax.random.normal(
                kq, (n_q, bench.L_TOKENS, bench.D_QUERY), jnp.float32),
            "student_text_mask": jnp.ones((n_q, bench.L_TOKENS),
                                          jnp.float32),
            "teacher_text": jax.random.normal(kc, (n_q, 512), jnp.float32),
            "text_labels": jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), 2),
        }

    batch = jax.block_until_ready(make_batch(jax.random.PRNGKey(0)))
    params = model.init(jax.random.PRNGKey(1),
                        batch["student_videos"],
                        batch["student_videos_mask"],
                        batch["student_text"], batch["student_text_mask"])
    opt = bert_adam(tcfg.lr,
                    schedules.make_lr_schedule("warmup_linear", 0.01, 1e5),
                    weight_decay=tcfg.wd, wd_mask=default_wd_mask(params))
    opt_state = opt.init(params)
    scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8),
                          jnp.float32(0.8))
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    tag = f"{args.dtype}{'+stacked' if args.stacked else ''}"
    log(f"[{tag}] bsz {bsz}, {n_params / 1e6:.1f}M params, "
        f"reps {args.reps}")

    def loss_fn(p, b, rng):
        return compute_losses(model, p, b, rng, mcfg, tcfg, scalars,
                              train=True)

    # reps chain through `carry` (the previous rep's scalar folds into the
    # rng) so queued steps are truly dependent and none can be elided
    @jax.jit
    def fwd(p, b, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(2),
                                 (carry * 1e3).astype(jnp.int32) % 1000)
        loss, _ = loss_fn(p, b, rng)
        return loss

    @jax.jit
    def fwdbwd(p, b, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(2),
                                 (carry * 1e3).astype(jnp.int32) % 1000)
        (loss, _), grads = jax.value_and_grad(
            lambda q: loss_fn(q, b, rng), has_aux=True)(p)
        return loss + optax.global_norm(grads)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update(p, s, g):
        gnorm = optax.global_norm(g)
        scale = jnp.minimum(tcfg.grad_clip / (gnorm + 1e-6), 1.0)
        g = jax.tree.map(lambda x: x * scale, g)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s

    def force(x):
        return float(np.asarray(x))

    def timed_scalar(fn):
        out = fn(jnp.float32(0.0))
        force(out)  # compile + warm
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(out)
        force(out)
        return (time.time() - t0) / args.reps

    @jax.jit
    def fwd_nodrop(p, b, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(2),
                                 (carry * 1e3).astype(jnp.int32) % 1000)
        loss, _ = compute_losses(model, p, b, rng, mcfg, tcfg, scalars,
                                 train=False)
        return loss

    t_fwd = timed_scalar(lambda c: fwd(params, batch, c))
    log(f"  fwd only:        {t_fwd * 1e3:7.2f} ms")
    t_fnd = timed_scalar(lambda c: fwd_nodrop(params, batch, c))
    log(f"  fwd, no dropout: {t_fnd * 1e3:7.2f} ms  "
        f"(dropout+RNG ~{(t_fwd - t_fnd) * 1e3:.2f})")
    t_fb = timed_scalar(lambda c: fwdbwd(params, batch, c))
    log(f"  fwd+bwd:         {t_fb * 1e3:7.2f} ms  "
        f"(bwd ~{(t_fb - t_fwd) * 1e3:.2f})")

    @jax.jit
    def fwdbwd_nodrop(p, b, carry):
        rng = jax.random.fold_in(jax.random.PRNGKey(2),
                                 (carry * 1e3).astype(jnp.int32) % 1000)
        (loss, _), grads = jax.value_and_grad(
            lambda q: compute_losses(model, q, b, rng, mcfg, tcfg, scalars,
                                     train=False), has_aux=True)(p)
        return loss + optax.global_norm(grads)

    t_fbn = timed_scalar(lambda c: fwdbwd_nodrop(params, batch, c))
    log(f"  fwd+bwd, no dropout: {t_fbn * 1e3:5.2f} ms  "
        f"(dropout total ~{(t_fb - t_fbn) * 1e3:.2f})")

    (_, _), grads0 = jax.jit(jax.value_and_grad(
        lambda p, b: loss_fn(p, b, jax.random.PRNGKey(2)),
        has_aux=True))(params, batch)
    p2 = jax.tree.map(jnp.copy, params)
    s2 = jax.tree.map(jnp.copy, opt_state)
    p2, s2 = update(p2, s2, grads0)
    force(jax.tree.leaves(p2)[0][0, 0])  # warm
    t0 = time.time()
    for _ in range(args.reps):
        p2, s2 = update(p2, s2, grads0)
    force(jax.tree.leaves(p2)[0][0, 0])
    t_up = (time.time() - t0) / args.reps
    log(f"  clip+update:     {t_up * 1e3:7.2f} ms  (fixed grads)")

    p3, s3 = params, opt_state
    p3, s3, _ = train_step(model, mcfg, tcfg, opt, p3, s3, batch,
                           jax.random.PRNGKey(3), scalars)
    force(jax.tree.leaves(p3)[0][0, 0])  # warm/compile
    t0 = time.time()
    for i in range(args.reps):
        p3, s3, _ = train_step(model, mcfg, tcfg, opt, p3, s3, batch,
                               jax.random.PRNGKey(4 + i), scalars)
    force(jax.tree.leaves(p3)[0][0, 0])
    t_full = (time.time() - t0) / args.reps
    log(f"  FULL step:       {t_full * 1e3:7.2f} ms  "
        f"({1 / t_full:.1f} steps/sec)")
    log(f"  stage sum {1e3 * (t_fb + t_up):.2f} ms vs full "
        f"{t_full * 1e3:.2f} ms")

    if args.cost:
        # XLA's own accounting of the single-program step — the honest
        # roofline inputs (hand FLOP counts miss the rematerialized bwd
        # and the fused optimizer). cost_analysis() reads the compiled
        # module, so these are THIS backend's fusion decisions.
        from dldkd_tpu.train import train_step_impl

        step = jax.jit(lambda p, s, b, rng: train_step_impl(
            model, mcfg, tcfg, opt, p, s, b, rng, scalars))
        ca = step.lower(params, opt_state, batch,
                        jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        # 'bytes accessed' is HLO-level operand+output bytes — an UPPER
        # BOUND on HBM traffic, not a floor (fusion operands served from
        # VMEM are counted; measured steps beat it by 3-4x)
        log(f"  cost analysis:   {flops / 1e9:.1f} GFLOP, "
            f"{byts / 1e9:.2f} GB HLO-bytes-accessed (HBM upper bound)")
        # v5e MXU peak 197 TFLOP/s bf16 (measured ~176 in serving —
        # BENCHMARKS.md roofline); matmul_precision=highest runs f32
        # matmuls as 6 bf16 passes -> ~33 TFLOP/s effective peak
        mxu = 197e12 if args.dtype == "bfloat16" else 197e12 / 6
        log(f"  MXU floor {flops / mxu * 1e3:.2f} ms vs measured FULL "
            f"{t_full * 1e3:.2f} ms "
            f"({flops / mxu / t_full * 100:.0f}% of MXU ceiling)")

    if args.scan:
        from dldkd_tpu.train import train_step_impl

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scan_steps(p, s, b, root):
            def body(carry, i):
                p, s = carry
                p, s, d = train_step_impl(
                    model, mcfg, tcfg, opt, p, s, b,
                    jax.random.fold_in(root, i), scalars)
                return (p, s), d["loss_overall"]

            (p, s), losses = jax.lax.scan(body, (p, s),
                                          jnp.arange(args.reps))
            return p, s, losses

        # params/opt_state were donated by the FULL-step loop; p3 holds
        # the live post-loop buffers
        p4 = jax.tree.map(jnp.copy, p3)
        s4 = opt.init(p4)
        t0 = time.time()
        p4, s4, losses = scan_steps(p4, s4, batch, jax.random.PRNGKey(5))
        force(losses[-1])
        log(f"  scan compile+first ({args.reps} steps as one program): "
            f"{time.time() - t0:.1f}s")
        t0 = time.time()
        p4, s4, losses = scan_steps(p4, s4, batch, jax.random.PRNGKey(6))
        force(losses[-1])
        t_scan = (time.time() - t0) / args.reps
        log(f"  SCANNED step:    {t_scan * 1e3:7.2f} ms  "
            f"({1 / t_scan:.1f} steps/sec, dispatch-free; python-loop "
            f"dispatch adds ~{(t_full - t_scan) * 1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
