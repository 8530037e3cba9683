"""Training driver.

Reference flow (method/train.py): epoch loop over shuffled video batches,
per-epoch distillation/alpha/belta decays, per-epoch validation retrieval,
best-SumR checkpointing, early stop, then test-split inference.

TPU structure: one jitted train step (forward + backward + BertAdam update)
over static-shape batches; host work is only batch gathering (overlapped via
device_prefetch), decay scalars, and logging. Decay scalars are traced
inputs, so nothing recompiles across epochs; flipping hard negatives at
hard_negative_start_epoch recompiles exactly once.

Run: python -m dldkd_tpu.train --collection tvr --root_path $root \
        --visual_feature i3d_resnet ... (same flags as the reference)
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dldkd_tpu import checkpoint as ckpt_lib
from dldkd_tpu.config import Config, ModelConfig, parse_args
from dldkd_tpu.data import (
    BigFile,
    TrainLoader,
    device_prefetch,
    pack_query_set,
    pack_train_dataset,
    pack_video_corpus,
    read_dict,
)
from dldkd_tpu.data.ingest import dataset_paths, read_video_ids
from dldkd_tpu.evaluate import run_retrieval_eval
from dldkd_tpu.models import DLDKD
from dldkd_tpu.models.objective import LossScalars, compute_losses
from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
from dldkd_tpu.utils import AverageMeter, MetricsWriter, make_code_zip, setup_logging

LOSS_KEYS = ("loss_overall", "inher_trip", "inher_nce", "explore_trip",
             "explore_nce", "kl", "kl_intra")

# multi-host preemption: agree on a stop step every N batches (see the
# allgather in the batch loop); single-process runs poll every step
PREEMPT_SYNC_STEPS = 32


def train_step_impl(model, mcfg: ModelConfig, tcfg, optimizer,
                    params, opt_state, batch, rng, scalars: LossScalars
                    ) -> Tuple[dict, dict, Dict[str, jnp.ndarray]]:
    """One unjitted optimization step; jitted below and re-jitted with
    mesh shardings by dldkd_tpu.parallel.train_dp."""

    def loss_fn(p):
        return compute_losses(model, p, batch, rng, mcfg, tcfg, scalars,
                              train=True)

    (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if tcfg.grad_clip > 0:
        # global-norm clip before the optimizer (reference train.py:149-150)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(tcfg.grad_clip / (gnorm + 1e-6), 1.0)
        grads = jax.tree.map(lambda g: g * scale, grads)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss_dict


# params/opt_state buffers are donated: the updated trees reuse their HBM
train_step = functools.partial(jax.jit, static_argnums=(0, 1, 2, 3),
                               donate_argnums=(4, 5))(train_step_impl)


def build_model_and_data(cfg: Config):
    """Load + pack datasets, resolve data-dependent model config.

    With cfg.data.pack_cache (default) the packed arrays come from the
    content-keyed cache (data/cache.py): run #2 mmaps them and never
    touches BigFile/HDF5."""
    paths = dataset_paths(cfg.data.root_path, cfg.data.collection,
                          cfg.data.visual_feature)
    if cfg.data.pack_cache:
        from dldkd_tpu.data import cache as pack_cache

        train_data = pack_cache.cached_train_pack(
            paths, cfg.data.max_ctx_l, cfg.data.max_desc_l)
        val_videos = pack_cache.cached_corpus_pack(
            paths, "val", cfg.data.max_ctx_l)
        val_queries = pack_cache.cached_query_pack(
            paths, "val", cfg.data.max_desc_l)
        # feature dim discovered from the packed arrays — same value the
        # BigFile header would give (reference train.py:286-289)
        visual_dim = int(train_data.videos.feats.shape[-1])
    else:
        visual_feats = BigFile(paths["visual_feat_dir"])
        video2frames = read_dict(paths["video2frames"])
        visual_dim = visual_feats.ndims
        train_data = pack_train_dataset(
            paths["cap_file"]["train"], visual_feats, video2frames,
            paths["text_feat"], paths["teacher_vid_feat"],
            paths["teacher_text_feat"],
            max_ctx_l=cfg.data.max_ctx_l, max_desc_l=cfg.data.max_desc_l)
        val_videos = pack_video_corpus(
            read_video_ids(paths["cap_file"]["val"]), visual_feats,
            video2frames, max_ctx_l=cfg.data.max_ctx_l)
        val_queries = pack_query_set(
            paths["cap_file"]["val"], paths["text_feat"],
            max_desc_l=cfg.data.max_desc_l)

    mcfg = cfg.model.replace(
        visual_input_size=visual_dim,               # discovered at runtime
        query_input_size=cfg.data.q_feat_size,      # (reference train.py:286-289)
        max_ctx_l=cfg.data.max_ctx_l,
        max_desc_l=cfg.data.max_desc_l,
    )
    return mcfg, train_data, val_videos, val_queries, paths


def make_train_rng(seed: int, impl: str = "threefry2x32"):
    """The training-stream root key (dropout masks, triplet negative
    sampling). 'threefry2x32' keeps the legacy uint32 (2,) key — the jax
    default and the checkpoint-compatible parity config. 'rbg' is the TPU
    hardware-RNG generator: threefry bit generation on the VPU otherwise
    costs ~2.9 ms of the forward; the measured interleaved A/B on the
    stacked-bf16 bsz-128 step is 10.0 -> 8.4 ms, 1.18x (BENCHMARKS.md;
    tools/train_bench.py). Same distributions, different streams —
    a speed knob like stacked_towers. Param init is NOT derived from this
    key (init_params below), so the knob never changes starting weights."""
    if impl == "threefry2x32":
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


def rng_ckpt_payload(key):
    """Checkpoint-serializable form of the training rng: typed key arrays
    carry an extended dtype flax msgpack can't encode, so they round-trip
    as their raw key data; the legacy threefry key IS its data (old
    checkpoints stay loadable unchanged)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(key)
    return key


def rng_from_ckpt(payload, impl: str = "threefry2x32"):
    if impl == "threefry2x32":
        return jnp.asarray(payload)
    return jax.random.wrap_key_data(jnp.asarray(payload), impl=impl)


def init_params(model: DLDKD, mcfg: ModelConfig, seed: int):
    rng = jax.random.PRNGKey(seed)
    video = jnp.zeros((1, mcfg.max_ctx_l, mcfg.visual_input_size), jnp.float32)
    vmask = jnp.ones((1, mcfg.max_ctx_l), jnp.float32)
    text = jnp.zeros((1, mcfg.max_desc_l, mcfg.query_input_size), jnp.float32)
    tmask = jnp.ones((1, mcfg.max_desc_l), jnp.float32)
    return model.init(rng, video, vmask, text, tmask)


def epoch_scalars(cfg: Config, epoch: int) -> LossScalars:
    t = cfg.train
    kd = schedules.distill_weight(
        t.distill_loss_decay, epoch, exponential_k=t.exponential_k,
        linear_k=t.linear_k, linear_b=t.linear_b, sigmoid_k=t.sigmoid_k)
    alpha = schedules.alpha_schedule(
        t.alpha_decay, epoch, t.alpha, t.n_epoch, t.exponential_k,
        t.selfDistil_sigmoid_k)
    belta = schedules.belta_schedule(
        t.belta_decay, epoch, t.belta, t.n_epoch, t.exponential_k,
        t.selfDistil_sigmoid_k)
    return LossScalars(jnp.float32(kd), jnp.float32(alpha), jnp.float32(belta))


def start_training(cfg: Config, preempt_guard=None,
                   initial_params=None, epoch_order=None) -> str:
    """initial_params: optional flax param tree to start from instead of
    the seeded init — used for finetuning and for cross-implementation
    trajectory tests that sync weights from the reference's init.
    epoch_order: optional per-epoch video-ID sequences replayed verbatim
    by the loader (see TrainLoader) — pins multi-batch epoch composition
    to another stack's recorded shuffle in trajectory tests."""
    logger = setup_logging(cfg.results_dir)
    if cfg.model.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          cfg.model.matmul_precision)
    if cfg.debug_nans:
        # abort on the first non-finite value anywhere in the step — the
        # torch.autograd.detect_anomaly equivalent (reference train.py:223)
        jax.config.update("jax_debug_nans", True)
    # persistent compilation cache: the fwd+bwd step graph can take minutes
    # to compile on TPU; cache it across runs (off: DLDKD_NO_COMPILE_CACHE=1)
    if not os.environ.get("DLDKD_NO_COMPILE_CACHE"):
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   os.path.expanduser("~/.cache/dldkd_jax"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    make_code_zip(os.path.dirname(os.path.abspath(__file__)),
                  os.path.join(cfg.results_dir, "code.zip"))

    t0 = time.time()
    mcfg, train_data, val_videos, val_queries, _ = build_model_and_data(cfg)
    logger.info("packed %d train videos / %d captions, %d val videos / "
                "%d val queries in %.1fs",
                len(train_data.videos), len(train_data.queries),
                len(val_videos), len(val_queries), time.time() - t0)

    model = DLDKD(config=mcfg)
    params = (initial_params if initial_params is not None
              else init_params(model, mcfg, cfg.train.seed))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    logger.info("model parameters: %.2fM", n_params / 1e6)

    # mesh size: largest device count the static batch shapes divide by;
    # datasets smaller than one batch stay single-device (dropping the
    # short trailing batch would leave zero steps)
    n_mesh = 1
    if len(train_data.videos) >= cfg.train.bsz:
        for d in range(min(jax.device_count(),
                           np.gcd(cfg.train.bsz,
                                  cfg.data.query_pad_multiple)), 0, -1):
            if cfg.train.bsz % d == 0 and cfg.data.query_pad_multiple % d == 0:
                n_mesh = d
                break

    # data-parallel runs drop the short trailing batch (its video axis
    # would not divide the mesh; the per-epoch permutation still visits
    # every video across epochs)
    loader = TrainLoader(train_data, cfg.train.bsz, seed=cfg.train.seed,
                         query_pad_multiple=cfg.data.query_pad_multiple,
                         drop_last=n_mesh > 1, epoch_order=epoch_order)
    t_total = loader.steps_per_epoch() * cfg.train.n_epoch
    lr_sched = schedules.make_lr_schedule(
        "warmup_linear", cfg.train.lr_warmup_proportion, float(t_total))
    optimizer = bert_adam(cfg.train.lr, lr_sched, weight_decay=cfg.train.wd,
                          wd_mask=default_wd_mask(params))
    opt_state = optimizer.init(params)

    # multi-device: replicate state over a 1-D mesh and shard every batch
    # on its leading axes; the jitted step psums gradients over ICI
    # (multi-host contributes process-local shards, psum rides DCN)
    mesh = None
    put_fn = None
    dp_steps: Dict = {}
    if n_mesh > 1:
        from dldkd_tpu.parallel import make_mesh
        from dldkd_tpu.parallel.multihost import (
            replicate_multihost, shard_batch_multihost)

        mesh = make_mesh(n_mesh)
        params = replicate_multihost(params, mesh)
        opt_state = replicate_multihost(opt_state, mesh)
        put_fn = functools.partial(shard_batch_multihost, mesh=mesh)
        logger.info("data-parallel: %d of %d devices / %d processes",
                    n_mesh, jax.device_count(), jax.process_count())

    writer = MetricsWriter(cfg.tensorboard_log_dir)
    train_rng = make_train_rng(cfg.train.seed + 1, cfg.train.rng_impl)
    best_score, es_cnt = 0.0, 0
    global_step = 0
    # SIGTERM (pool preemption) -> full resume checkpoint + clean exit.
    # The CLI passes its own guard (main() decides what runs afterwards);
    # direct callers get one installed for the duration of training and
    # restored on completion.
    from dldkd_tpu.utils.preemption import PreemptionGuard, agree_should_stop

    own_guard = preempt_guard is None
    preempt = PreemptionGuard().install() if own_guard else preempt_guard
    n_proc = jax.process_count()

    start_epoch = -1 if cfg.eval_untrained else 0
    if cfg.resume:
        # exact mid-training resume: params + optimizer + epoch + rng
        # (impossible in the reference — weights-only ckpt, SURVEY S5.4)
        state = ckpt_lib.restore_checkpoint(cfg.resume, {
            "params": params, "opt_state": opt_state,
            "epoch": 0, "best_score": 0.0,
            "rng": rng_ckpt_payload(train_rng),
        })
        params, opt_state = state["params"], state["opt_state"]
        best_score = float(state["best_score"])
        train_rng = rng_from_ckpt(state["rng"], cfg.train.rng_impl)
        start_epoch = int(state["epoch"]) + 1
        global_step = loader.steps_per_epoch() * start_epoch
        logger.info("resumed from %s: epoch %d, best sumr %.1f",
                    cfg.resume, start_epoch, best_score)
    try:
        for epoch in range(start_epoch, cfg.train.n_epoch):
            if epoch >= 0:
                run_cfg = mcfg
                if (cfg.train.hard_negative_start_epoch != -1
                        and epoch >= cfg.train.hard_negative_start_epoch):
                    run_cfg = mcfg.replace(use_hard_negative=True,
                                           hard_pool_size=cfg.train.hard_pool_size)
                scalars = epoch_scalars(cfg, epoch)
                logger.info("epoch %d: kd_weight=%.4f alpha=%.4f belta=%.4f "
                            "hard_neg=%s", epoch, float(scalars.kd_weight),
                            float(scalars.alpha), float(scalars.belta),
                            run_cfg.use_hard_negative)
                meters = {k: AverageMeter() for k in LOSS_KEYS}
                data_t, step_t = AverageMeter(), AverageMeter()
                trace_active = False
                pending_losses = []
                t_fetch = time.time()
                if mesh is not None and run_cfg not in dp_steps:
                    from dldkd_tpu.parallel import make_dp_train_step

                    dp_steps[run_cfg] = make_dp_train_step(
                        model, run_cfg, cfg.train, optimizer, mesh)
                for batch_idx, batch in enumerate(
                        device_prefetch(loader.epoch(epoch), put_fn=put_fn)):
                    data_t.update(time.time() - t_fetch)
                    if cfg.profile_dir and epoch == max(start_epoch, 0):
                        # trace steps [1, 1+profile_steps) — step 0 compiles
                        if batch_idx == 1:
                            jax.profiler.start_trace(cfg.profile_dir)
                            trace_active = True
                        elif batch_idx == 1 + cfg.profile_steps and trace_active:
                            jax.profiler.stop_trace()
                            trace_active = False
                            logger.info("profiler trace written to %s",
                                        cfg.profile_dir)
                    t_step = time.time()
                    step_rng = jax.random.fold_in(train_rng, global_step)
                    if mesh is not None:
                        params, opt_state, loss_dict = dp_steps[run_cfg](
                            params, opt_state, batch, step_rng, scalars)
                    else:
                        params, opt_state, loss_dict = train_step(
                            model, run_cfg, cfg.train, optimizer,
                            params, opt_state, batch, step_rng, scalars)
                    # loss scalars stay on device until epoch end — fetching
                    # them here would sync the host into every step and stall
                    # the dispatch pipeline
                    pending_losses.append((global_step, loss_dict))
                    step_t.update(time.time() - t_step)
                    global_step += 1
                    t_fetch = time.time()
                    if n_proc == 1:
                        if preempt.should_stop:
                            break
                    elif (batch_idx + 1) % PREEMPT_SYNC_STEPS == 0:
                        # multi-host: agree on the stop step (see
                        # preemption.agree_should_stop); the host sync this
                        # costs is amortized over PREEMPT_SYNC_STEPS, and
                        # preemption grace windows are tens of seconds
                        if agree_should_stop(preempt.should_stop):
                            preempt.trigger()
                            break
                    if cfg.debug and batch_idx == 3:
                        break
                if trace_active:  # epoch shorter than profile_steps
                    jax.profiler.stop_trace()
                    trace_active = False
                for step_i, ld in pending_losses:
                    vals = {k: float(ld[k]) for k in LOSS_KEYS}
                    for k in LOSS_KEYS:
                        meters[k].update(vals[k])
                    writer.scalars({f"Train/{k}": vals[k] for k in LOSS_KEYS},
                                   step_i)
                loss_str = " ".join(f"{k} {m.avg:.4f}" for k, m in meters.items())
                line = (f"{time.strftime('%Y_%m_%d_%H_%M_%S')} [Epoch] {epoch:03d} "
                        f"[Loss] {loss_str}\n")
                with open(cfg.train_log_filepath, "a") as f:
                    f.write(line)
                logger.info("epoch %d: %s | data %.3fs/step step %.3fs/step",
                            epoch, loss_str, data_t.avg, step_t.avg)
                # preemption exit AFTER the loss flush (the interrupted
                # epoch's partial history would otherwise be lost). The
                # epoch end is a step-aligned sync point on every host, so
                # multi-host runs re-agree here — a SIGTERM that landed
                # between the in-loop sync points (or on a non-zero host,
                # which never writes the checkpoint itself) must not let
                # hosts diverge into the next epoch's collectives.
                stop_now = (preempt.should_stop if n_proc == 1
                            else agree_should_stop(preempt.should_stop))
                if stop_now:
                    preempt.trigger()
                    # record the interrupted epoch as not-yet-done: --resume
                    # replays it from the start with the mid-epoch parameters
                    # (bounded duplicate work, nothing lost)
                    preempt_dir = cfg.ckpt_dir + "_preempt"
                    if jax.process_index() == 0:
                        ckpt_lib.save_checkpoint(preempt_dir, {
                            "params": params, "opt_state": opt_state,
                            "epoch": epoch - 1, "best_score": best_score,
                            "rng": rng_ckpt_payload(train_rng),
                        }, mcfg)
                    logger.info(
                        "preempted at epoch %d step %d: resume checkpoint "
                        "written to %s (pass --resume %s)", epoch, global_step,
                        preempt_dir, preempt_dir)
                    break

            metrics = run_retrieval_eval(model, params, val_videos,
                                         val_queries, cfg.eval, mesh=mesh)
            for branch, m in metrics.items():
                logger.info("val %s: r1/5/10/100 %.1f/%.1f/%.1f/%.1f sumr %.1f "
                            "map %.4f", branch, m["r1"], m["r5"], m["r10"],
                            m["r100"], m["sumr"], m["map"])
            writer.scalars({f"Val/{b}_sumr": m["sumr"]
                            for b, m in metrics.items()}, max(global_step, 0))
            score = metrics["fused"]["sumr"]

            if score > best_score:
                best_score, es_cnt = score, 0
                if jax.process_index() == 0:   # one writer in multi-host runs
                    ckpt_lib.save_checkpoint(cfg.ckpt_dir, {
                        "params": params, "opt_state": opt_state,
                        "epoch": epoch, "best_score": best_score,
                        "rng": rng_ckpt_payload(train_rng),
                    }, mcfg)
                logger.info("checkpoint updated (sumr %.1f)", best_score)
            else:
                es_cnt += 1
                if cfg.train.max_es_cnt != -1 and es_cnt > cfg.train.max_es_cnt:
                    with open(cfg.train_log_filepath, "a") as f:
                        f.write(f"Early Stop at epoch {epoch}")
                    logger.info("early stop at epoch %d", epoch)
                    break
            # a SIGTERM that lands DURING the (potentially long) validation
            # eval would otherwise only be acted on at the next epoch's end
            # — and on the last epoch never, letting the grace window
            # expire with no resume checkpoint. This epoch is fully done
            # (eval + best-ckpt above), so record it as such: --resume
            # continues at epoch + 1.
            stop_now = (preempt.should_stop if n_proc == 1
                        else agree_should_stop(preempt.should_stop))
            if stop_now:
                preempt.trigger()
                preempt_dir = cfg.ckpt_dir + "_preempt"
                if jax.process_index() == 0:
                    ckpt_lib.save_checkpoint(preempt_dir, {
                        "params": params, "opt_state": opt_state,
                        "epoch": epoch, "best_score": best_score,
                        "rng": rng_ckpt_payload(train_rng),
                    }, mcfg)
                logger.info(
                    "preempted during epoch %d eval: resume checkpoint "
                    "written to %s (pass --resume %s)", epoch,
                    preempt_dir, preempt_dir)
                break
            if cfg.debug:
                break

    finally:
        writer.close()
        if own_guard:
            # restore the previous SIGTERM disposition even when an
            # exception escapes training: the guard is no longer polled
            # afterwards, and swallowing SIGTERM would leave the process
            # killable only by SIGKILL
            preempt.__exit__(None, None, None)
    if preempt.should_stop:
        logger.info("training preempted; best val sumr so far %.1f",
                    best_score)
    else:
        logger.info("training done; best val sumr %.1f", best_score)
    return cfg.results_dir


def main(argv=None):
    from dldkd_tpu.parallel import maybe_initialize_distributed
    from dldkd_tpu.utils.preemption import PreemptionGuard

    maybe_initialize_distributed()   # no-op unless launched multi-host
    cfg = parse_args(argv)
    with PreemptionGuard() as guard:
        results_dir = start_training(cfg, preempt_guard=guard)
        preempted = guard.should_stop
    # handlers restored here: a SIGTERM during post-train inference
    # terminates the process normally (nothing would poll the guard)
    if preempted:
        print("preempted: skipping post-train inference; resume with "
              f"--resume {cfg.ckpt_dir}_preempt", file=sys.stderr)
        return
    if not cfg.debug:
        # post-train test-split inference (reference train.py:335-344)
        from dldkd_tpu.infer import start_inference
        test_cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, model_dir=results_dir,
                                          eval_split_name="test"))
        start_inference(test_cfg)


if __name__ == "__main__":
    main()
