"""Worker for the 2-process multi-host integration tests.

Usage: python multihost_worker.py <num_processes> <process_id> <port> \
           [epoch <data_root> <results_root>]

Each process exposes 4 virtual CPU devices; with 2 processes the global
mesh spans 8 devices and shard_batch_multihost takes the real
make_array_from_process_local_data branch. Prints one JSON line so the
parent can compare runs.

Modes:
  (default) one DP step + preemption-agreement probes.
  epoch     the FULL driver cycle via start_training on a shared on-disk
            dataset: packing -> DP epochs -> per-epoch SHARDED val eval ->
            process-0 best checkpoint; then a second run with a
            pre-triggered preemption guard on process 0 only, exercising
            the multi-host stop agreement + process-0 preempt checkpoint.
"""

import json
import os
import sys


def _epoch_mode(n_proc, proc_id, data_root, res_root):
    """Run the real training driver end-to-end; emit per-epoch evidence."""
    import glob

    from dldkd_tpu.config import (
        Config, DataConfig, EvalConfig, ModelConfig, TrainConfig)
    from dldkd_tpu.train import start_training
    from dldkd_tpu.utils.preemption import PreemptionGuard

    def make_cfg(exp_id, n_epoch):
        return Config(
            exp_id=exp_id,
            results_root=os.path.join(res_root, f"p{proc_id}"),
            model=ModelConfig(inheritance_hidden=8, exploration_hidden=8,
                              n_heads=2, double_branch=True,
                              label_style="soft", max_ctx_l=8, max_desc_l=4),
            train=TrainConfig(lr=1e-3, n_epoch=n_epoch, bsz=16, seed=3,
                              distill_loss_decay="exp", max_es_cnt=10),
            data=DataConfig(root_path=data_root, collection="synthetic",
                            visual_feature="i3d", q_feat_size=12,
                            max_ctx_l=8, max_desc_l=4,
                            query_pad_multiple=16),
            eval=EvalConfig(eval_query_bsz=16, eval_context_bsz=8),
        ).finalize()

    def run_stats(cfg):
        losses = [float(line.split("loss_overall ")[1].split(" ")[0])
                  for line in open(cfg.train_log_filepath)]
        sumrs = []
        metrics_file = os.path.join(cfg.tensorboard_log_dir,
                                    "metrics.jsonl")
        if os.path.exists(metrics_file):
            for line in open(metrics_file):
                rec = json.loads(line)
                if "Val/fused_sumr" in rec:
                    sumrs.append(rec["Val/fused_sumr"])
        return {
            "losses": losses, "sumrs": sumrs,
            "best_ckpt": bool(glob.glob(
                os.path.join(cfg.ckpt_dir, "model.ckpt"))),
            "preempt_ckpt": bool(glob.glob(
                os.path.join(cfg.ckpt_dir + "_preempt", "model.ckpt"))),
        }

    cfg = make_cfg("mh_epoch", 2)
    start_training(cfg)
    full = run_stats(cfg)

    # preemption leg: guard latched on process 0 ONLY before training —
    # the epoch-end multi-host agreement must stop BOTH processes after
    # epoch 0 and write one preempt checkpoint (process 0)
    guard = PreemptionGuard()
    if proc_id == 0:
        guard.trigger()
    cfg_p = make_cfg("mh_preempt", 3)
    start_training(cfg_p, preempt_guard=guard)
    pre = run_stats(cfg_p)
    return {"full": full, "preempt": pre}


def main():
    n_proc, proc_id, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // n_proc}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if n_proc > 1:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=n_proc, process_id=proc_id)
        assert jax.process_count() == n_proc
    assert jax.device_count() == 8  # same global mesh in both modes

    if mode == "epoch":
        out = _epoch_mode(n_proc, proc_id, sys.argv[5], sys.argv[6])
        out["process"] = proc_id
        print(json.dumps(out), flush=True)
        return

    import numpy as np

    from dldkd_tpu.config import ModelConfig, TrainConfig
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.models.objective import LossScalars
    from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
    from dldkd_tpu.parallel import make_dp_train_step, make_mesh
    from dldkd_tpu.parallel.multihost import (
        replicate_multihost, shard_batch_multihost)

    mcfg = ModelConfig(
        visual_input_size=16, query_input_size=12,
        inheritance_hidden=8, exploration_hidden=8,
        max_ctx_l=8, max_desc_l=4, n_heads=2,
        double_branch=True, label_style="soft",
        use_hard_negative=True, hard_pool_size=4)
    tcfg = TrainConfig(lr=1e-3)
    model = DLDKD(config=mcfg)
    rng = np.random.RandomState(0)
    bsz, q_pad = 16, 32  # global shapes, identical in both modes
    batch = {
        "student_videos": rng.randn(bsz, 8, 16).astype(np.float32),
        "student_videos_mask": np.ones((bsz, 8), np.float32),
        "teacher_videos": rng.randn(bsz, 8, 6).astype(np.float32),
        "student_text": rng.randn(q_pad, 4, 12).astype(np.float32),
        "student_text_mask": np.ones((q_pad, 4), np.float32),
        "teacher_text": rng.randn(q_pad, 6).astype(np.float32),
        "text_labels": np.sort(rng.randint(0, bsz, q_pad)).astype(np.int32),
    }

    import jax.numpy as jnp

    mesh = make_mesh(8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["student_videos"]),
                        jnp.asarray(batch["student_videos_mask"]),
                        jnp.asarray(batch["student_text"]),
                        jnp.asarray(batch["student_text_mask"]))
    opt = bert_adam(tcfg.lr,
                    schedules.make_lr_schedule("warmup_linear", 0.1, 100.0),
                    wd_mask=default_wd_mask(params))
    opt_state = replicate_multihost(opt.init(params), mesh)
    params = replicate_multihost(params, mesh)

    step = make_dp_train_step(model, mcfg, tcfg, opt, mesh)
    scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8),
                          jnp.float32(0.8))
    params, opt_state, loss_dict = step(
        params, opt_state, shard_batch_multihost(batch, mesh),
        jax.random.PRNGKey(1), scalars)

    loss = float(loss_dict["loss_overall"])
    checksum = float(sum(
        jnp.sum(jnp.abs(leaf)) for leaf in jax.tree.leaves(params)))

    # preemption stop-step agreement (utils.preemption.agree_should_stop):
    # only process 0 flags -> everyone must agree to stop; nobody flags ->
    # everyone continues. Exercises the process_allgather branch when
    # n_proc > 1 and the local fast path otherwise.
    from dldkd_tpu.utils.preemption import agree_should_stop

    agree_one = agree_should_stop(proc_id == 0)
    agree_none = agree_should_stop(False)

    print(json.dumps({"process": proc_id, "loss": loss,
                      "checksum": checksum,
                      "agree_one": bool(agree_one),
                      "agree_none": bool(agree_none)}), flush=True)


if __name__ == "__main__":
    main()
