"""End-to-end training on the synthetic dataset: losses drop, retrieval
beats chance, checkpoints restore bit-exact, CLI round-trips."""

import dataclasses
import glob
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dldkd_tpu import checkpoint as ckpt_lib
from dldkd_tpu.config import Config, DataConfig, EvalConfig, ModelConfig, TrainConfig
from dldkd_tpu.data.synthetic import generate_dataset
from dldkd_tpu.evaluate import eval_retrieval
from dldkd_tpu.models import DLDKD
from dldkd_tpu.train import (
    build_model_and_data,
    init_params,
    start_training,
    epoch_scalars,
)


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_train"))
    generate_dataset(root, n_videos={"train": 24, "val": 10, "test": 10},
                     frames_range=(5, 40), teacher_frames_range=(4, 16),
                     d_student=16, d_query=12, d_teacher=8, noise=0.3, seed=5)
    results_root = str(tmp_path_factory.mktemp("results"))
    base = Config(
        exp_id="smoke",
        results_root=results_root,
        model=ModelConfig(inheritance_hidden=16, exploration_hidden=16,
                          n_heads=2, double_branch=True, label_style="soft",
                          max_ctx_l=16, max_desc_l=8),
        train=TrainConfig(lr=1e-3, n_epoch=4, bsz=8, seed=1,
                          distill_loss_decay="exp", max_es_cnt=10),
        data=DataConfig(root_path=root, collection="synthetic",
                        visual_feature="i3d", q_feat_size=12,
                        max_ctx_l=16, max_desc_l=8, query_pad_multiple=8),
        eval=EvalConfig(eval_query_bsz=16, eval_context_bsz=8),
    )
    return base.finalize()


def test_training_end_to_end(cfg):
    results_dir = start_training(cfg)

    # train log written with all loss components
    log = open(cfg.train_log_filepath).read().strip().splitlines()
    assert len(log) >= 4
    first, last = log[0], log[-1]

    def loss_of(line):
        return float(line.split("loss_overall ")[1].split(" ")[0])

    assert loss_of(last) < loss_of(first), (first, last)

    # checkpoint exists and restores
    mcfg = ckpt_lib.load_model_cfg(cfg.ckpt_dir)
    model = DLDKD(config=mcfg)
    template = init_params(model, mcfg, 0)
    params, epoch = ckpt_lib.restore_params_only(cfg.ckpt_dir, template)
    assert epoch >= 0

    # restored params beat chance retrieval on val (10 videos -> random
    # r1 = 10, sumr ~ 130 in expectation; planted structure should do better)
    _, _, val_videos, val_queries, _ = build_model_and_data(cfg)
    metrics = eval_retrieval(model, params, val_videos, val_queries,
                             context_bsz=8, query_bsz=16)
    assert metrics["fused"]["sumr"] > 250, metrics["fused"]

    # metrics.jsonl written
    lines = open(os.path.join(cfg.tensorboard_log_dir, "metrics.jsonl")).read()
    assert "Train/loss_overall" in lines
    # code snapshot + opt.json provenance
    assert os.path.exists(os.path.join(results_dir, "code.zip"))
    assert os.path.exists(os.path.join(results_dir, "opt.json"))


def test_inference_cli_roundtrip(cfg):
    """infer.start_inference reproduces eval from the saved run dir."""
    from dldkd_tpu.infer import start_inference
    test_cfg = dataclasses.replace(
        cfg, eval=dataclasses.replace(cfg.eval, model_dir=cfg.results_dir))
    metrics = start_inference(test_cfg, split="test")
    assert metrics["fused"]["sumr"] > 250


def test_full_state_resume(cfg):
    """Checkpoint restores optimizer state exactly (not just params)."""
    mcfg = ckpt_lib.load_model_cfg(cfg.ckpt_dir)
    model = DLDKD(config=mcfg)
    from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
    template_params = init_params(model, mcfg, 0)
    opt = bert_adam(cfg.train.lr,
                    schedules.make_lr_schedule("warmup_linear", 0.01, 100.0),
                    wd_mask=default_wd_mask(template_params))
    template = {
        "params": template_params,
        "opt_state": opt.init(template_params),
        "epoch": 0, "best_score": 0.0, "rng": jax.random.PRNGKey(0),
    }
    state = ckpt_lib.restore_checkpoint(cfg.ckpt_dir, template)
    assert int(state["opt_state"].step) > 0
    assert state["best_score"] > 0


def test_rng_ckpt_payload_roundtrip():
    """The training rng checkpoints as raw key data (typed key arrays
    carry an extended dtype flax msgpack can't encode); the round-trip
    must reproduce the exact stream for both PRNG implementations."""
    from flax import serialization

    from dldkd_tpu.train import make_train_rng, rng_ckpt_payload, rng_from_ckpt

    for impl in ("threefry2x32", "rbg"):
        k = make_train_rng(7, impl)
        payload = rng_ckpt_payload(k)
        back = serialization.from_bytes(payload,
                                        serialization.to_bytes(payload))
        k2 = rng_from_ckpt(back, impl)
        a = jax.random.normal(jax.random.fold_in(k, 3), (4,))
        b = jax.random.normal(jax.random.fold_in(k2, 3), (4,))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=impl)


def test_rbg_rng_driver_trains_and_resumes(cfg):
    """--rng_impl rbg end to end: the driver trains with the typed
    hardware-RNG key (distinct dropout/negative-sampling streams, same
    distributions), checkpoints the key as raw data, and resumes from the
    full-state checkpoint for a further epoch."""
    rbg_cfg = dataclasses.replace(
        cfg, exp_id="rbg",
        train=dataclasses.replace(cfg.train, rng_impl="rbg", n_epoch=2),
    ).finalize()
    start_training(rbg_cfg)
    log = open(rbg_cfg.train_log_filepath).read().strip().splitlines()
    assert len(log) >= 2

    res_cfg = dataclasses.replace(
        rbg_cfg, exp_id="rbg_resume", resume=rbg_cfg.ckpt_dir,
        train=dataclasses.replace(rbg_cfg.train, n_epoch=3),
    ).finalize()
    start_training(res_cfg)
    log2 = open(res_cfg.train_log_filepath).read().strip().splitlines()
    assert len(log2) >= 1  # the resumed epoch ran under the restored key


def test_epoch_scalars_decay(cfg):
    s0 = epoch_scalars(cfg, 0)
    s5 = epoch_scalars(cfg, 5)
    assert float(s0.kd_weight) == 1.0
    assert abs(float(s5.kd_weight) - 0.95 ** 5) < 1e-6
    assert float(s5.alpha) < float(s0.alpha) or cfg.train.alpha_decay in (None, "None")


def test_bf16_train_step_tracks_f32(cfg):
    """The --dtype bfloat16 speed path: towers compute in bf16, losses and
    params stay f32. The jitted step must run, produce finite f32 losses,
    and track the f32 trajectory closely over several steps (bf16 rounding
    only — same data, same init)."""
    import functools

    import jax.numpy as jnp

    from dldkd_tpu.config import TrainConfig
    from dldkd_tpu.models.objective import LossScalars
    from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
    from dldkd_tpu.train import train_step

    mcfg_f32, train_data, _, _, _ = build_model_and_data(cfg)
    mcfg_bf16 = mcfg_f32.replace(dtype="bfloat16")
    tcfg = TrainConfig(lr=1e-3)
    from dldkd_tpu.data.pipeline import TrainLoader

    loader = TrainLoader(train_data, bsz=8, seed=0, query_pad_multiple=8)
    batches = list(loader.epoch(0))

    def run(mcfg, n_steps=6):
        model = DLDKD(config=mcfg)
        params = init_params(model, mcfg, 3)
        opt = bert_adam(tcfg.lr,
                        schedules.make_lr_schedule("warmup_linear", 0.01,
                                                   100.0),
                        wd_mask=default_wd_mask(params))
        opt_state = opt.init(params)
        scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8),
                              jnp.float32(0.8))
        losses = []
        for i in range(n_steps):
            params, opt_state, ld = train_step(
                model, mcfg, tcfg, opt, params, opt_state,
                batches[i % len(batches)], jax.random.PRNGKey(7 + i),
                scalars)
            losses.append(float(ld["loss_overall"]))
        # params stay f32 (mixed precision: bf16 is compute-only)
        assert all(leaf.dtype == jnp.float32
                   for leaf in jax.tree.leaves(params))
        assert ld["loss_overall"].dtype == jnp.float32
        return losses

    f32_losses = run(mcfg_f32)
    bf16_losses = run(mcfg_bf16)
    assert np.all(np.isfinite(bf16_losses))
    np.testing.assert_allclose(bf16_losses, f32_losses, rtol=0.05)
    # both trajectories actually move
    assert abs(f32_losses[-1] - f32_losses[0]) > 1e-4
