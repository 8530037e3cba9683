"""Multi-device tests on the 8-device virtual CPU mesh: data-parallel train
step and corpus-sharded eval must match single-device results exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dldkd_tpu.config import ModelConfig, TrainConfig
from dldkd_tpu.data.ingest import PackedQueries, PackedVideos
from dldkd_tpu.evaluate import eval_retrieval
from dldkd_tpu.models import DLDKD
from dldkd_tpu.models.objective import LossScalars
from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules
from dldkd_tpu.parallel import (
    eval_retrieval_sharded,
    make_dp_train_step,
    make_mesh,
    shard_batch,
)
from dldkd_tpu.train import train_step

MCFG = ModelConfig(visual_input_size=12, query_input_size=10,
                   inheritance_hidden=8, exploration_hidden=8,
                   max_ctx_l=8, max_desc_l=6, n_heads=2,
                   double_branch=True, label_style="soft",
                   use_hard_negative=True, hard_pool_size=4)
TCFG = TrainConfig(lr=1e-3, n_epoch=2)


def make_batch(rng, b=16, q=32):
    video = rng.randn(b, MCFG.max_ctx_l, MCFG.visual_input_size).astype(np.float32)
    vmask = np.ones((b, MCFG.max_ctx_l), np.float32)
    text = rng.randn(q, MCFG.max_desc_l, MCFG.query_input_size).astype(np.float32)
    tmask = np.ones((q, MCFG.max_desc_l), np.float32)
    labels = np.sort(np.concatenate([np.arange(b), rng.randint(0, b, q - b)])
                     ).astype(np.int32)
    return {
        "student_videos": video, "student_videos_mask": vmask,
        "teacher_videos": rng.randn(b, MCFG.max_ctx_l, 6).astype(np.float32),
        "student_text": text, "student_text_mask": tmask,
        "teacher_text": rng.randn(q, 6).astype(np.float32),
        "text_labels": labels,
    }


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    model = DLDKD(config=MCFG)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["student_videos"]),
                        jnp.asarray(batch["student_videos_mask"]),
                        jnp.asarray(batch["student_text"]),
                        jnp.asarray(batch["student_text_mask"]))
    opt = bert_adam(1e-3, schedules.make_lr_schedule("warmup_linear", 0.1, 100.0),
                    wd_mask=default_wd_mask(params))
    return model, params, opt, batch


def test_dp_step_matches_single_device(setup):
    model, params, opt, batch = setup
    mesh = make_mesh(8)
    scalars = LossScalars(jnp.float32(0.9), jnp.float32(0.8), jnp.float32(0.7))
    rng = jax.random.PRNGKey(42)

    # the steps DONATE params/opt_state — hand them copies, keep the
    # module-scoped fixture's params alive for the other tests
    params_a = jax.tree.map(jnp.copy, params)
    p1, s1, d1 = train_step(model, MCFG, TCFG, opt, params_a,
                            opt.init(params_a), batch, rng, scalars)

    dp_step = make_dp_train_step(model, MCFG, TCFG, opt, mesh)
    sharded = shard_batch(batch, mesh)
    # device_put may ALIAS the device-0 buffer into the replicated tree, so
    # donate-ing rep_params would delete the fixture's params — copy first
    rep_params = jax.device_put(jax.tree.map(jnp.copy, params),
                                jax.sharding.NamedSharding(
                                    mesh, jax.sharding.PartitionSpec()))
    p2, s2, d2 = dp_step(rep_params, opt.init(rep_params), sharded, rng, scalars)

    for k in d1:
        np.testing.assert_allclose(float(d1[k]), float(d2[k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    flat1, flat2 = jax.tree.leaves(p1), jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_dp_step_rbg_rng_matches_single_device(setup):
    """--rng_impl rbg: the typed hardware-RNG key must thread through the
    mesh step (replicated sharding over a typed key array) and reproduce
    the single-device step's losses exactly — the DP semantics don't
    depend on the PRNG implementation."""
    from dldkd_tpu.train import make_train_rng

    model, params, opt, batch = setup
    mesh = make_mesh(8)
    scalars = LossScalars(jnp.float32(0.9), jnp.float32(0.8),
                          jnp.float32(0.7))
    rng = jax.random.fold_in(make_train_rng(7, "rbg"), 0)

    params_a = jax.tree.map(jnp.copy, params)
    p1, s1, d1 = train_step(model, MCFG, TCFG, opt, params_a,
                            opt.init(params_a), batch, rng, scalars)
    assert np.isfinite(float(d1["loss_overall"]))

    dp_step = make_dp_train_step(model, MCFG, TCFG, opt, mesh)
    sharded = shard_batch(batch, mesh)
    rep_params = jax.device_put(jax.tree.map(jnp.copy, params),
                                jax.sharding.NamedSharding(
                                    mesh, jax.sharding.PartitionSpec()))
    p2, s2, d2 = dp_step(rep_params, opt.init(rep_params), sharded, rng,
                         scalars)
    for k in d1:
        np.testing.assert_allclose(float(d1[k]), float(d2[k]), rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_sharded_eval_matches_unsharded(setup):
    model, params, _, _ = setup
    rng = np.random.RandomState(1)
    n_vid, n_q = 21, 40  # deliberately NOT divisible by 8
    vfeats = rng.randn(n_vid, MCFG.max_ctx_l, MCFG.visual_input_size).astype(np.float32)
    vmask = np.ones((n_vid, MCFG.max_ctx_l), np.float32)
    vmask[3, 5:] = 0
    vids = [f"v{i}" for i in range(n_vid)]
    videos = PackedVideos(feats=vfeats, mask=vmask, ids=vids)
    qfeats = rng.randn(n_q, MCFG.max_desc_l, MCFG.query_input_size).astype(np.float32)
    qmask = np.ones((n_q, MCFG.max_desc_l), np.float32)
    qvids = [vids[i % n_vid] for i in range(n_q)]
    queries = PackedQueries(feats=qfeats, mask=qmask,
                            cap_ids=[f"{v}#enc#{i}" for i, v in enumerate(qvids)],
                            video_ids=qvids)

    want = eval_retrieval(model, params, videos, queries,
                          context_bsz=7, query_bsz=16)
    mesh = make_mesh(8)
    got = eval_retrieval_sharded(model, params, videos, queries, mesh,
                                 query_bsz=16)
    assert set(got) == set(want)
    for branch in want:
        for key in ("r1", "r5", "r10", "sumr", "medr", "meanr"):
            assert got[branch][key] == pytest.approx(want[branch][key]), (
                branch, key)


def test_mesh_sizes():
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        assert mesh.devices.size == n
