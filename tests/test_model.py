"""Model tests: tower math vs numpy oracle, mask invariance, objective."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dldkd_tpu.config import ModelConfig, TrainConfig
from dldkd_tpu.models import DLDKD
from dldkd_tpu.models.objective import LossScalars, compute_losses
from tests import reference_math as ref

MCFG = ModelConfig(
    visual_input_size=20, query_input_size=12,
    inheritance_hidden=16, exploration_hidden=16,
    max_ctx_l=10, max_desc_l=6, n_heads=4,
    input_drop=0.1, drop=0.1, double_branch=True, label_style="soft",
    use_hard_negative=True, hard_pool_size=4,
)


def make_inputs(seed=0, b=5, q=12, pad_q=16):
    rng = np.random.RandomState(seed)
    video = rng.randn(b, MCFG.max_ctx_l, MCFG.visual_input_size).astype(np.float32)
    vmask = np.zeros((b, MCFG.max_ctx_l), np.float32)
    for i in range(b):
        vmask[i, : rng.randint(3, MCFG.max_ctx_l + 1)] = 1
    text = rng.randn(pad_q, MCFG.max_desc_l, MCFG.query_input_size).astype(np.float32)
    tmask = np.zeros((pad_q, MCFG.max_desc_l), np.float32)
    for i in range(pad_q):
        tmask[i, : rng.randint(2, MCFG.max_desc_l + 1)] = 1
    labels = np.full(pad_q, -1, np.int32)
    labels[:q] = np.sort(np.concatenate([np.arange(b), rng.randint(0, b, q - b)]))
    return video, vmask, text, tmask, labels


@pytest.fixture(scope="module")
def model_and_params():
    model = DLDKD(config=MCFG)
    video, vmask, text, tmask, _ = make_inputs()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(video), jnp.asarray(vmask),
                        jnp.asarray(text), jnp.asarray(tmask))
    return model, params


def test_towers_match_numpy_oracle(model_and_params):
    model, params = model_and_params
    video, vmask, text, tmask, _ = make_inputs(1)
    (ictx, ectx), (iq, eq) = model.apply(
        params, jnp.asarray(video), jnp.asarray(vmask),
        jnp.asarray(text), jnp.asarray(tmask), deterministic=True)

    tree = jax.tree.map(np.asarray, params["params"])
    for branch_name, got_q, got_c in (("inheritance", iq, ictx),
                                      ("exploration", eq, ectx)):
        br = tree[branch_name]
        want_q = ref.encode_query_oracle(br, text.astype(np.float64), tmask, MCFG.n_heads)
        want_c = ref.encode_context_oracle(br, video.astype(np.float64), vmask, MCFG.n_heads)
        np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(np.asarray(got_c), want_c, rtol=3e-4, atol=3e-5)


def test_masked_positions_do_not_leak(model_and_params):
    """Changing features at masked positions must not change encodings of
    valid positions (attention masking) nor pooled queries (pool masking)."""
    model, params = model_and_params
    video, vmask, text, tmask, _ = make_inputs(2)
    video2 = video + 100.0 * (1 - vmask)[:, :, None]
    text2 = text + 100.0 * (1 - tmask)[:, :, None]

    (c1, _), (q1, _) = model.apply(params, jnp.asarray(video), jnp.asarray(vmask),
                                   jnp.asarray(text), jnp.asarray(tmask),
                                   deterministic=True)
    (c2, _), (q2, _) = model.apply(params, jnp.asarray(video2), jnp.asarray(vmask),
                                   jnp.asarray(text2), jnp.asarray(tmask),
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-4)
    valid = np.asarray(vmask)[:, :, None]
    np.testing.assert_allclose(np.asarray(c1) * valid, np.asarray(c2) * valid, atol=1e-4)


def test_param_count_shape():
    """Single-branch model has exactly the reference parameter inventory."""
    cfg = MCFG.replace(double_branch=False)
    model = DLDKD(config=cfg)
    video, vmask, text, tmask, _ = make_inputs()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(video), jnp.asarray(vmask),
                        jnp.asarray(text), jnp.asarray(tmask))
    leaves = jax.tree.leaves(params)
    h, dv, dq = cfg.inheritance_hidden, cfg.visual_input_size, cfg.query_input_size
    # per tower: input LN (2*in) + proj (in*h + h) + pos (L*h) + pos LN (2h)
    # + 4 attn dense (4*(h*h+h)) + out LN (2h); query adds pool (h*1);
    # video adds out_mapping (h*h + h)
    def tower(in_dim, L):
        return 2 * in_dim + in_dim * h + h + L * h + 2 * h + 4 * (h * h + h) + 2 * h
    want = tower(dq, cfg.max_desc_l) + h + tower(dv, cfg.max_ctx_l) + h * h + h
    got = sum(int(np.prod(l.shape)) for l in leaves)
    assert got == want, (got, want)


def test_objective_end_to_end():
    model = DLDKD(config=MCFG)
    video, vmask, text, tmask, labels = make_inputs(3)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(video), jnp.asarray(vmask),
                        jnp.asarray(text), jnp.asarray(tmask))
    batch = {
        "student_videos": jnp.asarray(video),
        "student_videos_mask": jnp.asarray(vmask),
        "teacher_videos": jnp.asarray(video[:, :, :8]),
        "student_text": jnp.asarray(text),
        "student_text_mask": jnp.asarray(tmask),
        "teacher_text": jnp.asarray(text[:, 0, :8]),
        "text_labels": jnp.asarray(labels),
    }
    scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8), jnp.float32(0.8))
    tcfg = TrainConfig()

    def loss_fn(p):
        loss, _ = compute_losses(model, p, batch, jax.random.PRNGKey(1),
                                 MCFG, tcfg, scalars, train=True)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # at least the inheritance tower gets gradient signal
    gnorm = sum(float(jnp.sum(g ** 2)) for g in flat)
    assert gnorm > 0

    _, loss_dict = compute_losses(model, params, batch, jax.random.PRNGKey(1),
                                  MCFG, tcfg, scalars, train=False)
    assert set(loss_dict) == {"loss_overall", "inher_trip", "inher_nce",
                              "explore_trip", "explore_nce", "kl", "kl_intra"}


class TestStackedTowers:
    """models.stacked: both branches as one vmapped computation — must
    reproduce the sequential forward exactly (vmap is a compiler
    transform, not an approximation)."""

    def _setup(self, drop=0.0):
        import jax

        from dldkd_tpu.config import ModelConfig
        from dldkd_tpu.models import DLDKD
        from dldkd_tpu.train import init_params

        mcfg = ModelConfig(visual_input_size=20, query_input_size=12,
                           inheritance_hidden=16, exploration_hidden=16,
                           max_ctx_l=10, max_desc_l=5, n_heads=2,
                           double_branch=True, label_style="soft",
                           input_drop=drop, drop=drop)
        model = DLDKD(config=mcfg)
        params = init_params(model, mcfg, 3)
        rng = np.random.RandomState(2)
        vf = jnp.asarray(rng.randn(6, 10, 20).astype(np.float32))
        vm = jnp.asarray(np.ones((6, 10), np.float32))
        qf = jnp.asarray(rng.randn(8, 5, 12).astype(np.float32))
        qm = jnp.asarray(np.ones((8, 5), np.float32))
        return model, mcfg, params, (vf, vm, qf, qm)

    def test_deterministic_forward_matches_sequential(self):
        from dldkd_tpu.models.stacked import encode_stacked

        model, mcfg, params, (vf, vm, qf, qm) = self._setup()
        (ci, ce), (qi, qe) = model.apply(params, vf, vm, qf, qm,
                                         deterministic=True)
        (si, se), (sqi, sqe) = encode_stacked(model, params, vf, vm, qf, qm,
                                              deterministic=True)
        np.testing.assert_allclose(np.asarray(si), np.asarray(ci),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(se), np.asarray(ce),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sqi), np.asarray(qi),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sqe), np.asarray(qe),
                                   rtol=1e-5, atol=1e-6)

    def test_losses_match_with_zero_dropout(self):
        """With dropout off, the full loss stack through the stacked
        towers equals the sequential one (the only behavioral difference
        between the paths is the dropout RNG stream)."""
        import jax

        from dldkd_tpu.config import TrainConfig
        from dldkd_tpu.models.objective import LossScalars, compute_losses

        model, mcfg, params, (vf, vm, qf, qm) = self._setup()
        batch = {
            "student_videos": vf, "student_videos_mask": vm,
            "teacher_videos": jnp.asarray(
                np.random.RandomState(5).randn(6, 10, 8).astype(np.float32)),
            "student_text": qf, "student_text_mask": qm,
            "teacher_text": jnp.asarray(
                np.random.RandomState(6).randn(8, 8).astype(np.float32)),
            "text_labels": jnp.asarray(
                np.array([0, 0, 1, 2, 3, 3, 4, 5], np.int32)),
        }
        scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8),
                              jnp.float32(0.8))
        rng = jax.random.PRNGKey(0)
        base = TrainConfig()
        loss_seq, ld_seq = compute_losses(model, params, batch, rng, mcfg,
                                          base, scalars, train=True)
        import dataclasses

        stacked_cfg = dataclasses.replace(base, stacked_towers=True)
        loss_st, ld_st = compute_losses(model, params, batch, rng, mcfg,
                                        stacked_cfg, scalars, train=True)
        np.testing.assert_allclose(float(loss_st), float(loss_seq),
                                   rtol=1e-5)
        for k in ld_seq:
            np.testing.assert_allclose(float(ld_st[k]), float(ld_seq[k]),
                                       rtol=1e-5, atol=1e-6), k

    def test_single_branch_rejected(self):
        from dldkd_tpu.config import ModelConfig
        from dldkd_tpu.models import DLDKD
        from dldkd_tpu.models.stacked import can_stack, encode_stacked
        from dldkd_tpu.train import init_params

        mcfg = ModelConfig(visual_input_size=20, query_input_size=12,
                           inheritance_hidden=16, max_ctx_l=10,
                           max_desc_l=5, n_heads=2, double_branch=False)
        assert not can_stack(mcfg)
        model = DLDKD(config=mcfg)
        params = init_params(model, mcfg, 0)
        with pytest.raises(ValueError, match="stacked"):
            encode_stacked(model, params, jnp.zeros((2, 10, 20)),
                           jnp.ones((2, 10)), jnp.zeros((2, 5, 12)),
                           jnp.ones((2, 5)))
