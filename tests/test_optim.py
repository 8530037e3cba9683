"""BertAdam + schedule tests vs numpy transliterations of the reference."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax

from dldkd_tpu.optim import bert_adam, default_wd_mask, schedules


def np_bert_adam_step(p, g, m, v, step, lr, warmup, t_total,
                      b1=0.9, b2=0.999, eps=1e-6, wd=0.01, max_norm=1.0):
    """Reference BertAdam.step math (optimization.py:278-343) in numpy."""
    norm = np.sqrt((g ** 2).sum())
    if max_norm > 0 and norm > max_norm:
        g = g * (max_norm / (norm + 1e-6))
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    upd = m / (np.sqrt(v) + eps) + wd * p
    progress = step / t_total
    mult = progress / warmup if progress < warmup else max((progress - 1) / (warmup - 1), 0)
    return p - lr * mult * upd, m, v


def test_bert_adam_trajectory_matches_reference():
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    lr, warmup, t_total = 1e-3, 0.1, 50.0
    sched = schedules.warmup_linear(warmup, t_total)
    opt = bert_adam(lr, sched, weight_decay=0.01)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)

    p_np = p0.astype(np.float64).copy()
    m_np = np.zeros_like(p_np)
    v_np = np.zeros_like(p_np)
    for step in range(12):
        g = rng.randn(4, 3).astype(np.float32) * (3.0 if step % 3 else 0.1)
        upd, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, upd)
        p_np, m_np, v_np = np_bert_adam_step(
            p_np, g.astype(np.float64), m_np, v_np, step, lr, warmup, t_total)
        np.testing.assert_allclose(np.asarray(params["w"]), p_np,
                                   rtol=1e-5, atol=1e-6)


def test_first_step_is_noop_under_warmup():
    """schedule(0) = 0 -> the first update must not move the params
    (matches the reference's post-increment step counter)."""
    opt = bert_adam(1e-3, schedules.warmup_linear(0.1, 100.0))
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    upd, state = opt.update({"w": jnp.full((3,), 0.5)}, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.0)


def test_per_leaf_clipping_not_global():
    """Each tensor is clipped to max_norm independently."""
    opt = bert_adam(1.0, None, weight_decay=0.0, b1=0.0, b2=0.0, eps=0.0)
    params = {"a": jnp.zeros((2,)), "b": jnp.zeros((2,))}
    state = opt.init(params)
    grads = {"a": jnp.asarray([30.0, 40.0]),     # norm 50 -> clip to 1
             "b": jnp.asarray([0.3, 0.4])}       # norm 0.5 -> untouched
    upd, _ = opt.update(grads, state, params)
    # after clip: a = [0.6, 0.8]; m = g (b1=0), v = g^2 -> m/sqrt(v) = sign
    np.testing.assert_allclose(np.asarray(upd["a"]), [-1.0, -1.0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(upd["b"]), [-1.0, -1.0], rtol=1e-4)


def test_wd_mask_excludes_norms_and_biases():
    params = {
        "proj": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
        "input_norm": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "out_norm": {"scale": jnp.ones((2,)), "bias": jnp.ones((2,))},
        "pos_embed": jnp.ones((4, 2)),
    }
    mask = default_wd_mask(params)
    assert mask["proj"]["kernel"] is True
    assert mask["proj"]["bias"] is False
    assert mask["input_norm"]["scale"] is False
    assert mask["out_norm"]["bias"] is False
    assert mask["pos_embed"] is True  # embeddings ARE decayed in the reference


def test_epoch_decays_match_reference_formulas():
    kw = dict(exponential_k=0.95, linear_k=-0.01, linear_b=1.0, sigmoid_k=800.0)
    assert schedules.distill_weight("exp", 10, **kw) == 0.95 ** 10
    assert schedules.distill_weight("linear", 200, **kw) == 0.05
    s = schedules.distill_weight("sigmoid", 7, **kw)
    assert abs(s - 800 / (800 + math.exp(700 / 800))) < 1e-12
    assert schedules.distill_weight("None", 5, **kw) == 1.0

    a = schedules.alpha_schedule("cosine", 30, 0.8, 120, 0.95, 800.0)
    want = 0.5 * 0.8 * (1 + math.cos(math.pi * 30 / 120))
    assert abs(a - want) < 1e-12
    # belta floors at 0.5 when initial >= 0.5
    b = schedules.belta_schedule("exp", 1000, 0.8, 120, 0.95, 800.0)
    assert b == 0.5
    b2 = schedules.belta_schedule("exp", 1000, 0.4, 120, 0.95, 800.0)
    assert b2 < 1e-9


def test_lr_schedule_shapes():
    f = schedules.make_lr_schedule("warmup_linear", 0.01, 1000.0)
    xs = [float(f(jnp.asarray(s, jnp.float32))) for s in (0, 5, 10, 500, 1000, 1200)]
    assert xs[0] == 0.0
    assert abs(xs[1] - 0.5) < 1e-6
    assert abs(xs[2] - 1.0) < 1e-6
    assert 0 < xs[3] < 1
    assert xs[4] == 0.0 and xs[5] == 0.0
