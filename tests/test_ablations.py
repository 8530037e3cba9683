"""Ablation losses / schedule variants / EMA — golden tests vs naive-loop
implementations of the reference math (model_components.py:28-83,238-265;
optimization.py:113-151,187-220)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dldkd_tpu.ops import losses
from dldkd_tpu.optim import ema_init, ema_swap, ema_update, schedules


@pytest.fixture()
def frame_setup():
    rng = np.random.RandomState(0)
    nq, L, nv = 7, 6, 5
    fx = rng.randn(nq, L, nv).astype(np.float32)
    ft = rng.randn(nq, L, nv).astype(np.float32)
    mask = np.zeros((nv, L), np.float32)
    for v in range(nv):
        mask[v, : rng.randint(1, L + 1)] = 1.0   # prefix masks
    labels = rng.randint(0, nv, nq).astype(np.int32)
    return fx, ft, mask, labels


def test_clip_mse_matches_naive():
    rng = np.random.RandomState(1)
    x3 = rng.randn(4, 6, 5).astype(np.float32)
    t3 = rng.randn(4, 6, 5).astype(np.float32)
    want = np.mean(np.sum((x3 - t3) ** 2, axis=1))
    got = float(losses.clip_mse(jnp.asarray(x3), jnp.asarray(t3)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    x2 = rng.randn(4, 5).astype(np.float32)
    t2 = rng.randn(4, 5).astype(np.float32)
    want2 = np.mean(np.sum((x2 - t2) ** 2, axis=-1))
    got2 = float(losses.clip_mse(jnp.asarray(x2), jnp.asarray(t2)))
    np.testing.assert_allclose(got2, want2, rtol=1e-5)


def test_clip_mse_pos_pair_matches_naive(frame_setup):
    fx, ft, mask, labels = frame_setup
    want = 0.0
    for i, lab in enumerate(labels):          # reference loop, mc.py:44-51
        m = int((mask[lab] > 0).sum())
        want += float(np.sum((fx[i, :m, lab] - ft[i, :m, lab]) ** 2) / m)
    got = float(losses.clip_mse_pos_pair(
        jnp.asarray(fx), jnp.asarray(ft), jnp.asarray(mask),
        jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_clip_mse_max_pos_pair_matches_naive(frame_setup):
    fx, ft, mask, labels = frame_setup
    sx, st = fx.max(axis=1), ft.max(axis=1)   # (Nq, Nv) clip scores
    want = sum(float((sx[i, l] - st[i, l]) ** 2)
               for i, l in enumerate(labels)) / len(labels)
    got = float(losses.clip_mse_max_pos_pair(
        jnp.asarray(sx), jnp.asarray(st), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_clip_mse_only_pos_max_matches_naive(frame_setup):
    fx, ft, mask, labels = frame_setup
    want = 0.0
    for i, lab in enumerate(labels):          # reference loop, mc.py:72-82
        m = int((mask[lab] > 0).sum())
        j = int(np.argmax(ft[i, :m, lab]))
        want += float((fx[i, j, lab] - ft[i, j, lab]) ** 2)
    got = float(losses.clip_mse_only_pos_max(
        jnp.asarray(fx), jnp.asarray(ft), jnp.asarray(mask),
        jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_frame_nce_matches_naive():
    rng = np.random.RandomState(2)
    b, L = 5, 4
    x = rng.randn(b, b, L).astype(np.float64)
    nom = np.zeros(b)
    den = np.zeros(b)
    for i in range(b):                        # reference math, mc.py:252-262
        nom[i] = np.log(np.sum(np.exp(x[i, i])))
        both = np.concatenate([x[i].ravel(), x[:, i].ravel()])
        den[i] = np.log(np.sum(np.exp(both)))
    want = float(np.mean(den - nom))
    got = float(losses.frame_nce(jnp.asarray(x.astype(np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_cosine_restart_schedules():
    import math

    t_total, warmup = 100.0, 0.1
    hard = schedules.make_lr_schedule("warmup_cosine_hard_restarts",
                                      warmup, t_total)
    # reference get_lr_ (optimization.py:123-129), cycles=1
    for step in (2, 15, 50, 95):
        prog = step / t_total
        if prog < warmup:
            want = prog / warmup
        else:
            after = (prog - warmup) / (1 - warmup)
            want = 0.5 * (1 + math.cos(math.pi * ((1.0 * after) % 1)))
        np.testing.assert_allclose(float(hard(step)), want, rtol=1e-5)

    wre = schedules.make_lr_schedule("warmup_cosine_warmup_restarts",
                                     warmup, t_total)
    # cycles=1: every part identical to plain warmup_cosine
    for step in (2, 15, 50, 95):
        prog = (step / t_total) % 1.0
        w = warmup
        if prog < w:
            want = prog / w
        else:
            want = 0.5 * (1 + math.cos(math.pi * (prog - w) / (1 - w)))
        np.testing.assert_allclose(float(wre(step)), want, rtol=1e-5)


def test_ema_matches_reference_update():
    rng = np.random.RandomState(3)
    params = {"a": rng.randn(3).astype(np.float32),
              "b": rng.randn(2, 2).astype(np.float32)}
    shadow = ema_init(params)
    new_p = {k: v + 1.0 for k, v in params.items()}
    step = 4
    d = min(0.999, (1 + step) / (10.0 + step))
    shadow = ema_update(shadow, new_p, step)
    for k in params:
        want = (1 - d) * new_p[k] + d * params[k]
        np.testing.assert_allclose(np.asarray(shadow[k]), want, rtol=1e-6)
    eval_p, saved = ema_swap(shadow, new_p)
    assert eval_p is shadow and saved is new_p
