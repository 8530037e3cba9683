"""Golden tests: vectorized JAX losses vs numpy transliterations of the
reference math (tests/reference_math.py), including padded-query batches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dldkd_tpu.ops import losses
from tests import reference_math as ref


def make_batch(seed=0, nq=11, nv=4, pad_to=16, scale=3.0):
    """Random scores with labels covering every video; valid queries form a
    prefix, grouped by video (video 0's captions first) like the sorted
    reference batch."""
    rng = np.random.RandomState(seed)
    labels = np.sort(rng.randint(0, nv, size=nq))
    # ensure every video has >= 1 caption
    labels[:nv] = np.arange(nv)
    labels = np.sort(labels)
    scores = rng.randn(nq, nv).astype(np.float32) * scale
    sims = rng.randn(nq, nv).astype(np.float32) * scale
    pad_labels = np.full(pad_to, -1, np.int32)
    pad_labels[:nq] = labels
    pad_scores = rng.randn(pad_to, nv).astype(np.float32) * 100  # junk in padding
    pad_scores[:nq] = scores
    pad_sims = rng.randn(pad_to, nv).astype(np.float32) * 100
    pad_sims[:nq] = sims
    return scores, sims, labels, pad_scores, pad_sims, pad_labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_clip_nce_matches_reference(seed):
    scores, _, labels, pscores, _, plabels = make_batch(seed)
    want = ref.ref_clip_nce(labels, scores.astype(np.float64))
    got = losses.clip_nce(jnp.asarray(pscores), jnp.asarray(plabels))
    np.testing.assert_allclose(float(got), want, rtol=2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("alpha,belta", [(0.8, 0.8), (0.5, 0.6), (0.0, 0.8), (1.0, 0.8)])
def test_clip_nce_soft_matches_reference(seed, alpha, belta):
    scores, sims, labels, pscores, psims, plabels = make_batch(seed)
    want = ref.ref_clip_nce_soft(labels, scores.astype(np.float64),
                                 sims.astype(np.float64), alpha, belta)
    got = losses.clip_nce_soft(
        jnp.asarray(pscores), jnp.asarray(psims), jnp.asarray(plabels),
        jnp.float32(alpha), jnp.float32(belta))
    np.testing.assert_allclose(float(got), want, rtol=3e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_frame_kl_matches_reference(seed):
    rng = np.random.RandomState(seed)
    nq, nv, L, pad_to = 7, 3, 9, 12
    labels = rng.randint(0, nv, size=nq)
    # variable-length valid frame prefixes
    lens = rng.randint(2, L + 1, size=nv)
    mask = np.zeros((nv, L), np.float32)
    for v, m in enumerate(lens):
        mask[v, :m] = 1
    student = rng.randn(nq, L, nv).astype(np.float32)
    teacher = rng.randn(nq, L, nv).astype(np.float32)
    # reference applies mask_logits before KL (scores arrive masked)
    student_m = ref.mask_logits(student, mask.T[None])
    teacher_m = ref.mask_logits(teacher, mask.T[None])
    want = ref.ref_frame_kl(student_m.astype(np.float64),
                            teacher_m.astype(np.float64), mask, labels)

    plabels = np.full(pad_to, -1, np.int32)
    plabels[:nq] = labels
    pstudent = np.zeros((pad_to, L, nv), np.float32)
    pstudent[:nq] = student_m
    pteacher = np.zeros((pad_to, L, nv), np.float32)
    pteacher[:nq] = teacher_m
    got = losses.frame_kl_loss(jnp.asarray(pstudent), jnp.asarray(pteacher),
                               jnp.asarray(mask), jnp.asarray(plabels))
    np.testing.assert_allclose(float(got), want, rtol=2e-4, atol=1e-5)


def test_triplet_hard_v2t_matches_reference():
    scores, _, labels, pscores, _, plabels = make_batch(3, nq=9, nv=4, scale=0.5)
    margin = 0.2
    want_v2t, t2v_pos = ref.ref_triplet_pos_terms(scores, labels, margin, True)
    # With hard negatives, v2t is deterministic. t2v samples a rank in
    # [1, 1+pool); with pool >= nv-1 every non-positive is in the support.
    key = jax.random.PRNGKey(0)
    got = losses.clip_triplet_loss(jnp.asarray(pscores), jnp.asarray(plabels),
                                   key, margin, True, 20)
    # decompose: run many keys; the v2t part is constant, so min/max over
    # keys bound the stochastic t2v contribution.
    vals = [float(losses.clip_triplet_loss(jnp.asarray(pscores),
                                           jnp.asarray(plabels),
                                           jax.random.PRNGKey(k), margin, True, 20))
            for k in range(24)]
    nq, nv = scores.shape
    # worst/best-case t2v negatives per query
    masked = scores.copy()
    masked[np.arange(nq), labels] = -np.inf
    worst = np.maximum(margin + np.sort(masked, axis=1)[:, -1] - t2v_pos, 0).sum() / nq
    best_neg = np.where(np.isfinite(masked), masked, np.inf).min(axis=1)
    best = np.maximum(margin + best_neg - t2v_pos, 0).sum() / nq
    lo = want_v2t / nv + best - 1e-5
    hi = want_v2t / nv + worst + 1e-5
    assert all(lo <= v <= hi for v in vals), (lo, hi, vals)
    assert float(got) >= lo


def test_triplet_uniform_sampling_support():
    """Non-hard mode: sampled negative must never be the positive."""
    rng = np.random.RandomState(0)
    nq, nv = 6, 5
    labels = np.arange(nq) % nv
    scores = rng.randn(nq, nv).astype(np.float32)
    plabels = np.concatenate([labels, [-1, -1]]).astype(np.int32)
    pscores = np.concatenate([scores, 100 * np.ones((2, nv), np.float32)])
    for k in range(8):
        out = losses.clip_triplet_loss(jnp.asarray(pscores), jnp.asarray(plabels),
                                       jax.random.PRNGKey(k), 0.2, False, 20)
        assert np.isfinite(float(out))


def test_padding_invariance():
    """Adding more padded queries must not change any loss value."""
    scores, sims, labels, p16s, p16t, p16l = make_batch(5, nq=10, nv=4, pad_to=16)
    _, _, _, p32s, p32t, p32l = make_batch(5, nq=10, nv=4, pad_to=32)
    a, b = jnp.float32(0.7), jnp.float32(0.8)
    for fn in (
        lambda s, t, l: losses.clip_nce(s, l),
        lambda s, t, l: losses.clip_nce_soft(s, t, l, a, b),
    ):
        v16 = float(fn(jnp.asarray(p16s), jnp.asarray(p16t), jnp.asarray(p16l)))
        v32 = float(fn(jnp.asarray(p32s), jnp.asarray(p32t), jnp.asarray(p32l)))
        np.testing.assert_allclose(v16, v32, rtol=1e-5)


def test_losses_jit_and_grad():
    """Whole loss stack must jit and differentiate without NaNs."""
    scores, sims, labels, pscores, psims, plabels = make_batch(7)

    def total(s):
        l1 = losses.clip_nce(s, jnp.asarray(plabels))
        l2 = losses.clip_nce_soft(s, jnp.asarray(psims), jnp.asarray(plabels),
                                  jnp.float32(0.8), jnp.float32(0.8))
        return l1 + l2

    g = jax.jit(jax.grad(total))(jnp.asarray(pscores))
    assert np.all(np.isfinite(np.asarray(g)[: len(labels)]))
