"""Two-stage int8 -> exact-f32 rescoring: rank-exact fast serving.

int8 scores live on a discrete grid, so adversarially CLUSTERED corpora
(many near-duplicate videos) produce exact ties the int8-only path can
only break by video id — its ranks genuinely differ from the exact path
there. The two-stage path (int8 full-matrix shortlist of 4k, exact f32
rescore of the shortlist, index-sorted so tie-breaks match) must return
bitwise-identical top-k ids to the exact path on exactly this hard case.
"""

import numpy as np
import pytest

from dldkd_tpu.config import ModelConfig
from dldkd_tpu.data.ingest import PackedVideos
from dldkd_tpu.models import DLDKD
from dldkd_tpu.serving import Retriever
from dldkd_tpu.train import init_params

N_CLUSTERS, PER_CLUSTER, L, DV, DQ = 4, 16, 8, 16, 12
N_VID = N_CLUSTERS * PER_CLUSTER
N_Q, K = 12, 5


@pytest.fixture(scope="module")
def clustered():
    """Corpus of near-duplicate clusters: members differ by 1e-3
    perturbations — far below the int8 quantization band (~2.7e-3), far
    above f32 resolution, so int8 collapses each cluster to a tie while
    exact scoring ranks members strictly. Cluster members are interleaved
    over the id space (cluster = i % N_CLUSTERS)."""
    mcfg = ModelConfig(visual_input_size=DV, query_input_size=DQ,
                       inheritance_hidden=8, exploration_hidden=8,
                       max_ctx_l=L, max_desc_l=4, n_heads=2,
                       double_branch=True, label_style="soft")
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)

    rng = np.random.RandomState(7)
    bases = rng.randn(N_CLUSTERS, L, DV).astype(np.float32)
    feats = np.stack([
        bases[i % N_CLUSTERS]
        + 1e-3 * rng.randn(L, DV).astype(np.float32)
        for i in range(N_VID)])
    videos = PackedVideos(feats=feats, mask=np.ones((N_VID, L), np.float32),
                          ids=[f"v{i}" for i in range(N_VID)])
    qf = rng.randn(N_Q, 4, DQ).astype(np.float32)
    qm = np.ones((N_Q, 4), np.float32)
    return model, params, videos, qf, qm


def _searchers(model, params, videos, **kw):
    r = Retriever(model, params, query_bsz=8, **kw)
    r.mesh = None  # force the single-device path
    r.index(videos)
    return r


def test_two_stage_matches_exact_on_clustered_corpus(clustered):
    model, params, videos, qf, qm = clustered
    exact = _searchers(model, params, videos, score_quant=False)
    two_stage = _searchers(model, params, videos, score_quant=True,
                           rescore=True)
    int8_only = _searchers(model, params, videos, score_quant=True,
                           rescore=False)

    s_exact, i_exact = exact.search(qf, qm, k=K)
    s_two, i_two = two_stage.search(qf, qm, k=K)
    s_int8, i_int8 = int8_only.search(qf, qm, k=K)

    # the hard case actually bites: raw int8 ranks diverge from exact
    assert (i_int8 != i_exact).any(), \
        "corpus not adversarial enough — int8-only already exact"

    # two-stage: bitwise-identical ids, exact-valued scores
    np.testing.assert_array_equal(i_two, i_exact)
    np.testing.assert_allclose(s_two, s_exact, rtol=1e-5, atol=1e-6)


def test_two_stage_rk_bitwise_equal(clustered):
    """R@K computed from the served top-K lists is bitwise-equal between
    the two-stage fast path and the exact path (retires the uncharted
    int8 tie behavior on near-tie corpora)."""
    model, params, videos, qf, qm = clustered
    exact = _searchers(model, params, videos, score_quant=False)
    two_stage = _searchers(model, params, videos, score_quant=True,
                           rescore=True)
    rng = np.random.RandomState(3)
    gt = rng.randint(0, N_VID, size=N_Q)  # planted ground truth per query

    _, i_exact = exact.search(qf, qm, k=N_VID)
    _, i_two = two_stage.search(qf, qm, k=N_VID)
    for k in (1, 5, 10, 100):
        kk = min(k, N_VID)
        r_exact = np.mean([g in row[:kk] for g, row in zip(gt, i_exact)])
        r_two = np.mean([g in row[:kk] for g, row in zip(gt, i_two)])
        assert r_two == r_exact


def test_two_stage_sharded_matches_exact(clustered):
    """The corpus-sharded two-stage search (8-device mesh) equals the
    single-device exact path."""
    import jax

    assert jax.device_count() == 8
    model, params, videos, qf, qm = clustered
    exact = _searchers(model, params, videos, score_quant=False)
    sharded = Retriever(model, params, query_bsz=8, score_quant=True,
                        rescore=True)  # auto-mesh over all 8 devices
    assert sharded.mesh is not None
    sharded.index(videos)

    _, i_exact = exact.search(qf, qm, k=K)
    s_sh, i_sh = sharded.search(qf, qm, k=K)
    np.testing.assert_array_equal(i_sh, i_exact)


def test_rescore_shortlist_op():
    """rescore_shortlist == gathering rows of the full exact score
    matrix, including masked-frame handling and query-count padding."""
    import jax.numpy as jnp

    from dldkd_tpu.ops.similarity import clip_scores, rescore_shortlist

    rng = np.random.RandomState(1)
    nq, nv, l, d, kp = 11, 20, 6, 8, 7  # nq not divisible by chunk
    q = rng.randn(nq, d).astype(np.float32)
    ctx = rng.randn(nv, l, d).astype(np.float32)
    mask = (rng.rand(nv, l) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    cand = np.stack([rng.choice(nv, kp, replace=False) for _ in range(nq)])

    full = np.asarray(clip_scores(jnp.asarray(q), jnp.asarray(ctx),
                                  jnp.asarray(mask))[0])
    out = np.asarray(rescore_shortlist(jnp.asarray(q), jnp.asarray(ctx),
                                       jnp.asarray(mask),
                                       jnp.asarray(cand), chunk=4))
    want = np.take_along_axis(full, cand, axis=1)
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_raw_index_streaming_matches_encoded(clustered):
    """index_store='raw' (raw features resident, blocks re-encoded per
    search) returns the same results as the encoded-resident index — for
    the exact path AND the two-stage fast path on the clustered corpus.
    Block size chosen to NOT divide the corpus (padding path)."""
    model, params, videos, qf, qm = clustered

    for kw in (dict(score_quant=False),
               dict(score_quant=True, rescore=True)):
        encoded = _searchers(model, params, videos, **kw)
        raw = Retriever(model, params, query_bsz=8, mesh=None,
                        index_store="raw", stream_block=24, **kw)
        raw.index(videos)
        s_e, i_e = encoded.search(qf, qm, k=K)
        s_r, i_r = raw.search(qf, qm, k=K)
        np.testing.assert_array_equal(i_r, i_e)
        np.testing.assert_allclose(s_r, s_e, rtol=1e-5, atol=1e-6)


def test_raw_index_composes_with_mesh(clustered):
    """Round 4 lifted the r3 raw+mesh restriction: a raw index over a
    multi-device mesh must index and search (exhaustive id-for-id
    equality vs encoded/single-device lives in
    test_serving.test_raw_index_sharded_matches_encoded_and_single);
    bogus store names still raise."""
    from dldkd_tpu.parallel import make_mesh

    model, params, videos, qf, qm = clustered
    r = Retriever(model, params, query_bsz=8, mesh=make_mesh(8),
                  index_store="raw", stream_block=8)
    r.index(videos)
    _, idx = r.search(qf, qm, k=3)
    assert idx.shape == (qf.shape[0], 3)
    with pytest.raises(ValueError, match="index_store"):
        Retriever(model, params, index_store="bogus")


def test_shortlist_factor_covers_oversized_tie_groups(clustered):
    """When a near-tie group exceeds the default 4k shortlist, stage 1
    cannot guarantee containment; raising shortlist_factor restores
    exactness. Uses k=1: the 16-member clusters exceed k'=4."""
    model, params, videos, qf, qm = clustered
    exact = _searchers(model, params, videos, score_quant=False)
    _, i_exact = exact.search(qf, qm, k=1)

    deep = _searchers(model, params, videos, score_quant=True,
                      rescore=True, shortlist_factor=16)
    _, i_deep = deep.search(qf, qm, k=1)
    np.testing.assert_array_equal(i_deep, i_exact)

    # the default factor is allowed to miss here (16-way ties > k'=4);
    # if it ever becomes exact on this corpus the test above is vacuous,
    # so just document the comparison without asserting a miss
    shallow = _searchers(model, params, videos, score_quant=True,
                         rescore=True, shortlist_factor=4)
    _, i_shallow = shallow.search(qf, qm, k=1)
    assert i_shallow.shape == i_exact.shape


def test_int8_eval_rank_error_bounded_by_quant_band(clustered):
    """Characterizes int8 EVAL metrics on the near-tie corpus (the eval
    path has no rescoring stage): a ground truth's int8 rank may differ
    from its exact rank only by videos whose exact scores lie within the
    quantization band of the GT's score. Per-query provable bound:
    |rank_int8 - rank_exact| <= #{v != gt: |s_v - s_gt| <= 2*eps}, with
    eps the max absolute dequantized int8 error (ops/pallas/sim_max.py:
    scores are integers scaled by 1/127^2; each cosine input rounds
    within 1/254, so per-score error < ~2.7e-3 for unit vectors)."""
    import jax.numpy as jnp

    from dldkd_tpu.evaluate import embed_corpus, score_all_queries
    from dldkd_tpu.data.ingest import PackedQueries
    from dldkd_tpu.metrics import rank_of_gt

    model, params, videos, qf, qm = clustered
    rng = np.random.RandomState(9)
    gt = rng.randint(0, N_VID, size=N_Q)
    queries = PackedQueries(
        feats=qf, mask=qm,
        cap_ids=[f"v{g}#enc#{i}" for i, g in enumerate(gt)],
        video_ids=[f"v{g}" for g in gt])

    ctx_i, ctx_e, vmask = embed_corpus(model, params, videos, 16)
    s_i, s_e = score_all_queries(model, params, queries, ctx_i, ctx_e,
                                 vmask, query_bsz=8)
    q_i, q_e = score_all_queries(model, params, queries, ctx_i, ctx_e,
                                 vmask, query_bsz=8, score_quant=True)
    fused = np.asarray(0.7 * s_i + 0.3 * s_e)
    fused_q = np.asarray(0.7 * q_i + 0.3 * q_e)

    ranks = np.asarray(rank_of_gt(jnp.asarray(fused), jnp.asarray(gt)))
    ranks_q = np.asarray(rank_of_gt(jnp.asarray(fused_q), jnp.asarray(gt)))

    eps = 2.0 * (2.7e-3)  # band halfwidth on a score DIFFERENCE
    for q in range(N_Q):
        band = int(np.sum(np.abs(fused[q] - fused[q, gt[q]]) <= eps)) - 1
        assert abs(int(ranks_q[q]) - int(ranks[q])) <= band, \
            (q, ranks[q], ranks_q[q], band)
    # the corpus is adversarial enough that the bound is exercised
    assert (ranks_q != ranks).any()


def test_exact_clip_scores_matches_full_shortlist_rescore():
    """exact_clip_scores (the dense stage-2 engine) == rescore_shortlist
    with EVERY video in the shortlist, on both engines: the XLA HIGHEST
    fallback (f32-stored frames) and the split-3 Pallas kernel in
    interpret mode (bf16-stored frames, padded tile grid)."""
    import jax.numpy as jnp

    from dldkd_tpu.ops.pallas.sim_max import fused_exact_scores
    from dldkd_tpu.ops.similarity import exact_clip_scores, rescore_shortlist

    rng = np.random.RandomState(11)
    nq, nv, l, d = 9, 13, 5, 16
    q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
    ctx32 = jnp.asarray(rng.randn(nv, l, d).astype(np.float32))
    ctx16 = ctx32.astype(jnp.bfloat16)
    mask = (rng.rand(nv, l) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    mask = jnp.asarray(mask)
    cand = jnp.asarray(np.tile(np.arange(nv), (nq, 1)))

    # XLA fallback engine (f32 frames)
    want32 = np.asarray(rescore_shortlist(q, ctx32, mask, cand))
    got32 = np.asarray(exact_clip_scores(q, ctx32, mask))
    np.testing.assert_allclose(got32, want32, rtol=1e-6, atol=1e-6)

    # split-3 kernel engine (bf16 frames; divide-after-dot is ~1 ulp off
    # normalize-then-dot — that is the documented equivalence class)
    want16 = np.asarray(rescore_shortlist(q, ctx16, mask, cand))
    nq_p, nv_p, l_p = 256, 128, 16
    qp = jnp.pad(q, ((0, nq_p - nq), (0, 0)))
    cp = jnp.pad(ctx16, ((0, nv_p - nv), (0, l_p - l), (0, 0)))
    mp = jnp.pad(mask, ((0, nv_p - nv), (0, l_p - l)))
    got16 = np.asarray(fused_exact_scores(qp, cp, mp, q_tile=256,
                                          l_tile=16,
                                          interpret=True))[:nq, :nv]
    np.testing.assert_allclose(got16, want16, rtol=1e-6, atol=5e-7)

    # the dispatching wrapper routes bf16 ctx to the kernel
    got_d = np.asarray(exact_clip_scores(q, ctx16, mask, prefer_pallas=True,
                                         interpret=True))
    np.testing.assert_allclose(got_d, want16, rtol=1e-6, atol=5e-7)


def test_dense_rescore_cost_model_regimes():
    """The trace-time dispatch picks gather for small query batches and
    dense for batches whose combined shortlists out-read the corpus
    (constants measured on the v5e, BENCHMARKS.md round-5)."""
    from dldkd_tpu.ops.similarity import dense_rescore_wins

    # TVR serving scale, bf16 index: 1024-query batches go dense,
    # 256-query batches keep the gather
    assert dense_rescore_wins(1024, 40, 2304, 128, 384, 2)
    assert not dense_rescore_wins(256, 40, 2304, 128, 384, 2)
    # 8x-corpus scale: dense matmul cost dominates — gather stays
    assert not dense_rescore_wins(1024, 40, 18432, 128, 384, 2)
    # tiny CPU-test shapes: gather
    assert not dense_rescore_wins(8, 20, 64, 8, 16, 4)


def test_dense_rescore_env_override(monkeypatch):
    """DLDKD_DENSE_RESCORE pins the dispatch either way — the escape
    hatch when the v5e-measured constants mispredict on another part. A
    typo'd value must raise (the knob exists to override a mispredicting
    heuristic; silently falling back to it is the worst behavior), and
    the serving AOT cache key must split on the mode so an executable
    lowered under one dispatch never serves another."""
    import pytest as _pytest

    from dldkd_tpu.ops.similarity import dense_rescore_wins

    monkeypatch.setenv("DLDKD_DENSE_RESCORE", "never")
    assert not dense_rescore_wins(1024, 40, 2304, 128, 384, 2)  # auto: dense
    monkeypatch.setenv("DLDKD_DENSE_RESCORE", "always")
    assert dense_rescore_wins(8, 20, 64, 8, 16, 4)              # auto: gather
    monkeypatch.setenv("DLDKD_DENSE_RESCORE", " Never ")        # normalized
    assert not dense_rescore_wins(1024, 40, 2304, 128, 384, 2)
    monkeypatch.setenv("DLDKD_DENSE_RESCORE", "alwys")
    with _pytest.raises(ValueError, match="DLDKD_DENSE_RESCORE"):
        dense_rescore_wins(1024, 40, 2304, 128, 384, 2)
    monkeypatch.setenv("DLDKD_DENSE_RESCORE", "auto")
    assert dense_rescore_wins(1024, 40, 2304, 128, 384, 2)


def test_dense_rescore_mode_splits_aot_cache_key(clustered, monkeypatch):
    """The q8 executable-cache key differs across dispatch modes (with
    rescore) and is mode-independent without rescore (stage 2 never
    traces there, so an int8-only executable is mode-agnostic)."""
    model, params, videos, qf, qm = clustered

    def key_for(mode, rescore):
        monkeypatch.setenv("DLDKD_DENSE_RESCORE", mode)
        r = _searchers(model, params, videos, score_quant=True,
                       rescore=rescore, shortlist_factor=8)
        return r._q8_cache_key(r._q8_args(qf[:8], qm[:8], 3))

    assert key_for("auto", True) != key_for("never", True)
    assert key_for("never", True) != key_for("always", True)
    assert key_for("auto", False) == key_for("never", False)


def test_dense_and_gather_stage2_agree(clustered):
    """_rescore_stage2's two engines return identical ids and
    equal-grade scores on the clustered near-tie corpus, forced each way
    around the cost model (eager calls — no jit cache to go stale)."""
    import jax.numpy as jnp

    import dldkd_tpu.serving as serving
    from dldkd_tpu.evaluate import embed_corpus
    from dldkd_tpu.ops.fast_eval import encode_query_best
    from dldkd_tpu.ops.similarity import clip_scores_maxpool

    model, params, videos, qf, qm = clustered
    ctx_i, ctx_e, vmask = embed_corpus(model, params, videos, 16)
    q_i, q_e = encode_query_best(params, model.config, jnp.asarray(qf),
                                 jnp.asarray(qm))
    fw = jnp.asarray([0.7, 0.3], jnp.float32)
    s8 = (fw[0] * clip_scores_maxpool(q_i, ctx_i, vmask, quantized=True)
          + fw[1] * clip_scores_maxpool(q_e, ctx_e, vmask, quantized=True))

    real = serving.dense_rescore_wins
    try:
        serving.dense_rescore_wins = lambda *a: False
        s_g, i_g = serving._rescore_stage2(s8, q_i, q_e, ctx_i, ctx_e,
                                           vmask, fw, K, K, 4)
        serving.dense_rescore_wins = lambda *a: True
        s_d, i_d = serving._rescore_stage2(s8, q_i, q_e, ctx_i, ctx_e,
                                           vmask, fw, K, K, 4)
    finally:
        serving.dense_rescore_wins = real

    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_g))
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_g),
                               rtol=1e-5, atol=1e-6)


def test_dense_dispatch_search_matches_exact(clustered):
    """A whole search at shapes where the cost model picks DENSE (large
    query batch vs the small corpus, forced via a high shortlist_factor)
    still returns the exact path's ids — end-to-end through Retriever."""
    from dldkd_tpu.ops.similarity import dense_rescore_wins

    model, params, videos, _, _ = clustered
    rng = np.random.RandomState(21)
    nq = 128
    qf = rng.randn(nq, 4, DQ).astype(np.float32)
    qm = np.ones((nq, 4), np.float32)

    # shapes must actually trigger dense for this test to mean anything
    # (the dispatch sees the ENCODED frames: hidden dim 8, stored f32)
    assert dense_rescore_wins(nq, min(8 * K, N_VID), N_VID, L, 8, 4)

    exact = Retriever(model, params, query_bsz=nq, score_quant=False)
    exact.mesh = None
    exact.index(videos)
    dense = Retriever(model, params, query_bsz=nq, score_quant=True,
                      rescore=True, shortlist_factor=8)
    dense.mesh = None
    dense.index(videos)

    _, i_exact = exact.search(qf, qm, k=K)
    s_dense, i_dense = dense.search(qf, qm, k=K)
    np.testing.assert_array_equal(i_dense, i_exact)
