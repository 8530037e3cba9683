"""Eval engine tests: rank math vs argsort, batching invariance, fusion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dldkd_tpu.config import ModelConfig
from dldkd_tpu.data import BigFile, pack_query_set, pack_video_corpus, read_dict
from dldkd_tpu.data.ingest import dataset_paths, read_video_ids
from dldkd_tpu.data.synthetic import generate_dataset
from dldkd_tpu.evaluate import eval_retrieval, embed_corpus, score_all_queries
from dldkd_tpu.metrics import (
    build_gt_indices,
    metrics_from_ranks,
    rank_of_gt,
    t2v_metrics,
)
from dldkd_tpu.models import DLDKD


def ref_ranks_argsort(scores, gt_idx):
    """Reference eval_q2m ranking (eval.py:59-94): argsort of negated
    scores, stable tie-break by index."""
    neg = -scores
    ranks = np.zeros(len(scores), np.int64)
    for i in range(len(scores)):
        order = np.argsort(neg[i], kind="stable")
        ranks[i] = int(np.where(order == gt_idx[i])[0][0]) + 1
    return ranks


def test_rank_of_gt_matches_argsort():
    rng = np.random.RandomState(0)
    scores = rng.randn(30, 17).astype(np.float32)
    # inject exact ties
    scores[3, 5] = scores[3, 9]
    scores[7, :] = 0.25
    gt = rng.randint(0, 17, 30).astype(np.int32)
    got = np.asarray(rank_of_gt(jnp.asarray(scores), jnp.asarray(gt)))
    want = ref_ranks_argsort(scores, gt)
    np.testing.assert_array_equal(got, want)


def test_metrics_from_ranks():
    ranks = np.asarray([1, 2, 6, 11, 101, 50])
    m = metrics_from_ranks(ranks)
    assert m["r1"] == pytest.approx(100 / 6)
    assert m["r5"] == pytest.approx(200 / 6)
    assert m["r10"] == pytest.approx(300 / 6)
    assert m["r100"] == pytest.approx(500 / 6)
    assert m["sumr"] == pytest.approx(m["r1"] + m["r5"] + m["r10"] + m["r100"])
    assert m["medr"] == 8.5
    assert m["map"] == pytest.approx(np.mean(1.0 / ranks))


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_eval"))
    generate_dataset(root, n_videos={"train": 4, "val": 10, "test": 4},
                     frames_range=(5, 30), teacher_frames_range=(4, 12),
                     d_student=16, d_query=12, d_teacher=8, noise=0.1, seed=3)
    paths = dataset_paths(root, "synthetic", "i3d")
    bf = BigFile(paths["visual_feat_dir"])
    v2f = read_dict(paths["video2frames"])
    videos = pack_video_corpus(read_video_ids(paths["cap_file"]["val"]),
                               bf, v2f, max_ctx_l=16)
    queries = pack_query_set(paths["cap_file"]["val"], paths["text_feat"],
                             max_desc_l=8)
    cfg = ModelConfig(visual_input_size=16, query_input_size=12,
                      inheritance_hidden=8, exploration_hidden=8,
                      max_ctx_l=16, max_desc_l=8, n_heads=2,
                      double_branch=True)
    model = DLDKD(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(videos.feats[:2]), jnp.asarray(videos.mask[:2]),
                        jnp.asarray(queries.feats[:2]), jnp.asarray(queries.mask[:2]))
    return model, params, videos, queries


def test_eval_batching_invariance(eval_setup):
    """Score matrices must not depend on context/query batch sizes
    (padding rows are sliced away)."""
    model, params, videos, queries = eval_setup
    n = len(videos)
    ca, ea, ma = embed_corpus(model, params, videos, context_bsz=3)
    cb, eb, mb = embed_corpus(model, params, videos, context_bsz=10)
    # returns are padded to the context batch grid; padded rows carry
    # zero masks and never influence downstream scores
    assert ca.shape[0] == 12 and cb.shape[0] == 10
    assert not np.asarray(ma)[n:].any()
    np.testing.assert_allclose(np.asarray(ca)[:n], np.asarray(cb)[:n],
                               atol=1e-5)

    sa, xa = score_all_queries(model, params, queries, ca, ea, ma, query_bsz=4)
    sb, xb = score_all_queries(model, params, queries, cb, eb, mb, query_bsz=50)
    np.testing.assert_allclose(np.asarray(sa)[:, :n], np.asarray(sb)[:, :n],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xa)[:, :n], np.asarray(xb)[:, :n],
                               atol=1e-5)
    # padded score columns are the masked -1e10, never a contender
    assert np.asarray(sa)[:, n:].max() <= -1e9


def test_eval_retrieval_structure_and_fusion(eval_setup):
    model, params, videos, queries = eval_setup
    out = eval_retrieval(model, params, videos, queries,
                         context_bsz=4, query_bsz=7)
    assert set(out) == {"inher", "explore", "fused"}
    for branch in out.values():
        assert set(branch) >= {"r1", "r5", "r10", "r100", "sumr", "medr",
                               "meanr", "map"}
        assert 0 <= branch["sumr"] <= 400
    # fusion must equal metrics of the fused matrix computed directly
    ci, ce, m = embed_corpus(model, params, videos, context_bsz=4)
    si, se = score_all_queries(model, params, queries, ci, ce, m, query_bsz=7)
    gt = build_gt_indices(queries.video_ids, videos.ids)
    fused = 0.7 * np.asarray(si) + 0.3 * np.asarray(se)
    want = t2v_metrics(jnp.asarray(fused), jnp.asarray(gt))
    assert out["fused"]["sumr"] == pytest.approx(want["sumr"])


def test_single_branch_eval(eval_setup):
    _, _, videos, queries = eval_setup
    cfg = ModelConfig(visual_input_size=16, query_input_size=12,
                      inheritance_hidden=8, max_ctx_l=16, max_desc_l=8,
                      n_heads=2, double_branch=False)
    model = DLDKD(config=cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(videos.feats[:2]), jnp.asarray(videos.mask[:2]),
                        jnp.asarray(queries.feats[:2]), jnp.asarray(queries.mask[:2]))
    out = eval_retrieval(model, params, videos, queries,
                         context_bsz=4, query_bsz=7)
    assert "explore" not in out
    assert out["fused"] == out["inher"]


def test_eval_retrieval_score_quant_close_to_exact(eval_setup):
    """The int8 serving knob tracks the exact path's aggregate retrieval
    metrics closely. This fixture's model is RANDOM-INIT, so scores bunch
    within the ~2.7e-3 quantization error and a few near-ties may flip —
    tolerance reflects that. Exact rank preservation on separated
    (trained-like) scores is pinned by
    test_pallas.TestInt8Scoring.test_rank_preserved_on_planted_structure."""
    model, params, videos, queries = eval_setup
    exact = eval_retrieval(model, params, videos, queries,
                           context_bsz=4, query_bsz=7)
    quant = eval_retrieval(model, params, videos, queries,
                           context_bsz=4, query_bsz=7, score_quant=True)
    for branch in exact:
        assert quant[branch]["sumr"] == pytest.approx(
            exact[branch]["sumr"], abs=12), branch


def test_sharded_eval_score_quant_matches_unsharded(eval_setup):
    from dldkd_tpu.parallel import eval_retrieval_sharded, make_mesh

    model, params, videos, queries = eval_setup
    mesh = make_mesh(4)
    want = eval_retrieval(model, params, videos, queries,
                          context_bsz=4, query_bsz=7, score_quant=True)
    got = eval_retrieval_sharded(model, params, videos, queries, mesh,
                                 query_bsz=7, score_quant=True)
    for branch in want:
        assert got[branch]["sumr"] == pytest.approx(
            want[branch]["sumr"]), branch


def test_q8_engine_bitwise_matches_per_call_quantized(eval_setup):
    """The resident score_quant engine now scores against a PREBUILT int8
    index (towers emit it; evaluate.embed_corpus_q8): valid-video columns
    must be BITWISE the per-call-quantization scores, so metrics cannot
    move."""
    from dldkd_tpu.evaluate import embed_corpus_q8, score_all_queries_q8

    model, params, videos, queries = eval_setup
    n = len(videos)
    ci, ce, m = embed_corpus(model, params, videos, context_bsz=4)
    want_i, want_e = score_all_queries(model, params, queries, ci, ce, m,
                                       query_bsz=7, score_quant=True)

    q8_i, q8_e, bias = embed_corpus_q8(model, params, videos, context_bsz=4)
    assert q8_i.dtype == jnp.int8 and q8_i.shape[0] % 16 == 0
    got_i, got_e = score_all_queries_q8(model, params, queries, q8_i, q8_e,
                                        bias, query_bsz=7)
    np.testing.assert_array_equal(np.asarray(got_i)[:, :n],
                                  np.asarray(want_i)[:, :n])
    np.testing.assert_array_equal(np.asarray(got_e)[:, :n],
                                  np.asarray(want_e)[:, :n])
    # index-grid padding columns always lose (dequantized mask bias)
    assert np.asarray(got_i)[:, n:].max() < np.asarray(got_i)[:, :n].min()
