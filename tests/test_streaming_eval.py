"""Corpus-streaming eval: block-streamed metrics == corpus-resident
metrics, for any block size, both precisions, both branch counts."""

import numpy as np
import pytest

from dldkd_tpu.config import ModelConfig
from dldkd_tpu.data.ingest import PackedQueries, PackedVideos
from dldkd_tpu.evaluate import eval_retrieval, eval_retrieval_streaming
from dldkd_tpu.models import DLDKD
from dldkd_tpu.train import init_params

L, DV, DQ, LQ = 8, 16, 12, 4
N_VID, N_Q = 37, 23  # awkward sizes: exercise block/batch padding


def _data(seed=0):
    rng = np.random.RandomState(seed)
    vmask = np.ones((N_VID, L), np.float32)
    vmask[rng.rand(N_VID, L) < 0.2] = 0.0
    vmask[:, 0] = 1.0
    videos = PackedVideos(feats=rng.randn(N_VID, L, DV).astype(np.float32),
                          mask=vmask,
                          ids=[f"v{i}" for i in range(N_VID)])
    qmask = np.ones((N_Q, LQ), np.float32)
    gt_vids = [videos.ids[rng.randint(N_VID)] for _ in range(N_Q)]
    queries = PackedQueries(feats=rng.randn(N_Q, LQ, DQ).astype(np.float32),
                            mask=qmask,
                            cap_ids=[f"{v}#enc#{i}"
                                     for i, v in enumerate(gt_vids)],
                            video_ids=gt_vids)
    return videos, queries


@pytest.fixture(scope="module", params=[True, False],
                ids=["double", "single"])
def model_and_data(request):
    mcfg = ModelConfig(visual_input_size=DV, query_input_size=DQ,
                       inheritance_hidden=8, exploration_hidden=8,
                       max_ctx_l=L, max_desc_l=LQ, n_heads=2,
                       double_branch=request.param, label_style="soft")
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)
    videos, queries = _data()
    ref = eval_retrieval(model, params, videos, queries,
                         context_bsz=8, query_bsz=8)
    return model, params, videos, queries, ref


@pytest.mark.parametrize("block", [5, 16, 37, 64])
def test_streaming_matches_monolithic(model_and_data, block):
    """Any block size — dividing, non-dividing, single-block, larger than
    the corpus — reproduces the corpus-resident metrics exactly."""
    model, params, videos, queries, ref = model_and_data
    out = eval_retrieval_streaming(model, params, videos, queries,
                                   corpus_block=block, query_bsz=8)
    assert out.keys() == ref.keys()
    for branch in ref:
        for k, v in ref[branch].items():
            assert out[branch][k] == pytest.approx(v, abs=1e-9), \
                (branch, k)


def test_streaming_quantized_matches_monolithic_quantized(model_and_data):
    model, params, videos, queries, _ = model_and_data
    ref = eval_retrieval(model, params, videos, queries,
                         context_bsz=8, query_bsz=8, score_quant=True)
    out = eval_retrieval_streaming(model, params, videos, queries,
                                   corpus_block=10, query_bsz=8,
                                   score_quant=True)
    for branch in ref:
        for k, v in ref[branch].items():
            assert out[branch][k] == pytest.approx(v, abs=1e-9)


def test_eval_retrieval_dispatches_streaming(model_and_data):
    """corpus_stream_bsz on the public entry point routes to streaming."""
    model, params, videos, queries, ref = model_and_data
    out = eval_retrieval(model, params, videos, queries, query_bsz=8,
                         corpus_stream_bsz=9)
    for branch in ref:
        assert out[branch]["sumr"] == pytest.approx(ref[branch]["sumr"])


def test_auto_dispatch_by_memory_budget(model_and_data, monkeypatch):
    """Default (corpus_stream_bsz=None) picks the engine from the device
    budget: an over-budget corpus routes to streaming automatically with
    identical metrics; an in-budget one stays resident."""
    import dldkd_tpu.evaluate as ev

    model, params, videos, queries, ref = model_and_data
    calls = []
    real_streaming = ev.eval_retrieval_streaming

    def spy(*a, **k):
        calls.append(k.get("corpus_block"))
        return real_streaming(*a, **k)

    monkeypatch.setattr(ev, "eval_retrieval_streaming", spy)

    # tiny budget -> the resident estimate can't fit -> streams
    monkeypatch.setenv("DLDKD_EVAL_MEM_BUDGET", str(1024))
    out = ev.eval_retrieval(model, params, videos, queries, query_bsz=8)
    assert calls == [min(ev.DEFAULT_STREAM_BLOCK, N_VID)]
    for branch in ref:
        for k, v in ref[branch].items():
            assert out[branch][k] == pytest.approx(v, abs=1e-9)

    # huge budget -> stays resident (no new streaming call)
    monkeypatch.setenv("DLDKD_EVAL_MEM_BUDGET", str(1 << 40))
    ev.eval_retrieval(model, params, videos, queries, query_bsz=8)
    assert len(calls) == 1
    # explicit 0 forces resident even under a tiny budget
    monkeypatch.setenv("DLDKD_EVAL_MEM_BUDGET", str(1024))
    ev.eval_retrieval(model, params, videos, queries, query_bsz=8,
                      corpus_stream_bsz=0)
    assert len(calls) == 1


def test_run_retrieval_eval_router(model_and_data, monkeypatch):
    """The drivers' entry point honors the config knob semantics:
    0 = auto, -1 = force resident, >0 = stream with that block."""
    from dataclasses import replace

    import dldkd_tpu.evaluate as ev
    from dldkd_tpu.config import EvalConfig

    model, params, videos, queries, ref = model_and_data
    calls = []
    real_streaming = ev.eval_retrieval_streaming
    monkeypatch.setattr(
        ev, "eval_retrieval_streaming",
        lambda *a, **k: (calls.append(k.get("corpus_block")),
                         real_streaming(*a, **k))[1])

    cfg = EvalConfig(eval_query_bsz=8, eval_context_bsz=8)
    monkeypatch.setenv("DLDKD_EVAL_MEM_BUDGET", str(1024))
    out = ev.run_retrieval_eval(model, params, videos, queries, cfg)
    assert calls == [min(ev.DEFAULT_STREAM_BLOCK, N_VID)]  # auto -> stream
    for branch in ref:
        assert out[branch]["sumr"] == pytest.approx(ref[branch]["sumr"])
    ev.run_retrieval_eval(model, params, videos, queries,
                          replace(cfg, corpus_stream_bsz=-1))
    assert len(calls) == 1                                 # forced resident
    ev.run_retrieval_eval(model, params, videos, queries,
                          replace(cfg, corpus_stream_bsz=9))
    assert calls[-1] == 9                                  # forced stream


def test_sharded_streaming_matches_monolithic(model_and_data):
    """Streaming + sharding composed (each device streams its slice of
    every block): metrics equal the single-device resident path for
    dividing and non-dividing block sizes, exact and int8."""
    import jax

    from dldkd_tpu.parallel import eval_retrieval_sharded_streaming, make_mesh

    assert jax.device_count() == 8
    model, params, videos, queries, ref = model_and_data
    mesh = make_mesh(8)
    for block, quant in ((16, False), (24, False), (64, True)):
        ref_q = ref if not quant else eval_retrieval(
            model, params, videos, queries, context_bsz=8, query_bsz=8,
            score_quant=True)
        out = eval_retrieval_sharded_streaming(
            model, params, videos, queries, mesh, corpus_block=block,
            query_bsz=8, score_quant=quant)
        for branch in ref_q:
            for k, v in ref_q[branch].items():
                assert out[branch][k] == pytest.approx(v, abs=1e-9), \
                    (block, quant, branch, k)


def test_auto_engine_accounts_for_q8_index():
    """score_quant halves/quarters the resident index (int8 vs bf16/f32),
    so a budget that forces streaming for the exact engine can keep the
    int8 engine resident."""
    from dldkd_tpu.config import ModelConfig
    from dldkd_tpu.evaluate import auto_stream_block, resident_eval_bytes

    mcfg = ModelConfig(visual_input_size=16, query_input_size=12,
                       inheritance_hidden=384, exploration_hidden=384,
                       max_ctx_l=128, max_desc_l=8, n_heads=2,
                       double_branch=True, dtype="float32")
    n_vid, n_q = 20000, 1000
    exact = resident_eval_bytes(n_vid, n_q, mcfg)
    quant = resident_eval_bytes(n_vid, n_q, mcfg, score_quant=True)
    assert quant < exact  # int8 itemsize 1 vs f32's 4
    budget = (exact + quant) // 2
    assert auto_stream_block(n_vid, n_q, mcfg, budget=budget) > 0
    assert auto_stream_block(n_vid, n_q, mcfg, budget=budget,
                             score_quant=True) == 0
