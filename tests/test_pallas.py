"""Pallas fused similarity kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on a real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dldkd_tpu.ops.pallas.sim_max import fused_clip_scores
from dldkd_tpu.ops.similarity import clip_scores, clip_scores_maxpool


@pytest.mark.parametrize("nq,nv,L,d", [(16, 128, 16, 32), (32, 256, 8, 64)])
def test_fused_matches_xla(nq, nv, L, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
    ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
    mask = (rng.rand(nv, L) < 0.7).astype(np.float32)
    mask[:, 0] = 1.0
    mask = jnp.asarray(mask)

    want, _ = clip_scores(q, ctx, mask)
    got = fused_clip_scores(q, ctx, mask, q_tile=nq, l_tile=4,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fully_masked_video_scores_neg_inf():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    ctx = jnp.asarray(rng.randn(128, 8, 32).astype(np.float32))
    mask = np.ones((128, 8), np.float32)
    mask[5] = 0.0  # a padding video
    got = fused_clip_scores(q, ctx, jnp.asarray(mask), q_tile=8, l_tile=2,
                            interpret=True)
    assert np.all(np.asarray(got)[:, 5] <= -1e9)


@pytest.mark.parametrize("nq,nv,L", [(50, 2179, 100), (7, 130, 9)])
def test_maxpool_dispatch_pads_arbitrary_shapes(nq, nv, L):
    """clip_scores_maxpool pads awkward real-world shapes (TVR val sizes)
    to the kernel grid and slices back; must match the XLA path exactly."""
    rng = np.random.RandomState(2)
    d = 32
    q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
    ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
    mask = (rng.rand(nv, L) < 0.8).astype(np.float32)
    mask[:, 0] = 1.0
    mask = jnp.asarray(mask)

    want, _ = clip_scores(q, ctx, mask)
    got = clip_scores_maxpool(q, ctx, mask, prefer_pallas=True,
                              interpret=True)
    assert got.shape == (nq, nv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # CPU fallback path (prefer_pallas=None on a CPU backend)
    fallback = clip_scores_maxpool(q, ctx, mask)
    np.testing.assert_allclose(np.asarray(fallback), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_maxpool_under_shard_map_matches_unsharded():
    """The production eval layout: corpus sharded over the mesh, queries
    replicated, kernel per-device under shard_map (interpret mode here —
    Mosaic compiles the same kernel on a real TPU)."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dldkd_tpu.parallel import make_mesh
    from dldkd_tpu.parallel.mesh import DATA_AXIS

    rng = np.random.RandomState(3)
    nq, nv, L, d = 6, 20, 5, 16   # nv=20 over 4 devices -> ragged 5/shard
    q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
    ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
    mask = jnp.asarray((rng.rand(nv, L) < 0.8).astype(np.float32))

    mesh = make_mesh(4)
    fn = shard_map(
        functools.partial(clip_scores_maxpool, prefer_pallas=True,
                          interpret=True),
        mesh=mesh, in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(None, DATA_AXIS), check_vma=False)
    got = np.asarray(fn(q, ctx, mask))

    want, _ = clip_scores(q, ctx, mask)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_shape_validation():
    q = jnp.zeros((10, 16))
    ctx = jnp.zeros((128, 8, 16))
    mask = jnp.ones((128, 8))
    with pytest.raises(ValueError, match="must tile"):
        fused_clip_scores(q, ctx, mask, q_tile=16, interpret=True)
    with pytest.raises(ValueError, match="dim mismatch"):
        fused_clip_scores(jnp.zeros((16, 8)), ctx, mask, q_tile=16,
                          interpret=True)


class TestInt8Scoring:
    """int8-quantized scoring path (the serving speed knob): approximate
    scores with bounded error, exact ranking on separated data."""

    def test_scores_within_quantization_error(self):
        rng = np.random.RandomState(4)
        nq, nv, L, d = 16, 128, 8, 64
        q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
        ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
        mask = (rng.rand(nv, L) < 0.7).astype(np.float32)
        mask[:, 0] = 1.0
        mask = jnp.asarray(mask)

        want, _ = clip_scores(q, ctx, mask)
        got = fused_clip_scores(q, ctx, mask, q_tile=nq, l_tile=4,
                                quantized=True, interpret=True)
        valid = np.asarray(want) > -1e9
        # per-component quant error <= 0.5/127; dot error ~ sqrt(d)/254
        err = np.abs(np.asarray(got) - np.asarray(want))[valid]
        assert err.max() < 0.05, err.max()

    def test_rank_preserved_on_planted_structure(self):
        """GT videos planted measurably closer: int8 and f32 paths must
        produce identical rank-of-GT (the bench/serving guarantee)."""
        from dldkd_tpu.metrics import rank_of_gt

        rng = np.random.RandomState(5)
        nq, nv, L, d = 32, 256, 8, 64
        base = rng.randn(nv, L, d).astype(np.float32)
        gt = rng.randint(0, nv, nq)
        q = np.asarray(base[gt].mean(axis=1))  # queries near their GT video
        q += 0.05 * rng.randn(nq, d).astype(np.float32)
        mask = jnp.ones((nv, L), np.float32)
        q, ctx = jnp.asarray(q), jnp.asarray(base)

        exact = fused_clip_scores(q, ctx, mask, q_tile=nq, l_tile=4,
                                  interpret=True)
        quant = fused_clip_scores(q, ctx, mask, q_tile=nq, l_tile=4,
                                  quantized=True, interpret=True)
        gt = jnp.asarray(gt.astype(np.int32))
        np.testing.assert_array_equal(np.asarray(rank_of_gt(exact, gt)),
                                      np.asarray(rank_of_gt(quant, gt)))

    def test_fully_masked_video_never_wins(self):
        rng = np.random.RandomState(6)
        q = jnp.asarray(rng.randn(8, 32).astype(np.float32))
        ctx = jnp.asarray(rng.randn(128, 8, 32).astype(np.float32))
        mask = np.ones((128, 8), np.float32)
        mask[5] = 0.0
        got = fused_clip_scores(q, ctx, jnp.asarray(mask), q_tile=8,
                                l_tile=2, quantized=True, interpret=True)
        got = np.asarray(got)
        assert np.all(got[:, 5] < -1e4)       # dequantized INT8_MASK_BIAS
        assert np.all(got[:, 5] < got[:, :5].min())

    def test_maxpool_dispatch_quantized(self):
        rng = np.random.RandomState(7)
        nq, nv, L, d = 7, 130, 9, 32
        q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
        ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
        mask = (rng.rand(nv, L) < 0.8).astype(np.float32)
        mask[:, 0] = 1.0
        mask = jnp.asarray(mask)
        want, _ = clip_scores(q, ctx, mask)
        got = clip_scores_maxpool(q, ctx, mask, prefer_pallas=True,
                                  quantized=True, interpret=True)
        valid = np.asarray(want) > -1e9
        assert np.abs(np.asarray(got) - np.asarray(want))[valid].max() < 0.05

    def test_kernel_and_xla_fallback_agree_exactly(self):
        """Both int8 paths are integer arithmetic (< 2^24, f32-exact in
        the fallback) over the same quantized values: valid-frame scores
        must agree BITWISE, so score_quant gives identical results on and
        off TPU."""
        rng = np.random.RandomState(8)
        nq, nv, L, d = 16, 256, 8, 48
        q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
        ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
        mask = (rng.rand(nv, L) < 0.7).astype(np.float32)
        mask[:, 0] = 1.0
        mask = jnp.asarray(mask)

        kern = clip_scores_maxpool(q, ctx, mask, prefer_pallas=True,
                                   quantized=True, interpret=True)
        xla = clip_scores_maxpool(q, ctx, mask, prefer_pallas=False,
                                  quantized=True)
        np.testing.assert_array_equal(np.asarray(kern), np.asarray(xla))


class TestQ8Index:
    """Prebuilt int8 scoring index (build_q8_index +
    clip_scores_maxpool_pre8): the per-call normalize+quantize+transpose
    pre-pass moves to index-build time; scores must stay BITWISE those of
    the quantized=True path on the same quantized components."""

    def _inputs(self, seed=9, nq=7, nv=130, L=9, d=32):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(nq, d).astype(np.float32))
        ctx = jnp.asarray(rng.randn(nv, L, d).astype(np.float32))
        mask = (rng.rand(nv, L) < 0.8).astype(np.float32)
        mask[:, 0] = 1.0  # every real video keeps >=1 valid frame
        return q, ctx, jnp.asarray(mask)

    def test_pre8_matches_quantized_path_bitwise(self):
        from dldkd_tpu.ops.pallas.sim_max import (build_q8_index,
                                                  quantize_frames_q8)
        from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

        q, ctx, mask = self._inputs()
        nv = ctx.shape[0]
        want = clip_scores_maxpool(q, ctx, mask, prefer_pallas=True,
                                   quantized=True, interpret=True)
        ctx_t, bias = build_q8_index(quantize_frames_q8(ctx), mask)
        got = clip_scores_maxpool_pre8(q, ctx_t, bias, prefer_pallas=True,
                                       interpret=True)[:, :nv]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_pre8_xla_fallback_bitwise_equal(self):
        from dldkd_tpu.ops.pallas.sim_max import (build_q8_index,
                                                  quantize_frames_q8)
        from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

        q, ctx, mask = self._inputs(seed=10)
        ctx_t, bias = build_q8_index(quantize_frames_q8(ctx), mask)
        kern = clip_scores_maxpool_pre8(q, ctx_t, bias, prefer_pallas=True,
                                        interpret=True)
        xla = clip_scores_maxpool_pre8(q, ctx_t, bias, prefer_pallas=False)
        # valid-video columns are integer arithmetic on both paths; the
        # padded tail only needs to lose (f32 rounds the huge bias there)
        nv = ctx.shape[0]
        np.testing.assert_array_equal(np.asarray(kern)[:, :nv],
                                      np.asarray(xla)[:, :nv])
        assert np.asarray(xla)[:, nv:].max() < -1e4

    def test_padded_index_videos_never_win(self):
        from dldkd_tpu.ops.pallas.sim_max import (build_q8_index,
                                                  quantize_frames_q8)
        from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8

        q, ctx, mask = self._inputs(seed=11, nv=100)  # pads 100 -> 128
        ctx_t, bias = build_q8_index(quantize_frames_q8(ctx), mask)
        got = np.asarray(clip_scores_maxpool_pre8(
            q, ctx_t, bias, prefer_pallas=True, interpret=True))
        assert got.shape[1] == 128
        assert got[:, 100:].max() < got[:, :100].min()

    def test_build_pads_frame_axis_to_tile(self):
        from dldkd_tpu.ops.pallas.sim_max import (build_q8_index,
                                                  pick_q8_l_tile,
                                                  quantize_frames_q8)

        _, ctx, mask = self._inputs(seed=12, L=9)
        ctx_t, bias = build_q8_index(quantize_frames_q8(ctx), mask)
        l_tile = pick_q8_l_tile(ctx.shape[-1])
        assert ctx_t.shape[0] % l_tile == 0 and ctx_t.shape[0] >= 9
        assert bias.shape == ctx_t.shape[:2]
        # padded frames carry the mask bias
        assert int(np.asarray(bias)[9:].max()) < 0


def test_q8_transposed_emission_matches_built_index():
    """q8_transposed: the dual context kernel writes the scoring-index
    layout directly — valid region identical to build_q8_index of the
    untransposed emission; pad positions carry computed (masked-out)
    values that the bias keeps out of every score."""
    import jax

    from dldkd_tpu.config import ModelConfig
    from dldkd_tpu.models import DLDKD
    from dldkd_tpu.ops.pallas.query_tower import (
        context_weights_for_branch, fused_context_tower_dual)
    from dldkd_tpu.ops.pallas.sim_max import build_q8_index, q8_index_bias
    from dldkd_tpu.ops.similarity import clip_scores_maxpool_pre8
    from dldkd_tpu.train import init_params

    mcfg = ModelConfig(visual_input_size=40, query_input_size=24,
                       inheritance_hidden=16, exploration_hidden=16,
                       max_ctx_l=12, max_desc_l=6, n_heads=2,
                       double_branch=True, dtype="bfloat16")
    params = init_params(DLDKD(config=mcfg), mcfg, 0)
    rng = np.random.RandomState(1)
    vf = jnp.asarray(rng.randn(9, 12, 40).astype(np.float32) * 3)
    vm = np.ones((9, 12), np.float32)
    vm[2, 5:] = 0.0
    vm = jnp.asarray(vm)
    wa = context_weights_for_branch(params, "inheritance", jnp.bfloat16)
    wb = context_weights_for_branch(params, "exploration", jnp.bfloat16)

    q8a, q8b = fused_context_tower_dual(vf, vm, wa, wb, n_heads=2,
                                        emit_q8=True, interpret=True)
    ta, tb = fused_context_tower_dual(vf, vm, wa, wb, n_heads=2,
                                      emit_q8=True, q8_transposed=True,
                                      interpret=True)
    want_ta, want_bias = build_q8_index(q8a, vm)
    assert ta.shape == want_ta.shape and ta.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(ta)[:12, :9],
                                  np.asarray(want_ta)[:12, :9])
    np.testing.assert_array_equal(
        np.asarray(tb)[:12, :9],
        np.asarray(build_q8_index(q8b, vm)[0])[:12, :9])
    bias = q8_index_bias(vm, ta.shape[0], ta.shape[1])
    np.testing.assert_array_equal(np.asarray(bias), np.asarray(want_bias))

    q = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    s_t = np.asarray(clip_scores_maxpool_pre8(q, ta, bias,
                                              prefer_pallas=True,
                                              interpret=True))
    s_w = np.asarray(clip_scores_maxpool_pre8(q, want_ta, want_bias,
                                              prefer_pallas=True,
                                              interpret=True))
    np.testing.assert_array_equal(s_t[:, :9], s_w[:, :9])
    assert s_t[:, 9:].max() < s_t[:, :9].min()


def test_pick_tiles_policy():
    """The shared fused-kernel tile policy (ops/similarity._pick_tiles):
    every scoring entry point routes through it, so its contract is pinned
    once here — VMEM-budget fit, the padded-query-count preference among
    the two largest fitting tiles, the reduced-precision-only 2048 tile,
    and never tiling past the (128-rounded) query count."""
    from dldkd_tpu.ops.similarity import _pick_tiles

    # TVR serving scale: int8 queries (itemsize 1) at D=384 fit the 2048
    # candidate, but 11264 queries pad to 12288 under 2048 vs 11264 under
    # 1024 — the policy prefers 8% less MXU work over one fewer pass
    assert _pick_tiles(11264, 384, 1) == (1024, None)
    # exact multiple of 2048 -> no padding either way -> bigger tile wins
    assert _pick_tiles(12288, 384, 1) == (2048, None)
    # f32 queries never see the 2048 candidate
    assert _pick_tiles(12288, 384, 4)[0] == 1024
    # small batches never tile past the 128-rounded query count
    assert _pick_tiles(64, 384, 4)[0] == 128
    assert _pick_tiles(200, 384, 4)[0] == 256
    # VMEM budget halves the winning tile as d * itemsize grows: at
    # d=4096 f32, 1024 * 4096 * 4 = 16 MB > 4 MB half-budget -> 256
    assert _pick_tiles(100000, 4096, 4)[0] == 256
    # frame tile obeys its own half-budget with the STORED itemsize and
    # never hits zero
    _, lt = _pick_tiles(1024, 384, 4, 2)
    assert lt is not None and 1 <= lt <= 16
    _, lt_f32 = _pick_tiles(1024, 4096, 4, 4)
    assert lt_f32 >= 1
