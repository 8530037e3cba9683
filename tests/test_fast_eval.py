"""Fused inference towers vs the Flax model: must match to float rounding
(f32 mode is the strong exactness check; the folding is algebra, not an
approximation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dldkd_tpu.config import ModelConfig
from dldkd_tpu.models import DLDKD
from dldkd_tpu.ops.fast_eval import encode_context_fast, encode_query_fast
from dldkd_tpu.train import init_params


@pytest.fixture(scope="module", params=[True, False],
                ids=["double", "single"])
def setup(request):
    mcfg = ModelConfig(visual_input_size=40, query_input_size=24,
                       inheritance_hidden=16, exploration_hidden=16,
                       max_ctx_l=12, max_desc_l=6, n_heads=2,
                       double_branch=request.param, label_style="soft")
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)
    # non-trivial params: random-normal everything so LN affines matter
    key = jax.random.PRNGKey(7)
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    params = jax.tree.unflatten(
        tree, [jax.random.normal(k, l.shape, l.dtype) * 0.5
               for k, l in zip(keys, leaves)])
    return model, mcfg, params


def _data(mcfg, n=9):
    rng = np.random.RandomState(1)
    vf = rng.randn(n, mcfg.max_ctx_l, mcfg.visual_input_size).astype(np.float32) * 3
    vm = np.ones((n, mcfg.max_ctx_l), np.float32)
    vm[2, 5:] = 0.0
    qf = rng.randn(n + 3, mcfg.max_desc_l, mcfg.query_input_size).astype(np.float32)
    qm = np.ones((n + 3, mcfg.max_desc_l), np.float32)
    qm[0, 2:] = 0.0
    return map(jnp.asarray, (vf, vm, qf, qm))


def test_context_fast_matches_model(setup):
    model, mcfg, params = setup
    vf, vm, _, _ = _data(mcfg)
    want_i, want_e = model.apply(params, vf, vm, deterministic=True,
                                 method="encode_context")
    got_i, got_e = encode_context_fast(params, mcfg, vf, vm)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=2e-4, atol=2e-5)
    assert (got_e is None) == (want_e is None)
    if want_e is not None:
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   rtol=2e-4, atol=2e-5)


def test_context_pallas_tower_matches_model(setup):
    """Whole-tower Pallas video kernel (interpret) vs the Flax model."""
    from dldkd_tpu.ops.fast_eval import encode_context_best

    model, mcfg, params = setup
    vf, vm, _, _ = _data(mcfg)
    want_i, want_e = model.apply(params, vf, vm, deterministic=True,
                                 method="encode_context")
    got_i, got_e = encode_context_best(params, mcfg, vf, vm,
                                       prefer_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=2e-4, atol=2e-5)
    assert (got_e is None) == (want_e is None)
    if want_e is not None:
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   rtol=2e-4, atol=2e-5)


def test_query_pallas_tower_matches_model(setup):
    """Whole-tower Pallas kernel (interpret mode on CPU) vs the Flax model."""
    from dldkd_tpu.ops.fast_eval import encode_query_best

    model, mcfg, params = setup
    _, _, qf, qm = _data(mcfg)
    want_i, want_e = model.apply(params, qf, qm, deterministic=True,
                                 method="encode_query")
    got_i, got_e = encode_query_best(params, mcfg, qf, qm,
                                     prefer_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=2e-4, atol=2e-5)
    assert (got_e is None) == (want_e is None)
    if want_e is not None:
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_towers_bf16_mode(setup):
    """The PRODUCTION kernel configuration (bf16 in/out, the only dtype the
    context kernel runs in on TPU), in interpret mode, against the XLA fast
    path at bf16 tolerance."""
    from dldkd_tpu.ops.fast_eval import (encode_context_best,
                                         encode_context_fast,
                                         encode_query_best,
                                         encode_query_fast)

    model, mcfg_f32, params = setup
    mcfg = mcfg_f32.replace(dtype="bfloat16")
    vf, vm, qf, qm = _data(mcfg)

    want_i, want_e = encode_context_fast(params, mcfg, vf, vm)
    got_i, got_e = encode_context_best(params, mcfg, vf, vm,
                                       prefer_pallas=True, interpret=True)
    assert got_i.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got_i, np.float32),
                               np.asarray(want_i, np.float32),
                               rtol=0.1, atol=0.1)
    if want_e is not None:
        np.testing.assert_allclose(np.asarray(got_e, np.float32),
                                   np.asarray(want_e, np.float32),
                                   rtol=0.1, atol=0.1)

    want_qi, _ = encode_query_fast(params, mcfg, qf, qm)
    got_qi, _ = encode_query_best(params, mcfg, qf, qm,
                                  prefer_pallas=True, interpret=True)
    assert got_qi.dtype == jnp.bfloat16  # serving cast for 2048-query tiles
    np.testing.assert_allclose(np.asarray(got_qi, np.float32),
                               np.asarray(want_qi, np.float32),
                               rtol=0.1, atol=0.1)


def test_pos_table_overrun_raises(setup):
    """Sequences longer than the learned positional table must fail loudly
    on the kernel path (the XLA path raises a shape error)."""
    from dldkd_tpu.ops.pallas.query_tower import (fused_query_tower,
                                                  weights_for_branch)

    model, mcfg, params = setup
    rng = np.random.RandomState(0)
    too_long = mcfg.max_desc_l + 3
    qf = jnp.asarray(rng.randn(4, too_long, mcfg.query_input_size)
                     .astype(np.float32))
    qm = jnp.ones((4, too_long), jnp.float32)
    w = weights_for_branch(params, "inheritance", jnp.float32)
    with pytest.raises(ValueError, match="positional table"):
        fused_query_tower(qf, qm, w, n_heads=mcfg.n_heads,
                          dtype_name="float32", q_tile=4, interpret=True)


def test_query_fast_matches_model(setup):
    model, mcfg, params = setup
    _, _, qf, qm = _data(mcfg)
    want_i, want_e = model.apply(params, qf, qm, deterministic=True,
                                 method="encode_query")
    got_i, got_e = encode_query_fast(params, mcfg, qf, qm)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=2e-4, atol=2e-5)
    if want_e is not None:
        np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                                   rtol=2e-4, atol=2e-5)


def test_token_grid_padding_allowance(setup):
    """Serving packs query buffers on the kernels' 8-token grid (see
    ingest.pack_query_rows pad_to_multiple): sequences up to the 8-rounded
    positional-table size are accepted, the tail positions get zero
    embeddings, and — because they are zero-masked — the pooled vectors
    match the unpadded input exactly."""
    from dldkd_tpu.ops.fast_eval import encode_query_best

    model, mcfg, params = setup
    _, _, qf, qm = _data(mcfg)
    lq = mcfg.max_desc_l                       # 6; grid-rounds to 8
    lq_p = -(-lq // 8) * 8
    qf_p = jnp.pad(qf, ((0, 0), (0, lq_p - lq), (0, 0)))
    qm_p = jnp.pad(qm, ((0, 0), (0, lq_p - lq)))

    want = encode_query_best(params, mcfg, qf, qm,
                             prefer_pallas=True, interpret=True)
    got = encode_query_best(params, mcfg, qf_p, qm_p,
                            prefer_pallas=True, interpret=True)
    # the XLA fallback must accept the same grid-packed buffers (serving
    # falls back to it off-TPU)
    got_xla = encode_query_best(params, mcfg, qf_p, qm_p,
                                prefer_pallas=False)
    for w, g, gx in zip(want, got, got_xla):
        if w is None:
            continue
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_asymmetric_hidden_sizes_take_per_branch_kernels():
    """The dual-branch kernels assume one shared hidden size; asymmetric
    --inheritance_hidden/--exploration_hidden configs must route to the
    per-branch kernels and still match the XLA fast path."""
    from dldkd_tpu.ops.fast_eval import (encode_context_best,
                                         encode_context_fast,
                                         encode_query_best,
                                         encode_query_fast)

    mcfg = ModelConfig(visual_input_size=40, query_input_size=24,
                       inheritance_hidden=16, exploration_hidden=8,
                       max_ctx_l=12, max_desc_l=6, n_heads=2,
                       double_branch=True, label_style="soft")
    model = DLDKD(config=mcfg)
    params = init_params(model, mcfg, 0)
    vf, vm, qf, qm = _data(mcfg)

    want = encode_context_fast(params, mcfg, vf, vm)
    got = encode_context_best(params, mcfg, vf, vm,
                              prefer_pallas=True, interpret=True)
    for w, g in zip(want, got):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)
    want = encode_query_fast(params, mcfg, qf, qm)
    got = encode_query_best(params, mcfg, qf, qm,
                            prefer_pallas=True, interpret=True)
    for w, g in zip(want, got):
        assert g.shape == w.shape
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_grid_tail_tokens_forced_to_padding(setup):
    """The packing-grid contract is ENFORCED, not assumed: tokens at
    positions beyond the learned positional table are treated as padding
    even if a caller erroneously passes mask=1 there, on both the kernel
    and XLA query paths."""
    from dldkd_tpu.ops.fast_eval import encode_query_best

    model, mcfg, params = setup
    _, _, qf, qm = _data(mcfg)
    lq = mcfg.max_desc_l                       # 6; grid-rounds to 8
    lq_p = -(-lq // 8) * 8
    rng = np.random.RandomState(3)
    tail = rng.randn(qf.shape[0], lq_p - lq, qf.shape[2]).astype(np.float32)
    qf_bad = jnp.concatenate([qf, jnp.asarray(tail)], axis=1)
    qm_bad = jnp.pad(qm, ((0, 0), (0, lq_p - lq)),
                     constant_values=1.0)      # WRONGLY unmasked tail

    want = encode_query_best(params, mcfg, qf, qm,
                             prefer_pallas=True, interpret=True)
    for pallas in (True, False):
        got = encode_query_best(params, mcfg, qf_bad, qm_bad,
                                prefer_pallas=pallas, interpret=True)
        for w, g in zip(want, got):
            if w is None:
                continue
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)


def _assert_q8_equal_mod_knife_edge(got, want, budget=0.10):
    """Elementwise equality up to the only defensible cross-program
    contract for int8 grids: XLA's reduction/fusion order for the L2-norm
    is compilation-context-dependent, so bf16 components whose f32 norm
    sum sits within an ulp of a bf16 rounding boundary can land one
    quantization level apart between two separately compiled programs
    (measured: the SAME jnp.linalg.norm call gives 64.5-vs-65.0 bf16 sums
    eagerly vs jitted). Those knife-edge flips are |diff| == 1, and a
    1-ulp norm flip moves EVERY component of that frame by ~2^-8 relative
    — at this fixture's hidden=16 that is ~12% of a quantization step
    (components ~1/sqrt(16)), so several percent of components flip; at
    the production hidden=384 the same flip is ~2% of a step and the
    fraction collapses. |diff| <= 1 is the strict invariant."""
    got = np.asarray(got, np.int32)
    want = np.asarray(want, np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    frac = (diff > 0).mean()
    assert frac < budget, f"{frac:.4f} of components off by one level"


def test_context_q8_kernel_matches_xla_quantization(setup):
    """int8-emitting tower epilogue (emit_q8): kernel int8 must equal
    quantize_frames_q8(bf16 frame features) elementwise up to bf16
    knife-edge rounding (see _assert_q8_equal_mod_knife_edge) — the
    exactness contract that lets the scoring index come straight out of
    the tower kernel with no per-call quantize pre-pass."""
    from dldkd_tpu.ops.fast_eval import encode_context_best, encode_context_q8
    from dldkd_tpu.ops.pallas.sim_max import quantize_frames_q8

    model, mcfg, params = setup
    mcfg16 = mcfg.replace(dtype="bfloat16")
    vf, vm, _, _ = _data(mcfg16)

    frames_i, frames_e = encode_context_best(params, mcfg16, vf, vm,
                                             prefer_pallas=True,
                                             interpret=True)
    got_i, got_e = encode_context_q8(params, mcfg16, vf, vm,
                                     prefer_pallas=True, interpret=True)
    assert got_i.dtype == jnp.int8
    _assert_q8_equal_mod_knife_edge(got_i, quantize_frames_q8(frames_i))
    assert (got_e is None) == (frames_e is None)
    if frames_e is not None:
        _assert_q8_equal_mod_knife_edge(got_e, quantize_frames_q8(frames_e))


def test_quantize_q8_unit_semantics():
    """The kernel epilogue's quantization function on raw bf16 inputs vs
    the canonical quantize_frames_q8: same ops (norm multiplied in bf16,
    summed in f32, rooted in bf16; torch-eps clamp; round-half-even at
    127) — equal up to the knife-edge contract above."""
    from dldkd_tpu.ops.pallas.query_tower import _quantize_q8
    from dldkd_tpu.ops.pallas.sim_max import quantize_frames_q8
    from tests.test_fast_eval import _assert_q8_equal_mod_knife_edge

    x = jnp.asarray(np.random.RandomState(3).randn(200, 48)
                    .astype(np.float32)).astype(jnp.bfloat16)
    _assert_q8_equal_mod_knife_edge(_quantize_q8(x), quantize_frames_q8(x))


def test_context_q8_xla_fallback_close_to_kernel(setup):
    """The XLA fallback (encode_context_fast + quantize) quantizes the
    same frame features the kernels are exactness-tested against; the two
    int8 grids may differ only by the towers' float-rounding (at most one
    quantization step on knife-edge components)."""
    from dldkd_tpu.ops.fast_eval import encode_context_q8

    model, mcfg, params = setup
    mcfg16 = mcfg.replace(dtype="bfloat16")
    vf, vm, _, _ = _data(mcfg16)
    kern_i, _ = encode_context_q8(params, mcfg16, vf, vm,
                                  prefer_pallas=True, interpret=True)
    xla_i, _ = encode_context_q8(params, mcfg16, vf, vm,
                                 prefer_pallas=False)
    diff = np.abs(np.asarray(kern_i, np.int32) - np.asarray(xla_i, np.int32))
    assert diff.max() <= 1, diff.max()
