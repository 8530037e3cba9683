"""The unused-in-reference utility tail (SURVEY S2.10.6): sequence pad /
span-search helpers, the variable-length RNN encoder + time pooling, and
the Vocabulary/word2vec loader — cross-validated against the reference's
own torch implementations where they are importable."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference")

from dldkd_tpu.utils.sequences import (find_max_triples,
                                       find_max_triples_from_upper_triangle_product,
                                       pad_sequences_1d, pad_sequences_2d,
                                       top_n_array_2d)


class TestPadSequences:
    def test_1d_matches_reference(self):
        from utils.tensor_utils import pad_sequences_1d as ref_pad

        cases = [
            [[1, 2, 3], [1, 2], [3, 4, 7, 9]],
            [np.random.RandomState(0).randn(2, 3, 4),
             np.random.RandomState(1).randn(4, 3, 4),
             np.random.RandomState(2).randn(1, 3, 4)],
        ]
        for data in cases:
            got, gmask = pad_sequences_1d(data, dtype=np.float32)
            want, wmask = ref_pad(data, dtype=np.float32)
            np.testing.assert_allclose(got, want)
            np.testing.assert_allclose(gmask, wmask)

    def test_1d_fixed_length(self):
        got, mask = pad_sequences_1d([[1, 2], [3]], dtype=np.float32,
                                     fixed_length=5)
        assert got.shape == (2, 5) and mask.sum() == 3
        with pytest.raises(ValueError, match="fixed_length"):
            pad_sequences_1d([[1, 2, 3]], fixed_length=2)

    def test_2d_matches_reference(self):
        import torch

        from utils.tensor_utils import pad_sequences_2d as ref_pad

        data = [[[1, 3, 5], [3, 7, 4, 1]],
                [[98, 34, 11, 89, 90], [22], [34, 56]]]
        got, gmask = pad_sequences_2d(data, dtype=np.float32)
        tdata = [[torch.tensor(x, dtype=torch.float) for x in row]
                 for row in data]
        want, wmask = ref_pad(tdata, dtype=torch.float)
        np.testing.assert_allclose(got, want.numpy())
        np.testing.assert_allclose(gmask, wmask.numpy())


class TestSpanSearch:
    def test_find_max_triples_matches_reference(self):
        from utils.tensor_utils import find_max_triples as ref_find

        rng = np.random.RandomState(3)
        st = rng.rand(4, 7).astype(np.float32)
        ed = rng.rand(4, 7).astype(np.float32)
        got = find_max_triples(st, ed, top_n=5)
        want = ref_find(st, ed, top_n=5, tensor_type="np")
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, np.asarray(w, np.float32),
                                       rtol=1e-6)

    def test_top_n_and_threshold(self):
        mat = np.array([[0.0, 0.9], [0.2, 0.5]], np.float32)
        triples = top_n_array_2d(mat, top_n=2)
        assert tuple(triples[0][:2].astype(int)) == (0, 1)
        out = find_max_triples_from_upper_triangle_product(
            mat[None], top_n=4, prob_thd=0.6)
        # thresholding keeps only the 0.9 cell (the reference's version
        # thresholds the wrong column; ours uses the confidence)
        assert out[0].shape[0] == 1 and out[0][0, 2] == pytest.approx(0.9)


@pytest.fixture(scope="module")
def rnn_case():
    rng = np.random.RandomState(7)
    b, t, d, h = 5, 9, 6, 4
    x = rng.randn(b, t, d).astype(np.float32)
    lengths = np.array([9, 3, 7, 1, 5], np.int32)
    return x, lengths, d, h


def _sync_torch_lstm(torch_lstm, params, h, bidirectional):
    """Copy flax OptimizedLSTMCell weights into torch.nn.LSTM. flax keeps
    per-gate denses (input: ii/if/ig/io kernels, no bias; recurrent:
    hi/hf/hg/ho kernels + biases); torch packs gates [i, f, g, o] into
    (4H, ·) matrices and sums b_ih + b_hh -> zero b_ih."""
    import torch

    def packed(prefix):
        cell = params["params"][prefix]
        wi = np.concatenate(
            [np.asarray(cell[f"i{g}"]["kernel"]).T for g in "ifgo"])
        wh = np.concatenate(
            [np.asarray(cell[f"h{g}"]["kernel"]).T for g in "ifgo"])
        bh = np.concatenate(
            [np.asarray(cell[f"h{g}"]["bias"]) for g in "ifgo"])
        return wi, wh, bh

    dirs = [("l0_fwd", "")] + ([("l0_bwd", "_reverse")] if bidirectional
                               else [])
    with torch.no_grad():
        for name, suffix in dirs:
            wi, wh, bh = packed(name)
            getattr(torch_lstm, f"weight_ih_l0{suffix}").copy_(
                torch.from_numpy(wi.copy()))
            getattr(torch_lstm, f"weight_hh_l0{suffix}").copy_(
                torch.from_numpy(wh.copy()))
            getattr(torch_lstm, f"bias_hh_l0{suffix}").copy_(
                torch.from_numpy(bh.copy()))
            getattr(torch_lstm, f"bias_ih_l0{suffix}").zero_()


@pytest.mark.parametrize("bidirectional", [False, True])
def test_rnn_encoder_matches_reference_lstm(rnn_case, bidirectional):
    """Same weights, same variable-length batch: the masked-scan encoder
    must reproduce torch's pack/sort/pad LSTM path (reference RNNEncoder,
    model_utils.py:10-73) on both outputs and final hidden states."""
    import torch

    from utils.model_utils import RNNEncoder as RefRNNEncoder

    from dldkd_tpu.models.rnn import RNNEncoder

    x, lengths, d, h = rnn_case
    enc = RNNEncoder(hidden_size=h, bidirectional=bidirectional,
                     rnn_type="lstm")
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(lengths))
    outs, hidden = enc.apply(params, jnp.asarray(x), jnp.asarray(lengths))

    ref = RefRNNEncoder(d, h, bidirectional=bidirectional, rnn_type="lstm")
    _sync_torch_lstm(ref.rnn, params, h, bidirectional)
    ref.eval()
    with torch.no_grad():
        ref_outs, ref_hidden = ref(torch.from_numpy(x),
                                   torch.from_numpy(lengths.astype(np.int64)))

    t_ref = ref_outs.shape[1]  # torch pads to max(lengths)
    np.testing.assert_allclose(np.asarray(outs)[:, :t_ref],
                               ref_outs.numpy(), rtol=1e-5, atol=1e-5)
    assert not np.asarray(outs)[:, t_ref:].any()
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden.numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("rnn_type", ["gru", "rnn"])
def test_rnn_encoder_masking_invariance(rnn_case, rnn_type):
    """Content past a row's length must not affect outputs or hidden."""
    from dldkd_tpu.models.rnn import RNNEncoder

    x, lengths, d, h = rnn_case
    enc = RNNEncoder(hidden_size=h, bidirectional=True, rnn_type=rnn_type)
    params = enc.init(jax.random.PRNGKey(1), jnp.asarray(x),
                      jnp.asarray(lengths))
    o1, h1 = enc.apply(params, jnp.asarray(x), jnp.asarray(lengths))

    x2 = x.copy()
    for i, n in enumerate(lengths):
        x2[i, n:] = 123.0  # garbage in the padding
    o2, h2 = enc.apply(params, jnp.asarray(x2), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)


def test_rnn_encoder_flags(rnn_case):
    from dldkd_tpu.models.rnn import RNNEncoder

    x, lengths, d, h = rnn_case
    enc = RNNEncoder(hidden_size=h, return_outputs=False, allow_zero=True)
    lengths0 = lengths.copy()
    lengths0[2] = 0  # allow_zero treats as length 1
    params = enc.init(jax.random.PRNGKey(2), jnp.asarray(x),
                      jnp.asarray(lengths0))
    outs, hidden = enc.apply(params, jnp.asarray(x), jnp.asarray(lengths0))
    assert outs is None and hidden.shape == (x.shape[0], 2 * h)
    assert np.isfinite(np.asarray(hidden)).all()


def test_pool_across_time_matches_reference(rnn_case):
    import torch

    from utils.model_utils import pool_across_time as ref_pool

    from dldkd_tpu.models.rnn import pool_across_time

    x, lengths, _, _ = rnn_case
    for pool in ("max", "mean"):
        got = pool_across_time(jnp.asarray(x), jnp.asarray(lengths), pool)
        want = ref_pool(torch.from_numpy(x),
                        torch.from_numpy(lengths.astype(np.int64)), pool)
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=1e-6, atol=1e-6)


class TestVocab:
    def test_vocabulary_and_we_parameter(self, tmp_path):
        from dldkd_tpu.data.bigfile import BigFileWriter
        from dldkd_tpu.data.vocab import Vocabulary, get_we_parameter

        vocab = Vocabulary(text_style="rnn")
        for w in ("<unk>", "cat", "dog"):
            vocab.add_word(w)
        vocab.add_word("cat")  # idempotent
        assert len(vocab) == 3
        assert vocab("dog") == 2 and vocab("missing") == vocab("<unk>")

        bow = Vocabulary(text_style="bow_nsw")
        bow.add_word("cat")
        with pytest.raises(KeyError):
            bow("missing")

        w2v_dir = str(tmp_path / "w2v")
        rng = np.random.RandomState(0)
        vecs = {w: rng.randn(5).astype(np.float32) for w in ("cat", "dog")}
        with BigFileWriter(w2v_dir, 5) as w:
            for name, v in vecs.items():
                w.write(name, v)
        we = get_we_parameter(vocab, w2v_dir, seed=1)
        assert we.shape == (3, 5)
        np.testing.assert_allclose(we[1], vecs["cat"])
        np.testing.assert_allclose(we[2], vecs["dog"])
        assert np.abs(we[0]).max() <= 1.0  # <unk> fallback row


def test_pool_across_time_zero_length_poisons(rnn_case):
    """Zero-length rows yield -inf/NaN poison (the reference raises; a
    traced computation cannot, so the failure must be detectable)."""
    from dldkd_tpu.models.rnn import pool_across_time

    x, lengths, _, _ = rnn_case
    lengths = lengths.copy()
    lengths[1] = 0
    mx = np.asarray(pool_across_time(jnp.asarray(x), jnp.asarray(lengths),
                                     "max"))
    mn = np.asarray(pool_across_time(jnp.asarray(x), jnp.asarray(lengths),
                                     "mean"))
    assert np.isneginf(mx[1]).all() and np.isnan(mn[1]).all()
    assert np.isfinite(mx[0]).all() and np.isfinite(mn[0]).all()
