"""Native (C++) data-layer kernels vs the numpy reference implementations.

The native path must be bit-compatible enough (<= float32 rounding) with
the Python packer so training/eval is identical whichever path ran.
"""

import os

import numpy as np
import pytest

from dldkd_tpu.data import native
from dldkd_tpu.data.bigfile import BigFile, BigFileWriter
from dldkd_tpu.data.ingest import (
    l2_normalize_rows,
    pack_video_corpus,
    uniform_feature_sampling,
)

lib_available = native.load() is not None
needs_native = pytest.mark.skipif(not lib_available,
                                  reason="native lib unavailable (no g++)")


@pytest.fixture()
def bigfile_dir(tmp_path):
    rng = np.random.RandomState(0)
    d = str(tmp_path / "bf")
    with BigFileWriter(d, ndims=16) as w:
        for i in range(200):
            w.write(f"row{i}", rng.randn(16).astype(np.float32))
    return d


@needs_native
def test_gather_matches_memmap(bigfile_dir):
    bf = BigFile(bigfile_dir)
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 200, size=50).astype(np.int64)
    lib = native.load()
    out = np.empty((50, 16), np.float32)
    rc = lib.bigfile_gather(bf.bin_path.encode(), 16,
                            np.ascontiguousarray(idx), 50, out)
    assert rc == 0
    np.testing.assert_array_equal(out, np.asarray(bf._mm[idx]))


@needs_native
@pytest.mark.parametrize("n_in,n_out", [(200, 128), (130, 128), (128, 128),
                                        (50, 128), (7, 3), (1000, 128)])
def test_resample_matches_numpy(n_in, n_out):
    rng = np.random.RandomState(2)
    x = rng.randn(n_in, 24).astype(np.float32)
    want = uniform_feature_sampling(x, n_out)
    got = native.resample_mean_pool(x, n_out)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@needs_native
def test_pack_corpus_matches_python(bigfile_dir, monkeypatch):
    bf = BigFile(bigfile_dir)
    rng = np.random.RandomState(3)
    video2frames = {}
    ids = []
    for v in range(12):
        n_frames = int(rng.randint(1, 60))
        frames = [f"row{int(i)}" for i in rng.randint(0, 200, n_frames)]
        vid = f"vid{v}"
        video2frames[vid] = frames
        ids.append(vid)

    got = pack_video_corpus(ids, bf, video2frames, max_ctx_l=16)

    monkeypatch.setenv("DLDKD_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    want = pack_video_corpus(ids, bf, video2frames, max_ctx_l=16)

    np.testing.assert_array_equal(got.mask, want.mask)
    np.testing.assert_allclose(got.feats, want.feats, rtol=1e-5, atol=1e-6)


@needs_native
def test_pack_corpus_with_teacher_alignment(bigfile_dir):
    """align_len caps+resamples the student grid exactly like resampling to
    the teacher length then to max_ctx_l in numpy."""
    bf = BigFile(bigfile_dir)
    rng = np.random.RandomState(4)
    frame_idx, align = [], []
    raws = []
    for v in range(8):
        n_frames = int(rng.randint(1, 80))
        idx = rng.randint(0, 200, n_frames).astype(np.int64)
        frame_idx.append(idx)
        align.append(int(rng.randint(1, 40)))
        raws.append(np.asarray(bf._mm[idx], np.float32))
    align = np.asarray(align, np.int64)

    feats, mask = native.pack_corpus_native(
        bf.bin_path, bf.ndims, frame_idx, align, 16)

    for v, raw in enumerate(raws):
        s = uniform_feature_sampling(raw, int(align[v]))
        s = uniform_feature_sampling(s, 16)
        n = s.shape[0]
        np.testing.assert_allclose(feats[v, :n], l2_normalize_rows(s),
                                   rtol=1e-5, atol=1e-6)
        assert mask[v].sum() == n
        np.testing.assert_array_equal(feats[v, n:], 0.0)
