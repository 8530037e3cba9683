"""Data layer tests: BigFile round-trip, resampling math, ingestion on the
synthetic fixture, and batch layout invariants."""

import numpy as np
import pytest

from dldkd_tpu.data import (
    BigFile,
    BigFileWriter,
    TrainLoader,
    load_captions,
    pack_query_set,
    pack_train_dataset,
    pack_video_corpus,
    read_dict,
    uniform_feature_sampling,
    l2_normalize_rows,
)
from dldkd_tpu.data.ingest import dataset_paths, read_video_ids
from dldkd_tpu.data.synthetic import generate_dataset


def ref_uniform_feature_sampling(features, max_len):
    """Loop transliteration of reference data_provider.py:52-68."""
    num_clips = features.shape[0]
    if max_len is None or num_clips <= max_len:
        return features
    idxs = np.arange(0, max_len + 1, 1.0) / max_len * num_clips
    idxs = np.round(idxs).astype(np.int32)
    idxs[idxs > num_clips - 1] = num_clips - 1
    out = []
    for i in range(max_len):
        s, e = idxs[i], idxs[i + 1]
        out.append(np.mean(features[s:e], axis=0) if s < e else features[s])
    return np.asarray(out)


@pytest.mark.parametrize("n,maxlen", [(5, 10), (10, 10), (11, 10), (200, 128),
                                      (129, 128), (1000, 128), (3, 2)])
def test_uniform_feature_sampling_matches_reference(n, maxlen):
    rng = np.random.RandomState(0)
    x = rng.randn(n, 7).astype(np.float32)
    got = uniform_feature_sampling(x, maxlen)
    want = ref_uniform_feature_sampling(x, maxlen)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_l2_normalize_rows_eps_semantics():
    x = np.zeros((2, 3), np.float32)
    out = l2_normalize_rows(x)
    assert np.all(out == 0)  # eps is additive, no NaN on zero rows
    y = np.asarray([[3.0, 4.0, 0.0]], np.float32)
    np.testing.assert_allclose(l2_normalize_rows(y),
                               y / (5.0 + 1e-5), rtol=1e-7)


def test_bigfile_roundtrip(tmp_path):
    d = str(tmp_path / "bf")
    rng = np.random.RandomState(0)
    rows = {f"row{i}": rng.randn(6).astype(np.float32) for i in range(9)}
    with BigFileWriter(d, 6) as w:
        for name, vec in rows.items():
            w.write(name, vec)
    bf = BigFile(d)
    assert bf.shape() == [9, 6]
    np.testing.assert_array_equal(bf.read_one("row3"), rows["row3"])
    got = bf.read(["row8", "row0", "row5"])
    np.testing.assert_array_equal(got, np.stack([rows["row8"], rows["row0"],
                                                 rows["row5"]]))


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(root, n_videos={"train": 12, "val": 6, "test": 6},
                     frames_range=(5, 40), teacher_frames_range=(4, 20),
                     d_student=16, d_query=12, d_teacher=8, seed=1)
    return root


def test_ingestion_end_to_end(synth_root):
    paths = dataset_paths(synth_root, "synthetic", "i3d")
    bf = BigFile(paths["visual_feat_dir"])
    v2f = read_dict(paths["video2frames"])
    data = pack_train_dataset(
        paths["cap_file"]["train"], bf, v2f, paths["text_feat"],
        paths["teacher_vid_feat"], paths["teacher_text_feat"],
        max_ctx_l=16, max_desc_l=8)

    assert len(data.videos) == 12
    assert data.videos.feats.shape[1] == 16
    assert data.videos.teacher_feats.shape == (12, 16, 8)
    # masks: at least one valid frame, l2 norms ~<= 1 on valid rows
    assert np.all(data.videos.mask.sum(1) >= 1)
    norms = np.linalg.norm(data.videos.feats, axis=-1)
    assert np.all(norms <= 1.0 + 1e-4)
    # captions grouped correctly
    cap_ids, _, video_ids, vid_caps = load_captions(paths["cap_file"]["train"])
    assert sum(len(v) for v in data.vid_cap_index) == len(cap_ids)
    for vi, rows in enumerate(data.vid_cap_index):
        for r in rows:
            assert data.queries.video_ids[r] == data.videos.ids[vi]
    # teacher text loaded through the '#enc#' fallback without error
    assert data.queries.teacher_feats.shape[1] == 8

    corpus = pack_video_corpus(read_video_ids(paths["cap_file"]["val"]),
                               bf, v2f, max_ctx_l=16)
    assert len(corpus) == 6
    queries = pack_query_set(paths["cap_file"]["val"], paths["text_feat"],
                             max_desc_l=8)
    assert len(queries) >= 6
    assert queries.teacher_feats is None


def test_train_loader_layout(synth_root):
    paths = dataset_paths(synth_root, "synthetic", "i3d")
    bf = BigFile(paths["visual_feat_dir"])
    v2f = read_dict(paths["video2frames"])
    data = pack_train_dataset(
        paths["cap_file"]["train"], bf, v2f, paths["text_feat"],
        paths["teacher_vid_feat"], paths["teacher_text_feat"],
        max_ctx_l=16, max_desc_l=8)
    loader = TrainLoader(data, bsz=5, seed=7, query_pad_multiple=8)
    seen_videos = []
    for batch in loader.epoch(0):
        labels = batch["text_labels"]
        n_valid = int((labels >= 0).sum())
        # valid queries form a prefix
        assert np.all(labels[:n_valid] >= 0)
        assert np.all(labels[n_valid:] == -1)
        # video-major, nondecreasing labels; caps-per-video nonincreasing
        valid = labels[:n_valid]
        assert np.all(np.diff(valid) >= 0)
        counts = np.bincount(valid)
        assert np.all(np.diff(counts) <= 0)
        # query axis padded to multiple of 8
        assert labels.shape[0] % 8 == 0
        # all batch arrays consistent
        assert batch["student_videos"].shape[0] == batch["teacher_videos"].shape[0]
        assert batch["student_text"].shape[0] == labels.shape[0]
        seen_videos.append(batch["student_videos"].shape[0])
    assert sum(seen_videos) == 12
    # determinism
    b0 = next(loader.epoch(3))
    b1 = next(loader.epoch(3))
    np.testing.assert_array_equal(b0["text_labels"], b1["text_labels"])
    # different epochs shuffle differently
    b2 = next(loader.epoch(4))
    assert not np.array_equal(b0["student_videos"], b2["student_videos"])


def test_device_prefetch(synth_root):
    from dldkd_tpu.data import device_prefetch
    items = [{"x": np.full((2,), i)} for i in range(5)]
    out = list(device_prefetch(iter(items), put_fn=lambda d: d))
    assert [int(o["x"][0]) for o in out] == [0, 1, 2, 3, 4]

    def boom():
        yield {"x": np.zeros(1)}
        raise RuntimeError("producer failed")

    with pytest.raises(RuntimeError, match="producer failed"):
        list(device_prefetch(boom(), put_fn=lambda d: d))


def test_pack_query_rows_pad_to_multiple(tmp_path):
    """The serving packing rounds the token axis to the kernel grid; the
    extra positions are zero features with zero mask."""
    import h5py

    from dldkd_tpu.data.ingest import pack_query_rows

    path = tmp_path / "q.hdf5"
    rng = np.random.RandomState(0)
    with h5py.File(path, "w") as f:
        f["a#1"] = rng.randn(5, 12).astype(np.float32)
        f["b#2"] = rng.randn(9, 12).astype(np.float32)
    with h5py.File(path, "r") as f:
        feats, mask = pack_query_rows(f, ["a#1", "b#2"], max_desc_l=6,
                                      pad_to_multiple=8)
        base_feats, base_mask = pack_query_rows(f, ["a#1", "b#2"],
                                                max_desc_l=6)
    assert feats.shape == (2, 8, 12) and mask.shape == (2, 8)
    np.testing.assert_array_equal(feats[:, :6], base_feats)
    np.testing.assert_array_equal(mask[:, :6], base_mask)
    assert not feats[:, 6:].any() and not mask[:, 6:].any()
    assert mask[0].sum() == 5 and mask[1].sum() == 6  # truncated at 6
