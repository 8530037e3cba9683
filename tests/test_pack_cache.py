"""Content-keyed packed-dataset cache: hit equality, source bypass on
hits, mtime/size/knob invalidation, corruption recovery."""

import os
import time

import numpy as np
import pytest

from dldkd_tpu.data import cache as pack_cache
from dldkd_tpu.data.ingest import dataset_paths
from dldkd_tpu.data.synthetic import generate_dataset


@pytest.fixture()
def env(tmp_path):
    root = str(tmp_path / "data")
    generate_dataset(root, collection="synthetic", visual_feature="i3d",
                     n_videos={"train": 10, "val": 6, "test": 6},
                     frames_range=(5, 30), teacher_frames_range=(4, 12),
                     d_student=16, d_query=12, d_teacher=8, seed=11)
    paths = dataset_paths(root, "synthetic", "i3d")
    cache_dir = str(tmp_path / "cache")
    return paths, cache_dir


def _assert_train_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.videos.feats),
                                  np.asarray(b.videos.feats))
    np.testing.assert_array_equal(np.asarray(a.videos.mask),
                                  np.asarray(b.videos.mask))
    np.testing.assert_array_equal(np.asarray(a.videos.teacher_feats),
                                  np.asarray(b.videos.teacher_feats))
    assert a.videos.ids == b.videos.ids
    np.testing.assert_array_equal(np.asarray(a.queries.feats),
                                  np.asarray(b.queries.feats))
    np.testing.assert_array_equal(np.asarray(a.queries.teacher_feats),
                                  np.asarray(b.queries.teacher_feats))
    assert a.queries.cap_ids == b.queries.cap_ids
    assert a.queries.video_ids == b.queries.video_ids
    assert len(a.vid_cap_index) == len(b.vid_cap_index)
    for x, y in zip(a.vid_cap_index, b.vid_cap_index):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hit_returns_identical_data_without_sources(env, monkeypatch):
    paths, cache_dir = env
    first = pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)

    # a hit must never re-walk BigFile/HDF5
    import dldkd_tpu.data.ingest as ingest

    def boom(*a, **k):
        raise AssertionError("cache hit touched the source files")

    monkeypatch.setattr(ingest, "pack_train_dataset", boom)
    t0 = time.time()
    second = pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    hit_time = time.time() - t0
    _assert_train_equal(first, second)
    assert hit_time < 1.0  # mmap load: ~ms, far from the packing walk


def test_corpus_and_query_caches(env, monkeypatch):
    paths, cache_dir = env
    v1 = pack_cache.cached_corpus_pack(paths, "val", 16, cache_dir=cache_dir)
    q1 = pack_cache.cached_query_pack(paths, "val", 7, cache_dir=cache_dir)

    import dldkd_tpu.data.ingest as ingest

    monkeypatch.setattr(ingest, "pack_video_corpus",
                        lambda *a, **k: pytest.fail("corpus hit repacked"))
    monkeypatch.setattr(ingest, "pack_query_set",
                        lambda *a, **k: pytest.fail("query hit repacked"))
    v2 = pack_cache.cached_corpus_pack(paths, "val", 16, cache_dir=cache_dir)
    q2 = pack_cache.cached_query_pack(paths, "val", 7, cache_dir=cache_dir)
    np.testing.assert_array_equal(np.asarray(v1.feats), np.asarray(v2.feats))
    assert v1.ids == v2.ids
    np.testing.assert_array_equal(np.asarray(q1.feats), np.asarray(q2.feats))
    assert q1.cap_ids == q2.cap_ids


def test_invalidation_on_source_change(env):
    paths, cache_dir = env
    pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    n_entries = len(os.listdir(cache_dir))

    # touching a source file (mtime bump) must miss and rebuild
    cap = paths["cap_file"]["train"]
    st = os.stat(cap)
    os.utime(cap, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    assert len(os.listdir(cache_dir)) == n_entries + 1


def test_invalidation_on_knob_change(env):
    paths, cache_dir = env
    a = pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    b = pack_cache.cached_train_pack(paths, 8, 7, cache_dir=cache_dir)
    assert a.videos.feats.shape[1] == 16 and b.videos.feats.shape[1] == 8
    assert len(os.listdir(cache_dir)) == 2


def test_lru_eviction_bounds_entries_per_kind(env, monkeypatch):
    """Knob/source churn must not grow the cache unboundedly: on a miss,
    least-recently-USED entries of the same kind beyond
    $DLDKD_PACK_CACHE_MAX_ENTRIES are pruned (hits refresh recency)."""
    paths, cache_dir = env
    monkeypatch.setenv("DLDKD_PACK_CACHE_MAX_ENTRIES", "2")
    pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    time.sleep(0.01)
    pack_cache.cached_train_pack(paths, 8, 7, cache_dir=cache_dir)
    time.sleep(0.01)
    # a HIT on the older entry refreshes its recency ...
    pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    time.sleep(0.01)
    # ... so the third distinct config evicts the max_ctx_l=8 entry
    pack_cache.cached_train_pack(paths, 12, 7, cache_dir=cache_dir)
    assert len(os.listdir(cache_dir)) == 2
    a = pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    assert a.videos.feats.shape[1] == 16  # survivor still loads
    # other kinds have their own budget: corpus entries are untouched
    pack_cache.cached_corpus_pack(paths, "val", 16, cache_dir=cache_dir)
    assert len(os.listdir(cache_dir)) == 3


def test_corrupt_entry_rebuilds(env):
    paths, cache_dir = env
    pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    entry = os.path.join(cache_dir, os.listdir(cache_dir)[0])
    os.remove(os.path.join(entry, "meta.json"))
    out = pack_cache.cached_train_pack(paths, 16, 7, cache_dir=cache_dir)
    assert len(out.videos.ids) == 10


def test_driver_uses_cache(env, tmp_path, monkeypatch):
    """build_model_and_data routes through the cache by default and skips
    the BigFile walk on the second launch (the run #2 startup win)."""
    import dataclasses

    from dldkd_tpu.config import Config, DataConfig, ModelConfig
    from dldkd_tpu.train import build_model_and_data

    paths, cache_dir = env
    monkeypatch.setenv("DLDKD_PACK_CACHE_DIR", cache_dir)
    root = os.path.dirname(os.path.dirname(paths["visual_feat_dir"]))
    root = os.path.dirname(root)  # data root above <collection>/
    cfg = Config(
        model=ModelConfig(max_ctx_l=16, max_desc_l=7),
        data=DataConfig(root_path=root, collection="synthetic",
                        visual_feature="i3d", q_feat_size=12,
                        max_ctx_l=16, max_desc_l=7))
    mcfg1, td1, vv1, vq1, _ = build_model_and_data(cfg)
    assert mcfg1.visual_input_size == 16

    import dldkd_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "BigFile",
                        lambda *a, **k: pytest.fail("hit opened BigFile"))
    t0 = time.time()
    mcfg2, td2, vv2, vq2, _ = build_model_and_data(cfg)
    assert time.time() - t0 < 1.0
    assert mcfg2 == mcfg1
    _assert_train_equal(td1, td2)
    # disabling the cache still works (the repack path)
    cfg_off = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, pack_cache=False))
    monkeypatch.undo()
    mcfg3, td3, _, _, _ = build_model_and_data(cfg_off)
    _assert_train_equal(td1, td3)
