"""Multi-host helpers. On this single-process host the init is a no-op and
shard_batch_multihost must behave exactly like the single-host shard."""

import numpy as np
import pytest

import jax

from dldkd_tpu.parallel import make_mesh
from dldkd_tpu.parallel.multihost import (
    maybe_initialize_distributed,
    process_slice,
    shard_batch_multihost,
)


def test_initialize_is_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    # TPU_WORKER_HOSTNAMES must NOT trigger init (tunneled single-chip envs set it)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    assert maybe_initialize_distributed() is False


def test_process_slice(monkeypatch):
    assert process_slice(16) == slice(0, 16)
    # simulate a 4-process run
    from dldkd_tpu.parallel import multihost

    monkeypatch.setattr(multihost.jax, "process_count", lambda: 4)
    monkeypatch.setattr(multihost.jax, "process_index", lambda: 2)
    assert process_slice(16) == slice(8, 12)
    with pytest.raises(ValueError):
        process_slice(10)


def test_shard_batch_multihost_matches_single(small_batch=None):
    mesh = make_mesh(4)
    rng = np.random.RandomState(0)
    batch = {
        "student_videos": rng.randn(8, 4, 6).astype(np.float32),
        "student_videos_mask": np.ones((8, 4), np.float32),
        "teacher_videos": rng.randn(8, 4, 3).astype(np.float32),
        "student_text": rng.randn(16, 2, 5).astype(np.float32),
        "student_text_mask": np.ones((16, 2), np.float32),
        "teacher_text": rng.randn(16, 3).astype(np.float32),
        "text_labels": np.arange(16, dtype=np.int32) % 8,
    }
    out = shard_batch_multihost(batch, mesh)
    for k, v in batch.items():
        got = np.asarray(out[k])
        np.testing.assert_array_equal(got, v)
        # sharded over the leading axis
        assert len(out[k].sharding.device_set) == 4
