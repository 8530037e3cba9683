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


def _run_workers(n_proc, extra_args=(), attempts=3):
    # attempts=3: under heavy external load the 2-process coordinator
    # handshake can time out while workers compile; retries use fresh
    # ports and clean processes
    """Spawn the multihost worker n_proc times under one coordinator and
    return their JSON outputs (sorted by process id)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def free_port():
        with socket.socket() as s:
            s.bind(("localhost", 0))
            return s.getsockname()[1]

    # bind-then-close port picking is racy (another process can grab
    # the port before the coordinator binds it) -> retry once with a
    # fresh port instead of failing spuriously
    for attempt in range(attempts):
        port = free_port()
        procs = [subprocess.Popen(
            [sys.executable, worker, str(n_proc), str(i), str(port),
             *map(str, extra_args)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for i in range(n_proc)]
        results, failed = [], ""
        for p in procs:
            # generous: n_proc workers compile concurrently on few cores,
            # and the suite may itself run under load
            out, err = p.communicate(timeout=1200)
            if p.returncode != 0:
                failed = err[-2000:]
                break
            results.append(json.loads(out.strip().splitlines()[-1]))
        if not failed:
            return sorted(results, key=lambda r: r["process"])
        if attempt + 1 == attempts:
            raise AssertionError(failed)
    raise AssertionError("unreachable")


def test_two_process_dp_step():
    """Integration: two local CPU processes under jax.distributed, 8 global
    devices. Exercises the REAL make_array_from_process_local_data branch of
    shard_batch_multihost + replicate_multihost and checks the DP step
    result (loss + post-step parameter checksum) is bit-identical to a
    single-process run on the same 8-device mesh."""
    single = _run_workers(1)[0]
    double = _run_workers(2)
    for r in double:
        assert r["loss"] == single["loss"]
        assert r["checksum"] == single["checksum"]
        # preemption stop agreement over the real 2-process allgather:
        # one flagged host stops everyone; no flags stops no one
        assert r["agree_one"] is True
        assert r["agree_none"] is False
    assert single["agree_one"] is True and single["agree_none"] is False


def test_two_process_full_epoch_cycle(tmp_path):
    """The FULL driver cycle under 2 real processes: packing -> DP train
    epochs -> per-epoch SHARDED val eval -> process-0 best checkpoint ->
    preemption agreement + process-0 preempt checkpoint. Both processes
    must emit identical per-epoch losses and val SumRs, equal to a
    single-process run of the same config; exactly ONE best checkpoint
    and ONE preempt checkpoint may appear (process 0's)."""
    from dldkd_tpu.data.synthetic import generate_dataset

    data_root = str(tmp_path / "data")
    generate_dataset(data_root, collection="synthetic", visual_feature="i3d",
                     n_videos={"train": 32, "val": 12, "test": 4},
                     frames_range=(4, 16), teacher_frames_range=(3, 10),
                     d_student=16, d_query=12, d_teacher=8, seed=6)

    single = _run_workers(
        1, ["epoch", data_root, str(tmp_path / "res1")])[0]
    double = _run_workers(
        2, ["epoch", data_root, str(tmp_path / "res2")])

    # the full run: 2 epochs of losses + val SumRs, identical across
    # processes and identical to single-process execution
    assert len(single["full"]["losses"]) == 2
    assert len(single["full"]["sumrs"]) == 2
    for r in double:
        assert r["full"]["losses"] == single["full"]["losses"]
        assert r["full"]["sumrs"] == single["full"]["sumrs"]
    # exactly one best checkpoint: process 0's
    assert single["full"]["best_ckpt"] is True
    assert double[0]["full"]["best_ckpt"] is True
    assert double[1]["full"]["best_ckpt"] is False

    # the preempt run (guard latched on process 0 only, before epoch 0):
    # the epoch-end agreement stops BOTH processes after one epoch, before
    # that epoch's eval; only process 0 writes the preempt checkpoint
    for r in [single] + double:
        assert len(r["preempt"]["losses"]) == 1
        assert r["preempt"]["sumrs"] == []
        assert r["preempt"]["best_ckpt"] is False
    assert single["preempt"]["preempt_ckpt"] is True
    assert double[0]["preempt"]["preempt_ckpt"] is True
    assert double[1]["preempt"]["preempt_ckpt"] is False


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
