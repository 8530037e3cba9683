"""CLI tool logic that must not silently lie: the replica-fleet drill's
aggregation (tools/coldstart_bench --policy fleet). The measurement
itself needs the TPU; the populate/replica orchestration — error
surfacing, the no-artifact early-out, p50/p95 — is pure host logic and
is pinned here with the subprocess layer stubbed."""

import json

import pytest

from dldkd_tpu.tools import coldstart_bench


class _Proc:
    def __init__(self, returncode=0, stdout="", stderr=""):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def _fleet(monkeypatch, tmp_path, runner, replicas=3):
    # the drill rmtree's the artifact dir under $HOME — point it at tmp
    monkeypatch.setenv("HOME", str(tmp_path))
    monkeypatch.setattr(coldstart_bench.subprocess, "run", runner)
    return coldstart_bench.main(
        ["--policy", "fleet", "--replicas", str(replicas)])


def test_fleet_populate_failure_aborts_whole_drill(monkeypatch, tmp_path,
                                                   capsys):
    """If the populate process dies, every 'replica' would measure a full
    int8 build instead of the fleet posture — the drill must report the
    error and run NO replicas rather than print plausible wrong numbers."""
    calls = []

    def runner(cmd, **kw):
        calls.append(cmd)
        return _Proc(returncode=1, stderr="boom: no TPU")

    out = _fleet(monkeypatch, tmp_path, runner, replicas=3)
    assert len(calls) == 1  # populate only — replicas never launched
    assert out["errors"] == 4  # populate + the 3 replicas it poisoned
    assert "boom" in out["populate"]["error"]
    assert out["replicas"] == []
    assert "p50_first_result_s" not in out
    json.loads(capsys.readouterr().out.strip())  # still one JSON line


def test_fleet_replica_errors_are_surfaced(monkeypatch, tmp_path):
    """A dead replica must show up in 'errors', and p50/p95 must
    summarize only the survivors."""
    seq = iter([
        _Proc(stdout=json.dumps({"policy": "artifact",
                                 "first_result_s": 9.0})),   # populate
        _Proc(stdout=json.dumps({"policy": "artifact",
                                 "first_result_s": 5.0})),
        _Proc(returncode=2, stderr="replica OOM"),
        _Proc(stdout=json.dumps({"policy": "artifact",
                                 "first_result_s": 7.0})),
    ])

    out = _fleet(monkeypatch, tmp_path, lambda cmd, **kw: next(seq),
                 replicas=3)
    assert out["errors"] == 1
    assert out["p50_first_result_s"] == 7.0   # median of [5.0, 7.0]
    assert out["p95_first_result_s"] == 7.0
    assert sum(1 for r in out["replicas"] if "error" in r) == 1


def test_fleet_all_green(monkeypatch, tmp_path):
    firsts = iter([3.0, 4.0, 2.0, 6.0, 5.0])

    def runner(cmd, **kw):
        return _Proc(stdout=json.dumps(
            {"policy": "artifact", "first_result_s": next(firsts)}))

    out = _fleet(monkeypatch, tmp_path, runner, replicas=4)
    assert "errors" not in out
    assert out["p50_first_result_s"] == 5.0   # median of [2, 4, 5, 6]
    assert out["p95_first_result_s"] == 6.0
    assert len(out["replicas"]) == 4
