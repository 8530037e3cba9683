"""Mid-training resume: --resume restores params + optimizer + epoch + rng
exactly (the reference's weights-only checkpoint cannot do this,
reference train.py:231-235 / SURVEY S5.4)."""

import glob
import os

import numpy as np
import pytest

from dldkd_tpu import checkpoint as ckpt_lib
from dldkd_tpu.config import parse_args


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(root, collection="synthetic", visual_feature="i3d",
                     n_videos={"train": 10, "val": 6, "test": 6},
                     d_student=24, d_query=16, d_teacher=12)
    return root


def _args(root, results_root, extra=()):
    return ["--collection", "synthetic", "--visual_feature", "i3d",
            "--root_path", root, "--q_feat_size", "16",
            "--dset_name", "synthetic", "--double_branch",
            "--label_style", "soft", "--distill_loss_decay", "exp",
            "--results_root", results_root, "--bsz", "4",
            "--n_epoch", "2", "--max_es_cnt", "-1",
            "--query_pad_multiple", "8", *extra]


def test_resume_restores_full_state(synth_root, tmp_path):
    from dldkd_tpu.train import start_training

    res1 = str(tmp_path / "r1")
    cfg = parse_args(_args(synth_root, res1))
    run_dir = start_training(cfg)
    ckpt_dir = os.path.join(run_dir, "ckpt")
    assert os.path.exists(os.path.join(ckpt_dir, "model.ckpt"))

    # restore raw state to know what epoch the ckpt holds
    from flax import serialization
    with open(os.path.join(ckpt_dir, "model.ckpt"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    saved_epoch = int(raw["epoch"])
    saved_best = float(raw["best_score"])

    res2 = str(tmp_path / "r2")
    cfg2 = parse_args(_args(synth_root, res2,
                            extra=["--resume", ckpt_dir, "--n_epoch", "3"]))
    run_dir2 = start_training(cfg2)

    # the resumed run continued past the saved epoch and kept best score
    log = open(os.path.join(run_dir2, "train.log.txt")).read()
    assert f"[Epoch] {saved_epoch + 1:03d}" in log
    assert f"[Epoch] {saved_epoch:03d}" not in log  # did not re-run it
    # its checkpoint (if improved) is from a later epoch
    ckpt2 = os.path.join(run_dir2, "ckpt", "model.ckpt")
    if os.path.exists(ckpt2):
        with open(ckpt2, "rb") as f:
            raw2 = serialization.msgpack_restore(f.read())
        assert int(raw2["epoch"]) > saved_epoch
        assert float(raw2["best_score"]) >= saved_best


def test_preemption_guard_unit():
    import os
    import signal

    from dldkd_tpu.utils.preemption import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.should_stop
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.should_stop
    # the pre-existing handler is restored outside the context
    assert signal.getsignal(signal.SIGTERM) == prev

    g2 = PreemptionGuard()
    g2.trigger()
    assert g2.should_stop


def test_preemption_during_eval_checkpoints_this_epoch(synth_root,
                                                       tmp_path,
                                                       monkeypatch):
    """SIGTERM landing DURING the validation eval: acted on right after
    the eval/best-ckpt block (not one epoch later, and not never on the
    last epoch). The finished epoch is recorded as done, so --resume
    continues at epoch + 1."""
    from flax import serialization

    from dldkd_tpu import train as train_mod
    from dldkd_tpu.train import start_training
    from dldkd_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard()
    # the driver's eval entry point is run_retrieval_eval (the engine
    # dispatcher) since the auto-engine change
    real_eval = train_mod.run_retrieval_eval

    def eval_then_sigterm(*a, **kw):
        out = real_eval(*a, **kw)
        guard.trigger()   # the signal lands while eval runs
        return out

    monkeypatch.setattr(train_mod, "run_retrieval_eval", eval_then_sigterm)
    res1 = str(tmp_path / "e1")
    # bsz 3: gcd(3, query_pad_multiple) = 1 -> single-device path, whose
    # eval goes through the module-level eval_retrieval we wrapped
    cfg = parse_args(_args(synth_root, res1, extra=["--bsz", "3"]))
    run_dir = start_training(cfg, preempt_guard=guard)

    log = open(os.path.join(run_dir, "train.log.txt")).read()
    assert "[Epoch] 000" in log and "[Epoch] 001" not in log
    # eval + best-ckpt completed before the stop -> best ckpt exists and
    # the preempt ckpt records epoch 0 as DONE
    assert os.path.exists(os.path.join(run_dir, "ckpt", "model.ckpt"))
    preempt_dir = os.path.join(run_dir, "ckpt_preempt")
    with open(os.path.join(preempt_dir, "model.ckpt"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    assert int(raw["epoch"]) == 0

    monkeypatch.undo()
    res2 = str(tmp_path / "e2")
    cfg2 = parse_args(_args(synth_root, res2,
                            extra=["--bsz", "3", "--resume", preempt_dir]))
    run_dir2 = start_training(cfg2)
    log2 = open(os.path.join(run_dir2, "train.log.txt")).read()
    assert "[Epoch] 000" not in log2 and "[Epoch] 001" in log2


def test_preemption_checkpoints_and_resumes(synth_root, tmp_path,
                                            monkeypatch):
    """SIGTERM mid-epoch -> full resume checkpoint in <ckpt>_preempt;
    --resume on it replays the interrupted epoch and finishes training."""
    import dldkd_tpu.utils.preemption as preemption_mod
    from dldkd_tpu.train import start_training

    class FakeGuard:
        """Latches after a few polls, simulating SIGTERM mid-epoch 0."""

        polls = 0          # class-level: main() and start_training share
        latched = False    # the latched state across instances

        def install(self):
            return self

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return None

        def trigger(self):
            FakeGuard.latched = True

        @property
        def should_stop(self):
            FakeGuard.polls += 1
            if FakeGuard.polls > 2:
                FakeGuard.latched = True
            return FakeGuard.latched

    monkeypatch.setattr(preemption_mod, "PreemptionGuard", FakeGuard)
    res1 = str(tmp_path / "p1")
    # go through the CLI entry: on preemption it must SKIP the post-train
    # test inference and return
    from dldkd_tpu import train as train_mod

    train_mod.main(_args(synth_root, res1))
    run_dir = glob.glob(os.path.join(res1, "*", "*-*"))[0]
    preempt_dir = os.path.join(run_dir, "ckpt_preempt")
    assert not os.path.exists(os.path.join(run_dir, "eval.log.txt"))
    assert os.path.exists(os.path.join(preempt_dir, "model.ckpt"))
    # the interrupted epoch is recorded as not-yet-done
    from flax import serialization
    with open(os.path.join(preempt_dir, "model.ckpt"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    assert int(raw["epoch"]) == -1  # epoch 0 was interrupted
    # no best checkpoint was written (we never reached the val eval)
    assert not os.path.exists(os.path.join(run_dir, "ckpt", "model.ckpt"))

    monkeypatch.undo()  # real guard for the resumed run
    res2 = str(tmp_path / "p2")
    cfg2 = parse_args(_args(synth_root, res2,
                            extra=["--resume", preempt_dir]))
    run_dir2 = start_training(cfg2)
    log = open(os.path.join(run_dir2, "train.log.txt")).read()
    assert "[Epoch] 000" in log and "[Epoch] 001" in log
    assert os.path.exists(os.path.join(run_dir2, "ckpt", "model.ckpt"))
