"""Driver auxiliary flags: --profile_dir writes a trace, --eval_untrained
evaluates before any training step (reference train.py eval_untrained)."""

import glob
import os

import pytest

from dldkd_tpu.config import parse_args


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(root, collection="synthetic", visual_feature="i3d",
                     n_videos={"train": 14, "val": 5, "test": 5},
                     d_student=24, d_query=16, d_teacher=12)
    return root


def _base_args(root, results_root):
    return ["--collection", "synthetic", "--visual_feature", "i3d",
            "--root_path", root, "--q_feat_size", "16",
            "--dset_name", "synthetic", "--double_branch",
            "--results_root", results_root, "--bsz", "4",
            "--n_epoch", "1", "--max_es_cnt", "-1",
            "--query_pad_multiple", "8"]


def test_profile_dir_writes_trace(synth_root, tmp_path):
    from dldkd_tpu.train import start_training

    prof = str(tmp_path / "prof")
    cfg = parse_args(_base_args(synth_root, str(tmp_path / "r"))
                     + ["--profile_dir", prof, "--profile_steps", "1"])
    start_training(cfg)
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz (or .xplane.pb)
    found = glob.glob(os.path.join(prof, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in found), f"no trace under {prof}"


def test_eval_untrained_runs_epoch_minus_one(synth_root, tmp_path, caplog):
    import logging

    from dldkd_tpu.train import start_training

    cfg = parse_args(_base_args(synth_root, str(tmp_path / "r2"))
                     + ["--eval_untrained"])
    with caplog.at_level(logging.INFO, logger="dldkd_tpu"):
        run_dir = start_training(cfg)
    # two eval passes happened (untrained + after epoch 0): the untrained
    # one checkpoints first, so a ckpt exists even before training
    vals = [r.message for r in caplog.records if "val fused" in r.message]
    assert len(vals) == 2
    assert os.path.exists(os.path.join(run_dir, "ckpt", "model.ckpt"))
