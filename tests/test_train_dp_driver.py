"""The training driver's automatic data-parallel path: with batch shapes
divisible by the (virtual 8-device CPU) mesh, start_training must pick a
mesh, shard batches, run the pjit step, and eval via the sharded engine."""

import logging
import os

import pytest

from dldkd_tpu.config import parse_args


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("synth"))
    generate_dataset(root, collection="synthetic", visual_feature="i3d",
                     n_videos={"train": 12, "val": 6, "test": 6},
                     d_student=24, d_query=16, d_teacher=12)
    return root


def test_driver_takes_mesh_path(synth_root, tmp_path, caplog):
    from dldkd_tpu.train import start_training

    cfg = parse_args([
        "--collection", "synthetic", "--visual_feature", "i3d",
        "--root_path", synth_root, "--q_feat_size", "16",
        "--dset_name", "synthetic", "--double_branch",
        "--label_style", "soft", "--distill_loss_decay", "exp",
        "--results_root", str(tmp_path / "r"), "--bsz", "4",
        "--n_epoch", "2", "--max_es_cnt", "-1",
        "--query_pad_multiple", "8"])
    with caplog.at_level(logging.INFO, logger="dldkd_tpu"):
        run_dir = start_training(cfg)
    assert any("data-parallel: 4 of 8 devices" in r.message
               for r in caplog.records), "mesh path not taken"
    assert os.path.exists(os.path.join(run_dir, "ckpt", "model.ckpt"))
    # drop_last: 12 videos / bsz 4 -> 3 full batches, all mesh-divisible
    log = open(os.path.join(run_dir, "train.log.txt")).read()
    assert "[Epoch] 001" in log
