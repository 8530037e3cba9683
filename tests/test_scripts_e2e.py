"""End-to-end CLI runs through the per-dataset shell scripts.

do_tvr.sh's flag surface is pinned by the whole-run parity fixture (same
collection/feature/dim contract); these tests drive the OTHER two
dataset entries — `scripts/do_activitynet.sh` (reference
do_activitynet.sh:1-21: q_feat 1024, `i3d`) and `scripts/do_charades.sh`
(reference do_charades.sh:1-23: q_feat 1024, lr 2.4e-4, trains on
`i3d_rgb_lgi`, evals on `i3d` per the reference README) — through the
whole driver on a synthetic root at those datasets' query dims, then
through `scripts/do_test.sh`, which restores the run's opt.json (the
TestOptions allowlist round-trip) and re-evaluates the checkpoint.

Each script invocation is a fresh subprocess; a sitecustomize.py shim on
PYTHONPATH forces the CPU platform before any jax import (the
JAX_PLATFORMS env var does not work on this machine's TPU plugin —
tests/conftest.py has the same note).
"""

import glob
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# keep the run tiny: the scripts pin the dataset-defining flags
# (collection, visual_feature, q_feat_size, drop, lr, label_style);
# everything below only shrinks the model/run for the single CPU core
OVERRIDES = [
    "--n_epoch", "2", "--bsz", "4",
    "--inheritance_hidden", "16", "--exploration_hidden", "16",
    "--n_heads", "2", "--max_ctx_l", "8", "--max_desc_l", "5",
    "--eval_query_bsz", "16", "--eval_context_bsz", "8",
    "--query_pad_multiple", "8",
]


def _cpu_env(tmp_path):
    site = tmp_path / "site"
    site.mkdir(exist_ok=True)
    (site / "sitecustomize.py").write_text(
        "import jax\njax.config.update('jax_platforms', 'cpu')\n")
    env = dict(os.environ)
    extra = f":{env['PYTHONPATH']}" if env.get("PYTHONPATH") else ""
    env["PYTHONPATH"] = f"{site}:{REPO}{extra}"
    return env


def _run_script(script, args, env):
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script)] + args,
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}")
    return proc


@pytest.mark.parametrize("script,collection,train_feat,eval_feat", [
    ("do_activitynet.sh", "activitynet", "i3d", "i3d"),
    # Charades trains on i3d_rgb_lgi and evaluates on i3d
    # (reference do_charades.sh:7 + README) — two feature dirs
    ("do_charades.sh", "charades", "i3d_rgb_lgi", "i3d"),
])
def test_dataset_script_end_to_end(tmp_path, script, collection,
                                   train_feat, eval_feat):
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path / "root")
    kw = dict(n_videos={"train": 6, "val": 6, "test": 6},
              frames_range=(8, 16), teacher_frames_range=(4, 8),
              tokens_range=(3, 5), d_student=32, d_query=1024,
              d_teacher=10, seed=7)
    generate_dataset(root, collection=collection, visual_feature=train_feat,
                     **kw)
    if eval_feat != train_feat:
        # same videos/captions (same seed), second BigFile feature dir
        generate_dataset(root, collection=collection,
                         visual_feature=eval_feat, **kw)
    env = _cpu_env(tmp_path)
    results_root = str(tmp_path / "results")

    _run_script(script, [root] + OVERRIDES + ["--results_root",
                                              results_root], env)

    opts = glob.glob(os.path.join(results_root, "**", "opt.json"),
                     recursive=True)
    assert len(opts) == 1, opts
    model_dir = os.path.dirname(opts[0])
    saved = json.load(open(opts[0]))
    # the script's dataset-defining flags landed in the saved run config
    assert saved["collection"] == collection
    assert saved["visual_feature"] == train_feat
    assert saved["q_feat_size"] == 1024
    assert saved["label_style"] == "soft"
    if script == "do_charades.sh":
        assert saved["lr"] == pytest.approx(0.00024)

    # training produced per-epoch metrics + the best checkpoint
    metrics = glob.glob(os.path.join(model_dir, "**", "metrics.jsonl"),
                        recursive=True)
    assert metrics, os.listdir(model_dir)
    sumrs = [json.loads(line)["Val/fused_sumr"]
             for line in open(metrics[0]) if "Val/fused_sumr" in line]
    assert len(sumrs) == 2 and all(0 <= s <= 400 for s in sumrs)
    assert os.path.exists(os.path.join(model_dir, "ckpt", "model.ckpt"))

    # do_test.sh: restore opt.json, rebuild, evaluate the test split on
    # the dataset's EVAL feature (the opt.json round-trip, reference
    # do_test.sh:1-6 contract)
    _run_script("do_test.sh", [collection, eval_feat, root, model_dir],
                env)
    eval_log = os.path.join(model_dir, "eval.log.txt")
    assert os.path.exists(eval_log)
    assert "fused" in open(eval_log).read()
