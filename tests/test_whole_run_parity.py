"""Whole-run trajectory parity against the reference's OWN training driver.

Module-level cross-validation (losses, encoders, optimizer steps, collate,
metrics — tests/test_torch_parity.py) pins every piece, but the epoch-loop
seam — per-epoch distill-weight/alpha/belta decay application
(reference method/train.py:73-125), the train_epoch -> eval_epoch ->
best-SumR-selection cycle (train.py:191-247), and the sorted collate's
interaction with the soft-NCE alpha-partition across epochs — is only
covered end-to-end here: we run the reference's own `train()` for 3 epochs
on a shared on-disk synthetic fixture and our `start_training` with
converter-synced initial weights, then require per-epoch losses to agree to
1e-3, per-epoch fused val SumR to agree exactly, and the same best epoch.

Determinism recipe (no RNG alignment needed across the two stacks):
  - dropout off (input_drop = drop = 0)
  - hard negatives from epoch 0 with hard_pool_size=1: v2t takes
    neg_pair_scores[0], t2v's randint(1, 2) can only pick rank 1
    (reference model.py:360-386)
  - every train video has a DISTINCT caption count, so the stable
    #captions-desc collate sort (data_provider.py:117) is a total order
    and DataLoader shuffle order cannot change batch layout
  - batch composition: either one batch per epoch (bsz > n_videos, so
    shuffle cannot change composition), or — the multibatch configs —
    the reference DataLoader's actual per-item fetch order is RECORDED
    (_RecordingDataset) and replayed verbatim by our loader
    (TrainLoader(epoch_order=...)), pinning shuffle-dependent batch
    composition, t_total = len(loader) x n_epoch, and per-STEP
    warmup-linear LR advancement (reference train.py:209-213) end-to-end

The reference model needs the label_style config fix of SURVEY §2.10.1
(threaded into the model_config EDict exactly as our config layer does).
"""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "method")),
    reason="reference source tree not available")

COLLECTION = "synthwr"
N_TRAIN_VIDEOS = 6
MAX_CTX, MAX_DESC = 16, 7
D_STUDENT, D_QUERY, D_TEACHER = 20, 14, 10
HIDDEN, HEADS = 16, 2
N_EPOCH = 3
HP = dict(lr=3e-4, wd=0.01, lr_warmup_proportion=0.01, bsz=64,
          margin=0.1, grad_clip=-1.0,
          hard_negative_start_epoch=0, hard_pool_size=1,
          distill_loss_decay="exp", exponential_k=0.95,
          linear_k=-0.01, linear_b=1.0, sigmoid_k=800.0,
          selfDistil_sigmoid_k=800.0,
          kl_intra_weight=0.1, inher_nce_weight=0.04,
          explore_nce_weight=0.04,
          alpha=0.8, belta=0.8, alpha_decay="sigmoid",
          belta_decay="sigmoid", max_es_cnt=10, eval_untrained=False)
LOSS_KEYS = ("loss_overall", "inher_trip", "inher_nce", "explore_trip",
             "explore_nce", "kl", "kl_intra")


@pytest.fixture(scope="module")
def ref():
    from dldkd_tpu.convert import _ensure_fake_easydict

    _ensure_fake_easydict()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import method.data_provider as ref_dp
    import method.model as ref_model
    import method.train as ref_train

    return ref_dp, ref_model, ref_train


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("wholerun_data"))
    generate_dataset(
        root, collection=COLLECTION, visual_feature="i3d",
        n_videos={"train": N_TRAIN_VIDEOS, "val": 16},
        caps_sequence={"train": [8, 7, 6, 5, 4, 3]},  # distinct: total sort
        caps_per_video=(1, 3),
        frames_range=(6, 28), teacher_frames_range=(4, 14),
        tokens_range=(3, MAX_DESC),
        d_student=D_STUDENT, d_query=D_QUERY, d_teacher=D_TEACHER,
        noise=0.5, seed=23)
    return root


class _RecordingWriter:
    """SummaryWriter stand-in capturing full-precision per-step scalars
    (the reference's train.log.txt rounds to 4 decimals)."""

    def __init__(self):
        self.records = {}

    def add_scalar(self, tag, value, step):
        self.records.setdefault(tag, []).append((step, float(value)))

    def close(self):
        pass


class _RecordingDataset:
    """Map-style proxy recording the VIDEO ID of every item fetch — the
    DataLoader's actual shuffle order, replayed later by our loader so
    both stacks see identical multi-batch epoch compositions."""

    def __init__(self, ds, order):
        self._ds, self._order = ds, order

    def __len__(self):
        return len(self._ds)

    def __getitem__(self, i):
        self._order.append(self._ds.video_ids[i])
        return self._ds[i]


def _run_reference(ref, data_root, tmp_path, label_style, hp,
                   record_order=None, steps_per_epoch=1):
    """Drive the reference's own train() (method/train.py:191-247) on the
    fixture; returns (init state_dict, per-STEP losses, per-epoch SumR,
    best epoch). record_order: list collecting the DataLoader's video
    access order (multi-batch replay)."""
    ref_dp, ref_model, ref_train = ref
    from easydict import EasyDict as edict  # the registered fake

    from utils.basic_utils import BigFile as RefBigFile
    from utils.basic_utils import read_dict as ref_read_dict

    base = os.path.join(data_root, COLLECTION)
    feat_dir = os.path.join(base, "FeatureData", "i3d")
    text_dir = os.path.join(base, "TextData")
    cap = {s: os.path.join(text_dir, f"{COLLECTION}{s}.caption.txt")
           for s in ("train", "val")}
    text_feat = os.path.join(text_dir, f"roberta_{COLLECTION}_query_feat.hdf5")
    teacher_vid = os.path.join(
        base, "FeatureData", f"new_clip_vit_32_{COLLECTION}_vid_features.hdf5")
    teacher_text = os.path.join(
        text_dir, f"clip_ViT_B_32_{COLLECTION}_query_feat.hdf5")

    writer = _RecordingWriter()
    run_dir = str(tmp_path / f"ref_{label_style}")
    HP = hp
    os.makedirs(run_dir, exist_ok=True)
    opt = edict(device=torch.device("cpu"), device_ids=[],
                num_workers=0, pin_memory=False, debug=False,
                n_epoch=N_EPOCH,
                collection=COLLECTION, teacher="clip", student="i3d",
                max_ctx_l=MAX_CTX, max_desc_l=MAX_DESC,
                q_feat_size=D_QUERY,
                inheritance_hidden=HIDDEN, exploration_hidden=HIDDEN,
                n_heads=HEADS, input_drop=0.0, drop=0.0,
                initializer_range=0.02, double_branch=True,
                eval_context_bsz=200, eval_query_bsz=50,
                ckpt_filepath=os.path.join(run_dir, "model.ckpt"),
                train_log_filepath=os.path.join(run_dir, "train.log.txt"),
                train_log_txt_formatter=(
                    "{time_str} [Epoch] {epoch:03d} [Loss] {loss_str}\n"),
                writer=writer, **HP)

    ref_train.set_seed(9527, use_cuda=False)
    visual_feats = RefBigFile(feat_dir)
    opt.visual_feat_dim = visual_feats.ndims
    video2frames = ref_read_dict(
        os.path.join(feat_dir, "video2frames.txt"))
    train_ds = ref_dp.Dataset4DLDKD(cap["train"], visual_feats, text_feat,
                                    teacher_vid, teacher_text, opt,
                                    video2frames=video2frames)
    if record_order is not None:
        train_ds = _RecordingDataset(train_ds, record_order)
    val_txt = ref_dp.TxtDataSet4DLDKD(cap["val"], text_feat, opt)
    val_vid = ref_dp.VisDataSet4DLDKD(
        visual_feats, video2frames, opt,
        video_ids=ref_dp.read_video_ids(cap["val"]))

    # the model_config EDict of reference train.py:300-314, plus the
    # label_style threading fix (SURVEY §2.10.1 — as shipped, forward
    # crashes on the missing key)
    model_cfg = edict(
        visual_input_size=opt.visual_feat_dim,
        query_input_size=opt.q_feat_size,
        inheritance_hidden=HIDDEN, exploration_hidden=HIDDEN,
        max_ctx_l=MAX_CTX, max_desc_l=MAX_DESC,
        input_drop=0.0, device=[], drop=0.0, n_heads=HEADS,
        initializer_range=0.02, margin=HP["margin"],
        use_hard_negative=False, hard_pool_size=HP["hard_pool_size"],
        label_style=label_style)
    model = ref_model.DLDKD(model_cfg, opt)
    sd0 = {k: v.detach().clone().numpy()
           for k, v in model.state_dict().items()}

    sumrs = []
    orig_eval = ref_train.eval_epoch

    def recording_eval(*a, **k):
        s = orig_eval(*a, **k)
        sumrs.append(float(s))
        return s

    ref_train.eval_epoch = recording_eval
    try:
        ref_train.train(model, train_ds, val_vid, val_txt, opt)
    finally:
        ref_train.eval_epoch = orig_eval

    losses = {}
    for k in LOSS_KEYS:
        recs = sorted(writer.records[f"Train/{k}"])
        # per-step scalars at global_step = epoch * len(loader) + batch_idx
        # (reference train.py:131-132) — contiguous across epochs
        assert [s for s, _ in recs] == list(range(N_EPOCH * steps_per_epoch))
        losses[k] = [v for _, v in recs]
    ckpt = torch.load(opt.ckpt_filepath, map_location="cpu",
                      weights_only=False)
    return sd0, losses, sumrs, int(ckpt["epoch"])


def _run_ours(data_root, tmp_path, label_style, sd0, hp, epoch_order=None):
    """Our start_training on the same files, init synced from sd0."""
    from dldkd_tpu.config import (
        Config, DataConfig, EvalConfig, ModelConfig, TrainConfig)
    from dldkd_tpu.convert import torch_state_dict_to_flax
    from dldkd_tpu.train import start_training
    from flax import serialization

    HP = hp
    cfg = Config(
        exp_id=f"wholerun_{label_style}",
        results_root=str(tmp_path / f"ours_{label_style}"),
        eval_untrained=HP["eval_untrained"],
        model=ModelConfig(
            inheritance_hidden=HIDDEN, exploration_hidden=HIDDEN,
            n_heads=HEADS, double_branch=True, label_style=label_style,
            max_ctx_l=MAX_CTX, max_desc_l=MAX_DESC,
            input_drop=0.0, drop=0.0, margin=HP["margin"],
            hard_pool_size=HP["hard_pool_size"]),
        train=TrainConfig(
            lr=HP["lr"], wd=HP["wd"],
            lr_warmup_proportion=HP["lr_warmup_proportion"],
            n_epoch=N_EPOCH, bsz=HP["bsz"], seed=9527,
            grad_clip=HP["grad_clip"], max_es_cnt=HP["max_es_cnt"],
            hard_negative_start_epoch=HP["hard_negative_start_epoch"],
            hard_pool_size=HP["hard_pool_size"],
            distill_loss_decay=HP["distill_loss_decay"],
            exponential_k=HP["exponential_k"],
            sigmoid_k=HP["sigmoid_k"],
            selfDistil_sigmoid_k=HP["selfDistil_sigmoid_k"],
            kl_intra_weight=HP["kl_intra_weight"],
            inher_nce_weight=HP["inher_nce_weight"],
            explore_nce_weight=HP["explore_nce_weight"],
            alpha=HP["alpha"], belta=HP["belta"],
            alpha_decay=HP["alpha_decay"], belta_decay=HP["belta_decay"]),
        data=DataConfig(root_path=data_root, collection=COLLECTION,
                        visual_feature="i3d", q_feat_size=D_QUERY,
                        max_ctx_l=MAX_CTX, max_desc_l=MAX_DESC,
                        query_pad_multiple=8),
        eval=EvalConfig(eval_query_bsz=50, eval_context_bsz=200),
    ).finalize()

    params = torch_state_dict_to_flax(sd0, double_branch=True)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}
    start_training(cfg, initial_params=params, epoch_order=epoch_order)

    losses = {k: {} for k in LOSS_KEYS}
    sumrs = []
    with open(os.path.join(cfg.tensorboard_log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            for k in LOSS_KEYS:
                if f"Train/{k}" in rec:
                    losses[k][rec["step"]] = rec[f"Train/{k}"]
            if "Val/fused_sumr" in rec:
                sumrs.append(rec["Val/fused_sumr"])
    losses = {k: [v[s] for s in sorted(v)] for k, v in losses.items()}

    with open(os.path.join(cfg.ckpt_dir, "model.ckpt"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return losses, sumrs, int(raw["epoch"])


_MATRIX = pytest.mark.whole_run_matrix  # secondary configs: deselectable
                                        # for a fast dev run (pytest.ini)


@pytest.mark.parametrize("label_style,overrides", [
    ("soft", {}),
    pytest.param("hard", {}, marks=_MATRIX),
    # the OTHER decay families end-to-end (exp/sigmoid are the shipped
    # defaults covered above; linear distill + cosine alpha + exp belta
    # exercise the remaining reference train_epoch branches,
    # method/train.py:73-125)
    pytest.param("soft", dict(distill_loss_decay="linear",
                              alpha_decay="cosine", belta_decay="exp"),
                 marks=_MATRIX),
    # --eval_untrained: the epoch -1 eval-before-training path
    # (reference train.py:216-228 start_epoch=-1, `if epoch_i > -1`)
    pytest.param("soft", dict(eval_untrained=True), marks=_MATRIX),
    # MULTI-BATCH epochs (bsz=3 over 6 videos -> 2 steps/epoch): the
    # reference DataLoader's shuffle order is recorded and replayed by
    # our loader, pinning shuffle-dependent batch composition, per-step
    # warmup-linear LR over t_total = len(loader) x n_epoch (reference
    # train.py:209-213), and multi-step epoch-loss averaging
    ("soft", dict(bsz=3)),
    pytest.param("hard", dict(bsz=3), marks=_MATRIX),
], ids=["soft", "hard", "soft-altdecays", "soft-evaluntrained",
        "soft-multibatch", "hard-multibatch"])
def test_whole_run_matches_reference_driver(ref, data_root, tmp_path,
                                            label_style, overrides):
    hp = {**HP, **overrides}
    steps = -(-N_TRAIN_VIDEOS // hp["bsz"])  # = len(reference DataLoader)
    record = [] if steps > 1 else None
    sd0, ref_losses, ref_sumrs, ref_best = _run_reference(
        ref, data_root, tmp_path, label_style, hp,
        record_order=record, steps_per_epoch=steps)
    epoch_order = None
    if record is not None:
        assert len(record) == N_EPOCH * N_TRAIN_VIDEOS
        epoch_order = [record[e * N_TRAIN_VIDEOS:(e + 1) * N_TRAIN_VIDEOS]
                       for e in range(N_EPOCH)]
        # the replay only evidences shuffle handling if the sampler
        # actually moved items between epochs (seeded: stable outcome)
        assert any(o != epoch_order[0] for o in epoch_order[1:])
    our_losses, our_sumrs, our_best = _run_ours(
        data_root, tmp_path, label_style, sd0, hp, epoch_order=epoch_order)

    # per-STEP training losses, every component, every step of every epoch
    for k in LOSS_KEYS:
        assert len(our_losses[k]) == N_EPOCH * steps
        np.testing.assert_allclose(
            our_losses[k], ref_losses[k], rtol=0, atol=1e-3,
            err_msg=f"{label_style}: per-step {k} diverged")

    # per-epoch fused validation SumR: identical ranks -> identical
    # floats (+1 pre-training eval when eval_untrained)
    n_evals = N_EPOCH + (1 if hp["eval_untrained"] else 0)
    assert len(ref_sumrs) == n_evals and len(our_sumrs) == n_evals
    np.testing.assert_allclose(our_sumrs, ref_sumrs, rtol=0, atol=1e-9)

    # the training must actually move the model for this to be evidence
    # of trajectory (not constant-function) agreement
    assert not np.allclose(ref_losses["loss_overall"][0],
                           ref_losses["loss_overall"][-1], atol=1e-6)

    # identical best-epoch selection (strict-improvement rule both sides)
    assert our_best == ref_best


# ---------------------------------------------------------------------------
# the hard-negative epoch flip (reference train.py:53-54 ->
# model.set_hard_negative, model.py:95-98): epoch 0 trains WITHOUT hard
# negatives, epochs >= hard_negative_start_epoch with them. Determinism
# pre-flip needs the no-hard-negative sampling branch to be forced:
# v2t's randint(0, n_negs) is deterministic only with ONE negative
# caption per batch, t2v's randint(1, n_videos) only with TWO videos —
# so this fixture has 2-video batches with exactly 1 caption per video
# (equal caption counts are safe here because the reference's collate
# sort is STABLE and the recorded-shuffle replay pins the fetch order).
# ---------------------------------------------------------------------------

FLIP_COLLECTION = "synthwrflip"
N_FLIP_VIDEOS = 4


@pytest.fixture(scope="module")
def data_root_flip(tmp_path_factory):
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("wholerun_flip_data"))
    # frames_range floor >= teacher_frames_range ceiling: the reference's
    # alignment only DOWNSAMPLES student frames to the teacher count
    # (data_provider.py:231, uniform_feature_sampling is a no-op when the
    # clip is already shorter), so a student clip shorter than its teacher
    # clip leaves the two towers' batch paddings mismatched and the
    # reference forward crashes in mask_logits — real I3D clips are always
    # denser than CLIP's sampled frames, synthetic ones must be too
    generate_dataset(
        root, collection=FLIP_COLLECTION, visual_feature="i3d",
        n_videos={"train": N_FLIP_VIDEOS, "val": 16},
        caps_sequence={"train": [1] * N_FLIP_VIDEOS},
        caps_per_video=(1, 3),
        frames_range=(14, 28), teacher_frames_range=(4, 14),
        tokens_range=(3, MAX_DESC),
        d_student=D_STUDENT, d_query=D_QUERY, d_teacher=D_TEACHER,
        noise=0.5, seed=31)
    return root


@pytest.mark.whole_run_matrix
def test_hard_negative_flip_matches_reference_driver(
        ref, data_root_flip, tmp_path, monkeypatch):
    """hard_negative_start_epoch=1 end-to-end: per-step losses agree to
    the matrix tolerance ACROSS the flip epoch, the epoch-boundary timing
    of set_hard_negative matches the reference driver, and our driver
    builds exactly TWO train-step programs (one per config — the flip is
    one recompile, not per-epoch recompiles)."""
    import dldkd_tpu.parallel as parallel_mod

    hp = {**HP, "bsz": 2, "hard_negative_start_epoch": 1}
    # _run_reference/_run_ours read the module constants; scope them to
    # the flip fixture for this test only
    monkeypatch.setattr(sys.modules[__name__], "COLLECTION",
                        FLIP_COLLECTION)
    monkeypatch.setattr(sys.modules[__name__], "N_TRAIN_VIDEOS",
                        N_FLIP_VIDEOS)

    steps = N_FLIP_VIDEOS // hp["bsz"]   # 2 steps/epoch, no short batch
    record = []
    sd0, ref_losses, ref_sumrs, ref_best = _run_reference(
        ref, data_root_flip, tmp_path, "soft", hp,
        record_order=record, steps_per_epoch=steps)
    assert len(record) == N_EPOCH * N_FLIP_VIDEOS
    epoch_order = [record[e * N_FLIP_VIDEOS:(e + 1) * N_FLIP_VIDEOS]
                   for e in range(N_EPOCH)]

    built_cfgs = []
    real_make = parallel_mod.make_dp_train_step

    def counting_make(model, mcfg, tcfg, optimizer, mesh):
        built_cfgs.append(bool(mcfg.use_hard_negative))
        return real_make(model, mcfg, tcfg, optimizer, mesh)

    monkeypatch.setattr(parallel_mod, "make_dp_train_step", counting_make)
    our_losses, our_sumrs, our_best = _run_ours(
        data_root_flip, tmp_path, "soft", sd0, hp,
        epoch_order=epoch_order)

    # exactly ONE recompile at the flip: two programs total — the
    # pre-flip config (hard negatives off) and the post-flip one
    assert built_cfgs == [False, True], built_cfgs

    for k in LOSS_KEYS:
        assert len(our_losses[k]) == N_EPOCH * steps
        np.testing.assert_allclose(
            our_losses[k], ref_losses[k], rtol=0, atol=1e-3,
            err_msg=f"flip: per-step {k} diverged")
    np.testing.assert_allclose(our_sumrs, ref_sumrs, rtol=0, atol=1e-9)
    assert not np.allclose(ref_losses["loss_overall"][0],
                           ref_losses["loss_overall"][-1], atol=1e-6)
    assert our_best == ref_best
