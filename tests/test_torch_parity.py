"""Cross-implementation parity against the ACTUAL PyTorch reference.

Every other golden test compares against tests/reference_math.py — a numpy
transliteration we wrote ourselves, which carries shared-misreading risk.
These tests import the reference source directly
(/root/reference/method/{model_components,model,optimization}.py), feed both
stacks identical weights (via convert.flax_to_torch_state_dict) and identical
batches with dropout off, and assert agreement:

  - loss modules: clip_nce, clip_nce_soft, clip_kl_only_pos
  - the full DLDKD forward (encoders + every loss term), made deterministic
    by use_hard_negative=True + hard_pool_size=1 (v2t takes the hardest
    negative, t2v's randint(1, 2) can only pick rank 1)
  - a 5-step BertAdam trajectory (clip-inside-step, no bias correction,
    decoupled wd, stepwise warmup-linear)

The reference model needs the label_style config fix of SURVEY §2.10.1 —
threaded into the EDict here exactly as our config layer does.
"""

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


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (easydict is absent -> fake it)."""
    from dldkd_tpu.convert import _ensure_fake_easydict

    _ensure_fake_easydict()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import method.model as ref_model
    import method.model_components as ref_components
    import method.optimization as ref_optim

    torch.manual_seed(0)
    return ref_components, ref_model, ref_optim


# --------------------------------------------------------------------- #
# shared fixture data
# --------------------------------------------------------------------- #

NQ, NV, L, LQ = 10, 6, 8, 5
LABELS = [0, 0, 1, 1, 2, 2, 3, 4, 4, 5]  # sorted, every video covered


def _label_dict(labels):
    d = {}
    for idx, lab in enumerate(labels):
        d.setdefault(lab, []).append(idx)
    return d


@pytest.fixture(scope="module")
def scores():
    rng = np.random.RandomState(7)
    return (rng.randn(NQ, NV).astype(np.float32) * 2.0,
            rng.randn(NQ, NV).astype(np.float32) * 2.0)


# --------------------------------------------------------------------- #
# loss modules
# --------------------------------------------------------------------- #

def test_clip_nce_matches_reference(ref, scores):
    ref_components, _, _ = ref
    from dldkd_tpu.ops import losses

    s, _ = scores
    got_ref = ref_components.clip_nce(reduction="mean")(
        LABELS, _label_dict(LABELS), torch.from_numpy(s))
    got = losses.clip_nce(jnp.asarray(s),
                          jnp.asarray(np.array(LABELS, np.int32)))
    np.testing.assert_allclose(float(got), float(got_ref), rtol=1e-5)


@pytest.mark.parametrize("alpha", [1.0, 0.8, 0.5, 0.3, 0.0])
@pytest.mark.parametrize("belta", [0.8, 0.5])
def test_clip_nce_soft_matches_reference(ref, scores, alpha, belta):
    ref_components, _, _ = ref
    from dldkd_tpu.ops import losses

    s, sims = scores
    got_ref = ref_components.clip_nce_soft(reduction="mean")(
        LABELS, _label_dict(LABELS), torch.from_numpy(s),
        torch.from_numpy(sims), alpha, belta)
    got = losses.clip_nce_soft(jnp.asarray(s), jnp.asarray(sims),
                               jnp.asarray(np.array(LABELS, np.int32)),
                               jnp.float32(alpha), jnp.float32(belta))
    np.testing.assert_allclose(float(got), float(got_ref),
                               rtol=2e-5, atol=1e-5)


def test_frame_kl_matches_reference(ref):
    ref_components, _, _ = ref
    from dldkd_tpu.ops import losses

    rng = np.random.RandomState(3)
    student = rng.randn(NQ, L, NV).astype(np.float32)
    teacher = rng.randn(NQ, L, NV).astype(np.float32)
    lengths = [8, 6, 5, 8, 3, 7]
    mask = np.zeros((NV, L), np.float32)
    for i, n in enumerate(lengths):
        mask[i, :n] = 1.0
    got_ref = ref_components.clip_kl_only_pos()(
        torch.from_numpy(student), torch.from_numpy(teacher),
        torch.from_numpy(mask), LABELS)
    got = losses.frame_kl_loss(jnp.asarray(student), jnp.asarray(teacher),
                               jnp.asarray(mask),
                               jnp.asarray(np.array(LABELS, np.int32)),
                               temperature=0.2)
    np.testing.assert_allclose(float(got), float(got_ref),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# full model forward
# --------------------------------------------------------------------- #

DV, DQ, DT, HIDDEN = 24, 16, 12, 32


def _make_batch():
    rng = np.random.RandomState(11)
    vlen = [8, 6, 5, 8, 3, 7]
    qlen = [5, 4, 3, 5, 2, 5, 4, 3, 5, 5]
    vmask = np.zeros((NV, L), np.float32)
    for i, n in enumerate(vlen):
        vmask[i, :n] = 1.0
    qmask = np.zeros((NQ, LQ), np.float32)
    for i, n in enumerate(qlen):
        qmask[i, :n] = 1.0
    return {
        "student_videos": rng.randn(NV, L, DV).astype(np.float32),
        "student_videos_mask": vmask,
        "teacher_videos": rng.randn(NV, L, DT).astype(np.float32),
        "student_text": rng.randn(NQ, LQ, DQ).astype(np.float32),
        "student_text_mask": qmask,
        "teacher_text": rng.randn(NQ, DT).astype(np.float32),
        "text_labels": np.array(LABELS, np.int32),
    }


def _make_models(ref, label_style):
    """Our flax DLDKD + the reference DLDKD loaded with identical weights."""
    from easydict import EasyDict as edict  # the fake, registered in `ref`

    _, ref_model_mod, _ = ref
    from dldkd_tpu.config import ModelConfig
    from dldkd_tpu.convert import flax_to_torch_state_dict
    from dldkd_tpu.models import DLDKD

    mcfg = ModelConfig(
        visual_input_size=DV, query_input_size=DQ,
        inheritance_hidden=HIDDEN, exploration_hidden=HIDDEN,
        max_ctx_l=L, max_desc_l=LQ, n_heads=4,
        input_drop=0.1, drop=0.1, double_branch=True,
        label_style=label_style,
        use_hard_negative=True, hard_pool_size=1,  # deterministic sampling
        margin=0.2)
    model = DLDKD(config=mcfg)
    b = _make_batch()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(b["student_videos"]),
                        jnp.asarray(b["student_videos_mask"]),
                        jnp.asarray(b["student_text"]),
                        jnp.asarray(b["student_text_mask"]))

    cfg = edict(visual_input_size=DV, query_input_size=DQ,
                inheritance_hidden=HIDDEN, exploration_hidden=HIDDEN,
                max_ctx_l=L, max_desc_l=LQ, n_heads=4,
                input_drop=0.1, drop=0.1, initializer_range=0.02,
                margin=0.2, use_hard_negative=True, hard_pool_size=1,
                label_style=label_style)  # the §2.10.1 fix
    opt = edict(double_branch=True, kl_intra_weight=0.1,
                inher_nce_weight=0.04, explore_nce_weight=0.04,
                collection="tvr", alpha=0.8, belta=0.8)
    tmodel = ref_model_mod.DLDKD(cfg, opt)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(params).items()}
    tmodel.load_state_dict(sd, strict=True)  # also proves name coverage
    tmodel.eval()
    return model, mcfg, params, tmodel, b


def test_encoders_match_reference(ref):
    model, mcfg, params, tmodel, b = _make_models(ref, "soft")
    (inher_ctx, explore_ctx), (inher_q, explore_q) = model.apply(
        params, jnp.asarray(b["student_videos"]),
        jnp.asarray(b["student_videos_mask"]),
        jnp.asarray(b["student_text"]), jnp.asarray(b["student_text_mask"]),
        deterministic=True)
    with torch.no_grad():
        t_ctx_i, t_ctx_e = tmodel.encode_context(
            torch.from_numpy(b["student_videos"]),
            torch.from_numpy(b["student_videos_mask"]))
        t_q_i, t_q_e = tmodel.encode_query(
            torch.from_numpy(b["student_text"]),
            torch.from_numpy(b["student_text_mask"]))
    for ours, theirs in ((inher_ctx, t_ctx_i), (explore_ctx, t_ctx_e),
                         (inher_q, t_q_i), (explore_q, t_q_e)):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("label_style", ["soft", "hard"])
def test_forward_losses_match_reference(ref, label_style):
    from dldkd_tpu.config import TrainConfig
    from dldkd_tpu.models.objective import LossScalars, compute_losses

    model, mcfg, params, tmodel, b = _make_models(ref, label_style)
    tcfg = TrainConfig()
    scalars = LossScalars(jnp.float32(1.0), jnp.float32(0.8),
                          jnp.float32(0.8))
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    loss, loss_dict = compute_losses(model, params, batch,
                                     jax.random.PRNGKey(5), mcfg, tcfg,
                                     scalars, train=False)

    tbatch = {k: torch.from_numpy(v) for k, v in b.items()
              if k != "text_labels"}
    tbatch["text_labels"] = list(LABELS)
    with torch.no_grad():
        t_loss, t_dict = tmodel(tbatch)

    for key in ("inher_trip", "inher_nce", "explore_trip", "explore_nce",
                "kl_intra"):
        np.testing.assert_allclose(
            float(loss_dict[key]), float(t_dict[key]), rtol=2e-4, atol=2e-4,
            err_msg=f"loss term {key} ({label_style})")
    np.testing.assert_allclose(float(loss), float(t_loss),
                               rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------- #
# optimizer trajectory
# --------------------------------------------------------------------- #

def test_bert_adam_trajectory_matches_reference(ref):
    _, _, ref_optim = ref
    import optax

    from dldkd_tpu.optim import bert_adam, schedules

    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 3).astype(np.float32)
    b0 = rng.randn(3).astype(np.float32)
    # grads: step-dependent, some with norm >> 1 to exercise in-step clipping
    grads = [(np.cos(t + rng.randn(4, 3)).astype(np.float32) * 3.0,
              rng.randn(3).astype(np.float32) * 0.2) for t in range(5)]

    # reference
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    topt = ref_optim.BertAdam([tw, tb], lr=0.01, warmup=0.1, t_total=50,
                              schedule="warmup_linear", weight_decay=0.01,
                              max_grad_norm=1.0)
    for gw, gb in grads:
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        topt.step()

    # ours
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    opt = bert_adam(0.01, schedules.make_lr_schedule("warmup_linear", 0.1, 50.0),
                    weight_decay=0.01, max_grad_norm=1.0)
    state = opt.init(params)
    for gw, gb in grads:
        upd, state = opt.update({"w": jnp.asarray(gw), "b": jnp.asarray(gb)},
                                state, params)
        params = optax.apply_updates(params, upd)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-7)


# --------------------------------------------------------------------- #
# §2.5 tail: BertLayer FFN block + frame-level ranking losses
# --------------------------------------------------------------------- #

def test_transformer_block_matches_reference_bertlayer(ref):
    from easydict import EasyDict as edict

    ref_components, _, _ = ref
    from dldkd_tpu.models.components import TransformerBlock

    hid, inter, ll = 32, 64, 7
    block = TransformerBlock(hidden=hid, intermediate=inter, n_heads=4,
                             attn_dropout=0.1, hidden_dropout=0.1)
    rng = np.random.RandomState(2)
    x = rng.randn(3, ll, hid).astype(np.float32)
    mask = np.ones((3, ll), np.float32)
    mask[1, 5:] = 0.0
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask))

    tblock = ref_components.BertLayer(edict(
        hidden_size=hid, intermediate_size=inter, hidden_dropout_prob=0.1,
        num_attention_heads=4, attention_probs_dropout_prob=0.1))
    p = params["params"]

    def lin(d):
        return (torch.from_numpy(np.ascontiguousarray(np.asarray(d["kernel"]).T)),
                torch.from_numpy(np.asarray(d["bias"]).copy()))

    sd = {}
    att = p["attention"]
    for tname, ours in (("attention.self.query", "query"),
                        ("attention.self.key", "key"),
                        ("attention.self.value", "value"),
                        ("attention.output.dense", "out")):
        sd[f"{tname}.weight"], sd[f"{tname}.bias"] = lin(att[ours])
    sd["attention.output.LayerNorm.weight"] = torch.from_numpy(
        np.asarray(att["out_norm"]["scale"]).copy())
    sd["attention.output.LayerNorm.bias"] = torch.from_numpy(
        np.asarray(att["out_norm"]["bias"]).copy())
    ffn = p["ffn"]
    sd["intermediate.dense.0.weight"], sd["intermediate.dense.0.bias"] = \
        lin(ffn["intermediate"])
    sd["output.dense.weight"], sd["output.dense.bias"] = lin(ffn["output"])
    sd["output.LayerNorm.weight"] = torch.from_numpy(
        np.asarray(ffn["out_norm"]["scale"]).copy())
    sd["output.LayerNorm.bias"] = torch.from_numpy(
        np.asarray(ffn["out_norm"]["bias"]).copy())
    tblock.load_state_dict(sd, strict=True)
    tblock.eval()

    got = block.apply(params, jnp.asarray(x), jnp.asarray(mask),
                      deterministic=True)
    with torch.no_grad():
        # reference BertSelfAttention expects the mask pre-unsqueezed to
        # (N, 1, L), as DLDKD.encode_input does (model.py:239-242)
        want = tblock(torch.from_numpy(x),
                      torch.from_numpy(mask).unsqueeze(1))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_frame_trip_loss_matches_reference(ref):
    from dldkd_tpu.ops import losses

    # hard_pool_size=1 -> deterministic rank-1 negatives on both stacks
    _, _, params, tmodel, _ = _make_models(ref, "soft")
    del params
    rng = np.random.RandomState(5)
    s = np.tanh(rng.randn(8, 8).astype(np.float32))  # cosine-like scores
    with torch.no_grad():
        want = tmodel.get_frame_trip_loss(torch.from_numpy(s))
    got = losses.frame_trip_loss(jnp.asarray(s), jax.random.PRNGKey(0),
                                 margin=0.2, use_hard_negative=True,
                                 hard_pool_size=1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# eval metrics vs the reference's own eval.py
# --------------------------------------------------------------------- #

def test_eval_metrics_match_reference(ref):
    """Our sort-free rank/metric computation vs the reference's argsort
    loop (eval.py:59-111) on identical score matrices: R@K, MedR, MeanR,
    and mAP (the reference negates scores before ranking, eval.py:250-257)."""
    import method.eval as ref_eval

    from dldkd_tpu.metrics import build_gt_indices, t2v_metrics

    rng = np.random.RandomState(11)
    nv, nq = 30, 120
    corpus_ids = [f"v{i}" for i in range(nv)]
    q_vids = [corpus_ids[rng.randint(nv)] for _ in range(nq)]
    cap_ids = [f"{v}#enc#{i}" for i, v in enumerate(q_vids)]
    scores = rng.randn(nq, nv).astype(np.float32)  # continuous: no ties

    _, t2v_gt = ref_eval.get_gt(corpus_ids, cap_ids)
    r1, r5, r10, r100, medr, meanr = ref_eval.eval_q2m(-scores, t2v_gt)
    ref_map = ref_eval.t2v_map(-scores, t2v_gt)

    ours = t2v_metrics(jnp.asarray(scores),
                       jnp.asarray(build_gt_indices(q_vids, corpus_ids)))
    assert ours["r1"] == pytest.approx(r1)
    assert ours["r5"] == pytest.approx(r5)
    assert ours["r10"] == pytest.approx(r10)
    assert ours["r100"] == pytest.approx(r100)
    assert ours["medr"] == pytest.approx(medr)
    assert ours["meanr"] == pytest.approx(meanr)
    assert ours["map"] == pytest.approx(float(ref_map), rel=1e-6)


# --------------------------------------------------------------------- #
# data pipeline vs the reference's own Dataset classes
# --------------------------------------------------------------------- #

@pytest.fixture(scope="module")
def synth_paths(tmp_path_factory):
    from dldkd_tpu.data.ingest import dataset_paths
    from dldkd_tpu.data.synthetic import generate_dataset

    root = str(tmp_path_factory.mktemp("synth_refdata"))
    generate_dataset(root, collection="synthetic", visual_feature="i3d",
                     n_videos={"train": 8, "val": 5, "test": 5},
                     frames_range=(6, 40), teacher_frames_range=(4, 20),
                     d_student=20, d_query=14, d_teacher=10, seed=9)
    return dataset_paths(root, "synthetic", "i3d")


def test_train_dataset_matches_reference(ref, synth_paths):
    """pack_train_dataset vs the reference Dataset4DLDKD on the SAME
    on-disk files: per-video student frames (teacher-aligned resample +
    L2 norm), raw teacher frames, per-caption RoBERTa tokens (L2 norm +
    truncation) and CLIP sentence features (data_provider.py:212-263)."""
    import method.data_provider as ref_dp

    from easydict import EasyDict as edict

    from dldkd_tpu.data import BigFile, read_dict
    from dldkd_tpu.data.ingest import pack_train_dataset

    p = synth_paths
    vf = BigFile(p["visual_feat_dir"])
    v2f = read_dict(p["video2frames"])
    max_ctx, max_desc = 16, 7
    ours = pack_train_dataset(p["cap_file"]["train"], vf, v2f,
                              p["text_feat"], p["teacher_vid_feat"],
                              p["teacher_text_feat"],
                              max_ctx_l=max_ctx, max_desc_l=max_desc)

    opt = edict(max_ctx_l=max_ctx, max_desc_l=max_desc,
                teacher="clip", student="i3d")
    ref_ds = ref_dp.Dataset4DLDKD(
        p["cap_file"]["train"], vf, p["text_feat"], p["teacher_vid_feat"],
        p["teacher_text_feat"], opt, video2frames=v2f)
    assert len(ref_ds) == len(ours.videos)

    cap_row = {c: i for i, c in enumerate(ours.queries.cap_ids)}
    for i in range(len(ref_ds)):
        sv, caps, tv, clip_caps, _, cap_ids, vid = ref_ds[i]
        j = ours.videos.ids.index(vid)
        n = sv.shape[0]
        assert int(ours.videos.mask[j].sum()) == n
        np.testing.assert_allclose(ours.videos.feats[j, :n], sv.numpy(),
                                   rtol=1e-6, atol=1e-6)
        assert not ours.videos.feats[j, n:].any()
        np.testing.assert_allclose(ours.videos.teacher_feats[j, :tv.shape[0]],
                                   tv.numpy(), rtol=1e-6, atol=1e-6)
        for cap_id, cap, clip_cap in zip(cap_ids, caps, clip_caps):
            r = cap_row[cap_id]
            lq = cap.shape[0]
            assert int(ours.queries.mask[r].sum()) == lq
            np.testing.assert_allclose(ours.queries.feats[r, :lq],
                                       cap.numpy(), rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(ours.queries.teacher_feats[r],
                                       clip_cap.numpy().reshape(-1),
                                       rtol=1e-6, atol=1e-6)


def test_eval_datasets_match_reference(ref, synth_paths):
    """pack_video_corpus / pack_query_set vs the reference's
    VisDataSet4DLDKD / TxtDataSet4DLDKD (data_provider.py:268-357)."""
    import method.data_provider as ref_dp

    from easydict import EasyDict as edict

    from dldkd_tpu.data import BigFile, pack_query_set, pack_video_corpus, read_dict
    from dldkd_tpu.data.ingest import read_video_ids

    p = synth_paths
    vf = BigFile(p["visual_feat_dir"])
    v2f = read_dict(p["video2frames"])
    max_ctx, max_desc = 16, 7
    vids = read_video_ids(p["cap_file"]["val"])
    videos = pack_video_corpus(vids, vf, v2f, max_ctx_l=max_ctx)
    queries = pack_query_set(p["cap_file"]["val"], p["text_feat"],
                             max_desc_l=max_desc)

    opt = edict(max_ctx_l=max_ctx, max_desc_l=max_desc, student="i3d")
    ref_vis = ref_dp.VisDataSet4DLDKD(vf, v2f, opt, video_ids=vids)
    for i in range(len(ref_vis)):
        frames, _, vid = ref_vis[i]
        j = videos.ids.index(vid)
        n = frames.shape[0]
        assert int(videos.mask[j].sum()) == n
        np.testing.assert_allclose(videos.feats[j, :n], frames.numpy(),
                                   rtol=1e-6, atol=1e-6)

    ref_txt = ref_dp.TxtDataSet4DLDKD(p["cap_file"]["val"], p["text_feat"],
                                      opt)
    for i in range(len(ref_txt)):
        toks, _, cap_id = ref_txt[i]
        r = queries.cap_ids.index(cap_id)
        lq = toks.shape[0]
        assert int(queries.mask[r].sum()) == lq
        np.testing.assert_allclose(queries.feats[r, :lq], toks.numpy(),
                                   rtol=1e-6, atol=1e-6)


def test_collate_train_matches_reference(ref, synth_paths):
    """The soft-NCE alpha-partition is order-dependent: collate_train
    sorts batch items by #captions descending (stable) and lays captions
    out video-major (data_provider.py:111-136). Our static-shape batch
    builder must produce the same video order, the same caption->video
    label structure, and the same feature content for the same videos."""
    import method.data_provider as ref_dp
    import torch as _torch

    from easydict import EasyDict as edict

    from dldkd_tpu.data import BigFile, read_dict
    from dldkd_tpu.data.ingest import pack_train_dataset
    from dldkd_tpu.data.pipeline import TrainLoader

    p = synth_paths
    vf = BigFile(p["visual_feat_dir"])
    v2f = read_dict(p["video2frames"])
    max_ctx, max_desc = 16, 7
    ours = pack_train_dataset(p["cap_file"]["train"], vf, v2f,
                              p["text_feat"], p["teacher_vid_feat"],
                              p["teacher_text_feat"],
                              max_ctx_l=max_ctx, max_desc_l=max_desc)
    loader = TrainLoader(ours, bsz=len(ours.videos), seed=1,
                         query_pad_multiple=8)
    # identity order into both stacks: the stable #captions-desc sorts
    # then agree position-by-position (tie order is input-order-dependent
    # in BOTH stacks, so the inputs must match to compare positionally)
    batch = loader._build_batch(np.arange(len(ours.videos)))

    opt = edict(max_ctx_l=max_ctx, max_desc_l=max_desc,
                teacher="clip", student="i3d")
    ref_ds = ref_dp.Dataset4DLDKD(
        p["cap_file"]["train"], vf, p["text_feat"], p["teacher_vid_feat"],
        p["teacher_text_feat"], opt, video2frames=v2f)
    items = [ref_ds[i] for i in range(len(ref_ds))]
    ref_batch = ref_dp.collate_train(items)

    labels = np.asarray(ref_batch["text_labels"])
    n_q = len(labels)
    np.testing.assert_array_equal(batch["text_labels"][:n_q], labels)
    assert (batch["text_labels"][n_q:] == -1).all()

    # same video content at each batch position (the order-parity check:
    # position k holds the same video in both stacks)
    ref_videos = ref_batch["student_videos"]          # (B, Lmax, D)
    for k in range(ref_videos.shape[0]):
        n = int(ref_batch["student_videos_mask"][k].sum())
        assert int(batch["student_videos_mask"][k].sum()) == n
        np.testing.assert_allclose(batch["student_videos"][k, :n],
                                   ref_videos[k, :n].numpy(),
                                   rtol=1e-6, atol=1e-6)
    # caption features, video-major layout
    ref_text = ref_batch["student_text"]              # (n_q, Lq_max, Dq)
    for r in range(n_q):
        lq = int(ref_batch["student_text_mask"][r].sum())
        assert int(batch["student_text_mask"][r].sum()) == lq
        np.testing.assert_allclose(batch["student_text"][r, :lq],
                                   ref_text[r, :lq].numpy(),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(batch["teacher_text"][:n_q],
                               np.asarray(ref_batch["teacher_text"]).reshape(n_q, -1),
                               rtol=1e-6, atol=1e-6)
