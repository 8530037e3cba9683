"""Training objective: loss assembly over a batch.

Reproduces reference `DLDKD.forward` (method/model.py:100-163):

  loss = inher_trip
       + inher_nce_weight   * (clip_nce | clip_nce_soft vs teacher)
       + kl_intra_weight * kd_weight * frame_KL(student, teacher, T=0.2)
       + explore_trip
       + explore_nce_weight * (clip_nce | clip_nce_soft vs itself)

kd_weight / alpha / belta are traced scalars updated per epoch by the decay
schedules (reference method/train.py:73-125) so decays never recompile.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dldkd_tpu.config import ModelConfig, TrainConfig
from dldkd_tpu.ops import losses
from dldkd_tpu.ops.similarity import clip_scores, clip_scores_unnormalized


class LossScalars(NamedTuple):
    """Per-epoch decayed scalars (traced; see dldkd_tpu.optim.schedules)."""

    kd_weight: jnp.ndarray  # distill loss decay, reference train.py:73-82
    alpha: jnp.ndarray      # soft-NCE partition threshold, train.py:85-104
    belta: jnp.ndarray      # GT/soft mixing, train.py:106-125


def compute_losses(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    scalars: LossScalars,
    train: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full training loss for one batch.

    batch keys (static shapes, see dldkd_tpu.data.pipeline):
      student_videos (B, Lv, Dv), student_videos_mask (B, Lv),
      teacher_videos (B, Lv, Dt), student_text (Q, Lq, Dq),
      student_text_mask (Q, Lq), teacher_text (Q, Dt),
      text_labels (Q,) int32 with -1 padding.
    """
    dropout_rng, sample_rng = jax.random.split(rng)
    rngs = {"dropout": dropout_rng} if train else {}
    det = not train

    use_stacked = getattr(tcfg, "stacked_towers", False)
    if use_stacked:
        # both branches' towers as one vmapped (2, ...) computation —
        # half the kernel count (see models.stacked; bf16 speed knob,
        # identical math, branch-split dropout streams)
        from dldkd_tpu.models.stacked import encode_stacked

        (inher_ctx, explore_ctx), (inher_q, explore_q) = encode_stacked(
            model, params,
            batch["student_videos"], batch["student_videos_mask"],
            batch["student_text"], batch["student_text_mask"],
            rngs=rngs, deterministic=det)
    else:
        (inher_ctx, explore_ctx), (inher_q, explore_q) = model.apply(
            params,
            batch["student_videos"], batch["student_videos_mask"],
            batch["student_text"], batch["student_text_mask"],
            deterministic=det, rngs=rngs,
        )
    if inher_ctx.dtype != jnp.float32:
        # bf16 speed path: towers compute in bf16, ALL loss math stays f32
        # (softmax/logsumexp/KL are precision-sensitive; params and the
        # optimizer are f32 throughout — standard mixed precision)
        inher_ctx, inher_q = (inher_ctx.astype(jnp.float32),
                              inher_q.astype(jnp.float32))
        if explore_ctx is not None:
            explore_ctx, explore_q = (explore_ctx.astype(jnp.float32),
                                      explore_q.astype(jnp.float32))

    vmask = batch["student_videos_mask"]
    labels = batch["text_labels"]

    # teacher scores straight from the precomputed CLIP features
    # (reference model.py:113-116 — the teacher has no runtime parameters)
    _, teacher_frame = clip_scores(batch["teacher_text"], batch["teacher_videos"], vmask)
    teacher_raw = clip_scores_unnormalized(
        batch["teacher_text"], batch["teacher_videos"], vmask)

    inher_cos, inher_frame = clip_scores(inher_q, inher_ctx, vmask)
    inher_raw = clip_scores_unnormalized(inher_q, inher_ctx, vmask)

    k_inher, k_explore = jax.random.split(sample_rng)
    inher_trip = losses.clip_triplet_loss(
        inher_cos, labels, k_inher, mcfg.margin,
        mcfg.use_hard_negative, mcfg.hard_pool_size)
    if mcfg.label_style == "soft":
        inher_nce = tcfg.inher_nce_weight * losses.clip_nce_soft(
            inher_raw, teacher_raw, labels, scalars.alpha, scalars.belta)
    else:
        inher_nce = tcfg.inher_nce_weight * losses.clip_nce(inher_raw, labels)

    kl_intra = tcfg.kl_intra_weight * scalars.kd_weight * losses.frame_kl_loss(
        inher_frame, teacher_frame, vmask, labels, temperature=0.2)

    explore_trip = jnp.float32(0.0)
    explore_nce = jnp.float32(0.0)
    if mcfg.double_branch:
        explore_cos, _ = clip_scores(explore_q, explore_ctx, vmask)
        explore_raw = clip_scores_unnormalized(explore_q, explore_ctx, vmask)
        explore_trip = losses.clip_triplet_loss(
            explore_cos, labels, k_explore, mcfg.margin,
            mcfg.use_hard_negative, mcfg.hard_pool_size)
        if mcfg.label_style == "soft":
            # self-distillation: the branch's own scores are the soft target
            # (reference model.py:149-150)
            explore_nce = tcfg.explore_nce_weight * losses.clip_nce_soft(
                explore_raw, explore_raw, labels, scalars.alpha, scalars.belta)
        else:
            explore_nce = tcfg.explore_nce_weight * losses.clip_nce(
                explore_raw, labels)

    loss = inher_trip + inher_nce + kl_intra + explore_trip + explore_nce
    loss_dict = {
        "loss_overall": loss,
        "inher_trip": inher_trip,
        "inher_nce": inher_nce,
        "explore_trip": explore_trip,
        "explore_nce": explore_nce,
        "kl": kl_intra,
        "kl_intra": kl_intra,
    }
    return loss, loss_dict
