"""Numpy oracles transliterating the reference loss math, loops included.

These re-derive the equations of /root/reference/method/model.py:166-197,
353-387 and /root/reference/method/model_components.py:85-236 in plain numpy
for use as golden values in tests. They intentionally keep the reference's
per-row loops; the framework's vectorized implementations must match them.
Only used by tests — never imported by the framework.
"""

import math

import numpy as np


def softmax(x, axis=-1):
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


def log_softmax(x, axis=-1):
    x = x - np.max(x, axis=axis, keepdims=True)
    return x - np.log(np.sum(np.exp(x), axis=axis, keepdims=True))


def logsumexp(x, axis=None):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return np.squeeze(out, axis=axis) if axis is not None else out.item()


def mask_logits(x, m):
    return x * m + (1 - m) * (-1e10)


def l2norm(x, eps=1e-12):
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


def sim_scores(query, ctx, mask, normalized=True):
    """model.py:307-350: (Nq,Nv) max-over-frames + (Nq,L,Nv) frame scores."""
    if normalized:
        query, ctx = l2norm(query), l2norm(ctx)
    frame = np.einsum("md,nld->mln", query, ctx)
    frame = mask_logits(frame, mask.T[None, :, :])
    return frame.max(axis=1), frame


def ref_clip_nce(labels, scores):
    """model_components.py:211-236 (mean reduction)."""
    nq, nv = scores.shape
    t2v_nom = scores[np.arange(nq), labels]
    t2v_den = logsumexp(scores, axis=1)
    label_dict = {}
    for q, v in enumerate(labels):
        label_dict.setdefault(int(v), []).append(q)
    v2t_nom = np.zeros(nv)
    v2t_den = np.zeros(nv)
    for i, qs in label_dict.items():
        v2t_nom[i] = logsumexp(scores[qs, i], axis=0)
        v2t_den[i] = logsumexp(scores[:, i], axis=0)
    return np.mean(t2v_den - t2v_nom) + np.mean(v2t_den - v2t_nom)


def ref_clip_nce_soft(labels, scores, sims, alpha, belta):
    """model_components.py:106-209 (mean reduction)."""
    nq, nv = scores.shape
    hard_q = math.floor(alpha * nq)
    soft_q = nq - hard_q
    hard_v = math.floor(alpha * nv)
    soft_v = nv - hard_v

    i_ij = np.zeros((nq, nv))
    label_dict = {}
    for q, v in enumerate(labels):
        label_dict.setdefault(int(v), []).append(q)
    for i, qs in label_dict.items():
        i_ij[qs, i] = 1

    i_q = i_ij.copy()
    sims_t = softmax(sims, axis=-1)
    i_q[hard_q:, :] = np.clip((1 - belta) * sims_t[hard_q:, :] + belta * i_q[hard_q:, :], 0, None)

    i_v = i_ij.T.copy()
    sims_v = softmax(sims.T, axis=-1)
    i_v[hard_v:, :] = np.clip((1 - belta) * sims_v[hard_v:, :] + belta * i_v[hard_v:, :], 0, None)

    t2v_nom_hard = (i_q[:hard_q] * scores[:hard_q]).sum()
    t2v_den_hard = (i_q[:hard_q] * logsumexp(scores[:hard_q], axis=1)[:, None] / 1.0).sum() \
        if hard_q else 0.0
    # note: reference multiplies row-lse by every I entry then sums
    if hard_q:
        t2v_den_hard = (i_q[:hard_q] * logsumexp(scores[:hard_q], axis=1)[:, None]).sum()
    t2v_nom_soft = (i_q[hard_q:] * scores[hard_q:]).sum()
    t2v_den_soft = (i_q[hard_q:] * logsumexp(scores[hard_q:], axis=1)[:, None]).sum() \
        if soft_q else 0.0

    v2t_nom_hard = v2t_den_hard = 0.0
    v2t_nom_soft = v2t_den_soft = 0.0
    for i in label_dict:
        nom = logsumexp(np.log(i_v[i, :] + 1e-12) + scores[:, i], axis=0)
        den = logsumexp(scores[:, i], axis=0)
        if i < hard_v:
            v2t_nom_hard += nom
            v2t_den_hard += den
        else:
            v2t_nom_soft += nom
            v2t_den_soft += den

    hard_loss = 0.0
    soft_loss = 0.0
    if hard_q != 0 and hard_v != 0:
        hard_loss = (t2v_den_hard - t2v_nom_hard) / hard_q + (v2t_den_hard - v2t_nom_hard) / hard_v
    if soft_q != 0 and soft_v != 0:
        soft_loss = (t2v_den_soft - t2v_nom_soft) / soft_q + (v2t_den_soft - v2t_nom_soft) / soft_v
    return alpha * hard_loss + (1 - alpha) * soft_loss


def ref_frame_kl(student_frame, teacher_frame, video_mask, labels, temp=0.2):
    """model.py:183-197 mode='frame_score' (sum over queries)."""
    loss = 0.0
    for q, v in enumerate(labels):
        m = int((video_mask[v] > 0).sum())
        p = student_frame[q, :m, v]
        t = teacher_frame[q, :m, v]
        log_p = log_softmax(p / temp)
        t_prob = softmax(t / temp)
        log_t = log_softmax(t / temp)
        loss += float(np.sum(t_prob * (log_t - log_p)))
    return loss


def ref_triplet_pos_terms(scores, labels, margin, use_hard_negative):
    """model.py:353-387, deterministic pieces only (hard-negative path is
    deterministic for v2t; t2v is stochastic so tests check support/bounds).
    Returns (v2t_loss_with_hard_neg, t2v_pos_scores)."""
    nq, nv = scores.shape
    labels = np.asarray(labels)
    v2t = scores.T
    v2t_loss = 0.0
    for i in range(nv):
        pos = v2t[i][labels == i].mean()
        negs = np.sort(v2t[i][labels != i])[::-1]
        if use_hard_negative:
            neg = negs[0]
            v2t_loss += max(margin + neg - pos, 0.0)
    t2v_pos = scores[np.arange(nq), labels]
    return v2t_loss, t2v_pos


# --------------------------------------------------------------------- #
# Tower oracles: reference model forward math (model.py:199-258,
# model_components.py:269-450) computed in numpy from a flax param tree.
# Deterministic (dropout off).
# --------------------------------------------------------------------- #

def layer_norm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def linear(x, kernel, bias=None):
    y = x @ kernel
    return y + bias if bias is not None else y


def input_proj_oracle(p, x):
    """LinearLayer: LN -> (dropout) -> Linear -> ReLU."""
    x = layer_norm(x, p["input_norm"]["scale"], p["input_norm"]["bias"])
    x = linear(x, p["proj"]["kernel"], p["proj"]["bias"])
    return np.maximum(x, 0.0)


def pos_embed_oracle(p, x):
    L = x.shape[1]
    x = x + p["pos_embed"][None, :L]
    return layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])


def attention_oracle(p, x, mask, n_heads):
    b, L, d = x.shape
    dh = d // n_heads

    def heads(name):
        y = linear(x, p[name]["kernel"], p[name]["bias"])
        return y.reshape(b, L, n_heads, dh).transpose(0, 2, 1, 3)

    q, k, v = heads("query"), heads("key"), heads("value")
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    if mask is not None:
        scores = scores + (1 - mask[:, None, None, :]) * -10000.0
    probs = softmax(scores, axis=-1)
    ctx = np.einsum("bhqk,bhkd->bhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, d)
    out = linear(ctx, p["out"]["kernel"], p["out"]["bias"])
    return layer_norm(out + x, p["out_norm"]["scale"], p["out_norm"]["bias"])


def encode_query_oracle(branch, feat, mask, n_heads):
    x = input_proj_oracle(branch["query_input_proj"], feat)
    x = pos_embed_oracle(branch["query_pos_embed"], x)
    x = attention_oracle(branch["query_encoder"], x, mask, n_heads)
    att = linear(x, branch["modular_vector_mapping"]["kernel"])
    att = softmax(mask_logits(att, mask[:, :, None]), axis=1)
    return np.einsum("blm,bld->bmd", att, x)[:, 0, :]


def encode_context_oracle(branch, feat, mask, n_heads):
    x = input_proj_oracle(branch["visual_input_proj"], feat)
    x = pos_embed_oracle(branch["visual_pos_embed"], x)
    x = attention_oracle(branch["visual_encoder"], x, mask, n_heads)
    return linear(x, branch["out_mapping_linear"]["kernel"],
                  branch["out_mapping_linear"]["bias"])
