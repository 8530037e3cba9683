"""Retrieval metrics, computed on device.

The reference ranks with a per-query numpy argsort loop
(eval.py:59-111). Rank-of-ground-truth doesn't need a sort: it is
1 + #{videos scoring strictly higher} (+ index tie-break), one comparison
matrix op on the (Nq, Nv) score matrix. Ties are broken by corpus index,
matching a stable descending sort. Exact float ties are rare on f32/bf16
scores but COMMON on the int8-quantized serving grid (score_quant), where
near-duplicate videos collapse to equal scores: the index tie-break keeps
int8 metrics deterministic, and rank-exact results on near-tie corpora
come from the serving path's two-stage f32 rescore
(serving._two_stage_topk, tests/test_rescore.py).

Metrics reproduced (eval.py:59-111, 223-234): R@1/5/10/100, SumR, MedR,
MeanR, mAP (single-GT AP = 1/rank, the t2v_map case).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def rank_of_gt(scores: jnp.ndarray, gt_idx: jnp.ndarray) -> jnp.ndarray:
    """ranks (Nq,) int32, 1-based.

    scores: (Nq, Nv) similarity (higher = better); gt_idx: (Nq,) int32.
    """
    nq, nv = scores.shape
    gt_score = jnp.take_along_axis(scores, gt_idx[:, None], axis=1)  # (Nq,1)
    higher = jnp.sum((scores > gt_score).astype(jnp.int32), axis=1)
    col = jnp.arange(nv)[None, :]
    tie_before = jnp.sum(((scores == gt_score) & (col < gt_idx[:, None])).astype(jnp.int32), axis=1)
    return higher + tie_before + 1


def metrics_from_ranks(ranks: np.ndarray,
                       ks: Sequence[int] = (1, 5, 10, 100)) -> Dict[str, float]:
    ranks = np.asarray(ranks)
    n = len(ranks)
    out: Dict[str, float] = {}
    for k in ks:
        out[f"r{k}"] = 100.0 * float((ranks <= k).sum()) / n
    out["sumr"] = float(sum(out[f"r{k}"] for k in ks))
    out["medr"] = float(np.median(ranks))
    out["meanr"] = float(ranks.mean())
    out["map"] = float(np.mean(1.0 / ranks))
    return out


def t2v_metrics(scores: jnp.ndarray, gt_idx: jnp.ndarray) -> Dict[str, float]:
    """Full text-to-video metric set from a score matrix."""
    ranks = np.asarray(rank_of_gt(scores, gt_idx))
    return metrics_from_ranks(ranks)


def build_gt_indices(query_video_ids: Sequence[str],
                     corpus_video_ids: Sequence[str]) -> np.ndarray:
    """Map each query's video id to its corpus row (reference get_gt
    prefix-matching, eval.py:43-57; our query_video_ids are already the
    '#'-prefix of the cap id)."""
    row = {v: i for i, v in enumerate(corpus_video_ids)}
    return np.asarray([row[v] for v in query_video_ids], np.int32)
