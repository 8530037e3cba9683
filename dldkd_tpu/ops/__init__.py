from dldkd_tpu.ops.masking import mask_logits, l2_normalize
from dldkd_tpu.ops.similarity import (
    frame_similarity,
    clip_scores,
    clip_scores_unnormalized,
)
from dldkd_tpu.ops import losses

__all__ = [
    "mask_logits",
    "l2_normalize",
    "frame_similarity",
    "clip_scores",
    "clip_scores_unnormalized",
    "losses",
]
