from dldkd_tpu.ops.pallas.sim_max import fused_clip_scores

__all__ = ["fused_clip_scores"]
