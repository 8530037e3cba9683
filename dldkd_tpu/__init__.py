"""DL-DKD++ rebuilt as a TPU-native JAX/XLA/Pallas framework.

A brand-new implementation of the capabilities of HuiGuanLab/DL-DKD
("Dual Learning with Dynamic Knowledge Distillation for Partially Relevant
Video Retrieval", ICCV 2023 + journal ++ version): text-to-video retrieval
where a query describes only part of an untrimmed video. A two-branch
transformer student (inheritance branch distilled from a frozen CLIP teacher
+ exploration branch) consumes precomputed video/text features and is trained
with triplet + InfoNCE + dynamically-decayed KL-distillation losses.

Design stance (TPU-first, not a port):
  - fixed static shapes everywhere; masks carry truth
  - Flax modules, fully vectorized losses (no Python loops over batch rows)
  - jit-compiled train step; `jax.sharding.Mesh` data parallelism
  - corpus-sharded retrieval eval with on-device ranking
  - Pallas fused kernels for the (Nq, L, Nv) similarity hot op
"""

__version__ = "0.1.0"

from dldkd_tpu.config import Config, TrainConfig, ModelConfig  # noqa: F401


def __getattr__(name):
    """Lazy top-level conveniences (kept lazy so `import dldkd_tpu` stays
    light and never forces jax/flax initialization)."""
    if name == "DLDKD":
        from dldkd_tpu.models import DLDKD

        return DLDKD
    if name == "Retriever":
        from dldkd_tpu.serving import Retriever

        return Retriever
    if name == "eval_retrieval":
        from dldkd_tpu.evaluate import eval_retrieval

        return eval_retrieval
    raise AttributeError(f"module 'dldkd_tpu' has no attribute {name!r}")
