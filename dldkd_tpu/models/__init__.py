from dldkd_tpu.models.dldkd import DLDKD, Branch
from dldkd_tpu.models.components import (
    LinearInputProj,
    TrainablePositionalEncoding,
    AttentionBlock,
)

__all__ = [
    "DLDKD",
    "Branch",
    "LinearInputProj",
    "TrainablePositionalEncoding",
    "AttentionBlock",
]
