from dldkd_tpu.parallel.mesh import (
    make_mesh,
    batch_shardings,
    replicated,
)
from dldkd_tpu.parallel.train_dp import make_dp_train_step, shard_batch
from dldkd_tpu.parallel.eval_shard import (
    eval_retrieval_sharded,
    eval_retrieval_sharded_streaming,
)
from dldkd_tpu.parallel.multihost import (
    maybe_initialize_distributed,
    shard_batch_multihost,
)

__all__ = [
    "make_mesh",
    "batch_shardings",
    "replicated",
    "make_dp_train_step",
    "shard_batch",
    "eval_retrieval_sharded",
    "eval_retrieval_sharded_streaming",
    "maybe_initialize_distributed",
    "shard_batch_multihost",
]
