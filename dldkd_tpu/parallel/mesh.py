"""Device mesh construction + sharding specs.

The reference's only parallelism is single-process torch DataParallel
(train.py:195-197; SURVEY.md S2.9). The TPU-native equivalents:

  - training: batch data-parallelism over a 1-D mesh; parameters
    replicated, batch sharded on its leading axis; XLA's SPMD partitioner
    inserts the gradient all-reduce over ICI
  - retrieval eval: corpus videos sharded over the mesh, queries
    replicated; the (Nq, Nv) score matrix stays sharded on Nv and ranking
    reduces across shards with XLA collectives

Both paths are expressed purely with NamedSharding annotations — no manual
collectives; the computation follows the data layout.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def leading_axis(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Per-key shardings for a training batch: videos sharded over their
    batch axis, queries over the query axis, everything leading-dim."""
    lead = leading_axis(mesh)
    return {
        "student_videos": lead,
        "student_videos_mask": lead,
        "teacher_videos": lead,
        "student_text": lead,
        "student_text_mask": lead,
        "teacher_text": lead,
        "text_labels": lead,
    }
