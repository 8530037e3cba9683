"""Multi-host (multi-slice / DCN) runtime support.

The reference never goes beyond single-process torch DataParallel
(train.py:195-197; SURVEY.md S2.9/S5.8). The TPU-native story is the
standard JAX multi-controller model: every host runs the same program,
`jax.distributed.initialize()` wires the coordinator over DCN, the mesh
spans all global devices, and each host contributes its process-local
shard of every batch via `make_array_from_process_local_data` — the jitted
step is unchanged (XLA routes the gradient psum over ICI within a slice
and DCN across slices).

Single-process runs are the no-op fast path throughout, so this module is
exercised (as the no-op) by every test; the multi-process branch is
integration-tested by tests/test_multihost.py::test_two_process_dp_step,
which launches two local CPU processes under jax.distributed and checks
the DP step against the single-process result.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from dldkd_tpu.parallel.mesh import batch_shardings, replicated


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when launched multi-host.

    Explicit args win; otherwise the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU-pod environment that jax.distributed can auto-detect) trigger
    initialization. Returns True if the runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        # TPU-pod auto-detect: TPU_WORKER_HOSTNAMES lists every host of the
        # pod slice — >1 entries means a real multi-host launch and the
        # no-arg initialize() can self-configure. Single-entry values (set
        # even by single-chip tunneled environments) must NOT trigger init.
        hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
        if len(hosts) < 2:
            return False
        jax.distributed.initialize()
        return True
    kw = {"coordinator_address": coordinator}
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(num_processes or
                                  os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(process_id if process_id is not None
                               else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    return True


def process_slice(n: int) -> slice:
    """This host's contiguous share of a global leading axis of size n.
    n must divide evenly by the process count (the pipeline pads batch and
    query axes to multiples of the GLOBAL device count, which subsumes it).
    """
    pc, pi = jax.process_count(), jax.process_index()
    if n % pc:
        raise ValueError(f"axis {n} not divisible by {pc} processes")
    per = n // pc
    return slice(pi * per, (pi + 1) * per)


def replicate_multihost(tree, mesh: Mesh):
    """Replicate a host pytree onto every device of a (possibly
    multi-process) mesh. Single-process: plain device_put. Multi-process:
    a NamedSharding spans non-addressable devices, so each host donates its
    full copy via make_array_from_process_local_data (every host holds the
    same values — params/opt_state are built from the same seed)."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x), global_shape=np.shape(x)), tree)


def shard_batch_multihost(batch: Dict, mesh: Mesh) -> Dict:
    """Multi-host variant of parallel.train_dp.shard_batch: `batch` holds
    GLOBAL-shape numpy arrays (every host builds the same batch from the
    same packed dataset + epoch seed); each host donates only its slice."""
    if jax.process_count() == 1:
        from dldkd_tpu.parallel.train_dp import shard_batch

        return shard_batch(batch, mesh)
    shardings = batch_shardings(mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sl = process_slice(v.shape[0])
        out[k] = jax.make_array_from_process_local_data(
            shardings[k], v[sl], global_shape=v.shape)
    return out
