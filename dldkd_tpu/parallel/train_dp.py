"""Data-parallel training over a device mesh.

Parameters + optimizer state are replicated; each device encodes its shard
of videos/queries. The batch-coupled losses (NCE denominators, triplet
negatives) need the full score matrix, so XLA all-gathers one operand of
the (Nq, D) x (Nv, L, D) similarity einsum over ICI and psums the gradient
— the semantics are EXACTLY the single-device loss, unlike torch
DataParallel's per-replica losses.

Semantic note: gradients here equal the global-batch gradient; the
reference multi-GPU path averages per-shard losses computed on score
sub-matrices, which is a different (weaker) objective. We keep global
semantics — parity configs all run single-device anyway
(do_tvr.sh passes one device id).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
from jax.sharding import Mesh

from dldkd_tpu.parallel.mesh import batch_shardings, replicated
from dldkd_tpu.train import train_step_impl


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch onto the mesh with the standard shardings.
    Leading dims must divide the mesh size (the pipeline's bsz and
    query_pad_multiple guarantee this when both are multiples of
    len(mesh.devices))."""
    shardings = batch_shardings(mesh)
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}


def make_dp_train_step(model, mcfg, tcfg, optimizer, mesh: Mesh):
    """Jitted train step with explicit replicated/sharded layouts."""
    rep = replicated(mesh)
    bshard = batch_shardings(mesh)

    step = functools.partial(train_step_impl, model, mcfg, tcfg, optimizer)
    return jax.jit(
        step,
        in_shardings=(rep, rep, bshard, rep, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),   # params/opt_state update in place
    )
