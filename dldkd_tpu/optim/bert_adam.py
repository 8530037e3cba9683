"""BertAdam as an optax GradientTransformation.

Reproduces reference `BertAdam` (method/optimization.py:223-343) exactly —
these semantics are parity-critical for training curves (SURVEY.md S2.8):

  1. per-PARAMETER grad-norm clip to max_grad_norm inside the step
     (torch clip_grad_norm_ on each tensor, coef = max/(norm + 1e-6))
  2. m <- b1*m + (1-b1)*g ; v <- b2*v + (1-b2)*g^2   (NO bias correction)
  3. update = m / (sqrt(v) + eps) + weight_decay * p   (decoupled wd,
     excluded for biases and LayerNorm params)
  4. p <- p - lr * schedule(step) * update, where `step` is the count of
     PREVIOUS updates (first step uses schedule(0), i.e. LR 0 under warmup)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class BertAdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar, number of completed updates
    m: optax.Params
    v: optax.Params


def default_wd_mask(params) -> optax.Params:
    """True = apply weight decay. Excludes every `bias` leaf and all
    LayerNorm parameters, mirroring the reference's no_decay name filter
    ["bias", "LayerNorm.bias", "LayerNorm.weight"] (method/train.py:204-207).
    In our module tree LayerNorms live under names ending in `norm`."""

    def mask_fn(path, _leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[-1] == "bias":
            return False
        if any(str(k).endswith("norm") for k in keys):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def bert_adam(
    lr: float,
    schedule_fn: Optional[Callable] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    wd_mask: Optional[optax.Params] = None,
) -> optax.GradientTransformation:
    """schedule_fn: step -> LR multiplier (see optim.schedules); None = 1.
    wd_mask: pytree of bools matching params; None = decay everything."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros,
                             v=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        if params is None:
            raise ValueError("bert_adam requires params")

        def clip(g):
            if max_grad_norm <= 0:
                return g
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            coef = jnp.minimum(max_grad_norm / (norm + 1e-6), 1.0)
            return g * coef

        grads = jax.tree.map(clip, grads)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state.v, grads)

        mult = schedule_fn(state.step) if schedule_fn is not None else 1.0
        scale = lr * mult

        if wd_mask is not None:
            upd = jax.tree.map(
                lambda m_, v_, p, use_wd: -scale * (
                    m_ / (jnp.sqrt(v_) + eps)
                    + jnp.where(use_wd, weight_decay, 0.0) * p),
                m, v, params, wd_mask)
        else:
            upd = jax.tree.map(
                lambda m_, v_, p: -scale * (m_ / (jnp.sqrt(v_) + eps)
                                            + weight_decay * p),
                m, v, params)
        return upd, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init, update)
