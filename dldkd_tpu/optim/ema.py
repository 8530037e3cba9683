"""Parameter EMA (reference optimization.py:187-220, unused by the shipped
train path but part of the optimizer toolkit).

Functional, jit-friendly form: the shadow is a params-shaped pytree carried
alongside the optimizer state; swap/restore are pure tree exchanges (the
reference mutates module parameters in place)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """Shadow initialised to a copy of the parameters."""
    return jax.tree.map(jnp.asarray, params)


def ema_update(shadow, params, step, decay: float = 0.999):
    """shadow <- (1-d)*params + d*shadow with the reference's warm-started
    decay d = min(decay, (1+step)/(10+step)) (optimization.py:199-206)."""
    step = jnp.asarray(step, jnp.float32)
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(lambda s, p: (1.0 - d) * p + d * s, shadow, params)


def ema_swap(shadow, params):
    """(eval_params, saved_params): use the shadow for eval, keep the live
    params to restore afterwards (reference assign/resume,
    optimization.py:208-220)."""
    return shadow, params
