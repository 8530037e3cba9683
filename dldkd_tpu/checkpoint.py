"""Checkpointing: full training state, not weights-only.

The reference saves {state_dict, pickled model_cfg, epoch} for the best
validation SumR and cannot truly resume (no optimizer state;
train.py:231-235, SURVEY.md S5.4). Here a checkpoint carries params +
optimizer state + epoch + best score + RNG key, serialized with flax
msgpack next to a model_cfg.json, so both best-model eval and exact
mid-training resume work.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from dldkd_tpu.config import ModelConfig

CKPT_NAME = "model.ckpt"
CFG_NAME = "model_cfg.json"


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any],
                    model_cfg: ModelConfig) -> str:
    """state: {'params', 'opt_state', 'epoch', 'best_score', 'rng'}."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, CKPT_NAME)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)  # atomic: never leave a torn checkpoint
    with open(os.path.join(ckpt_dir, CFG_NAME), "w") as f:
        json.dump(vars(model_cfg) if not hasattr(model_cfg, "__dataclass_fields__")
                  else {k: getattr(model_cfg, k)
                        for k in model_cfg.__dataclass_fields__}, f, indent=2)
    return path


def load_model_cfg(ckpt_dir: str) -> ModelConfig:
    with open(os.path.join(ckpt_dir, CFG_NAME)) as f:
        return ModelConfig(**json.load(f))


def restore_checkpoint(ckpt_dir: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """target: a template state tree with matching structure/shapes."""
    with open(os.path.join(ckpt_dir, CKPT_NAME), "rb") as f:
        return serialization.from_bytes(target, f.read())


def restore_params_only(ckpt_dir: str, params_template) -> Tuple[Any, int]:
    """Restore just the params (for eval). Returns (params, epoch)."""
    with open(os.path.join(ckpt_dir, CKPT_NAME), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(params_template, raw["params"])
    return params, int(raw.get("epoch", -1))
