"""Published-PyTorch-checkpoint converter.

Maps the reference's `model.ckpt` ({state_dict, model_cfg, epoch};
train.py:234-235) onto our flax parameter tree so released DL-DKD++
checkpoints can be evaluated with this framework (the BASELINE.json
"TVR val eval with released checkpoint" parity config).

Name mapping (reference module tree, model.py:13-77 -> ours):
  [exp_]query_pos_embed.position_embeddings.weight -> <branch>/query_pos_embed/pos_embed
  [exp_]query_pos_embed.LayerNorm.{weight,bias}    -> .../query_pos_embed/norm/{scale,bias}
  [exp_]query_input_proj.LayerNorm.*               -> .../query_input_proj/input_norm/*
  [exp_]query_input_proj.net.1.{weight,bias}       -> .../query_input_proj/proj/{kernel^T,bias}
  [exp_]query_encoder.self.{query,key,value}.*     -> .../query_encoder/{query,key,value}/{kernel^T,bias}
  [exp_]query_encoder.output.dense.*               -> .../query_encoder/out/{kernel^T,bias}
  [exp_]query_encoder.output.LayerNorm.*           -> .../query_encoder/out_norm/{scale,bias}
  [exp_]modular_vector_mapping.weight              -> .../modular_vector_mapping/kernel^T
  (visual_* identically for the video tower)
  [exp_]out_mapping_linear.*                       -> .../out_mapping_linear/{kernel^T,bias}
where <branch> = inheritance (no prefix) | exploration (exp_ prefix), and
torch Linear weights (out, in) transpose to flax kernels (in, out).
"""

from __future__ import annotations

import argparse
import sys
import types
from typing import Dict

import numpy as np


class _FakeEasyDict(dict):
    """Minimal easydict.EasyDict stand-in (attribute-style dict).
    Module-level so instances pickle (the reference torch.saves its
    model_cfg EasyDict inside model.ckpt, train.py:234-235)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _ensure_fake_easydict():
    """The reference pickles its model_cfg as an easydict.EasyDict inside
    the checkpoint; easydict isn't installed here, so register a minimal
    stand-in before torch.load unpickles it."""
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")
    _FakeEasyDict.__module__ = "easydict"
    _FakeEasyDict.__qualname__ = "EasyDict"
    mod.EasyDict = _FakeEasyDict
    sys.modules["easydict"] = mod


_TOWER_PARTS = ("query", "visual")


def _branch_tree(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Build one branch's flax subtree from reference-named tensors."""

    def t(name):
        return np.ascontiguousarray(sd[prefix + name])

    def lin(name):  # torch Linear -> flax Dense
        return {"kernel": t(f"{name}.weight").T, "bias": t(f"{name}.bias")}

    def ln(name):
        return {"scale": t(f"{name}.weight"), "bias": t(f"{name}.bias")}

    out: Dict = {}
    for part in _TOWER_PARTS:
        out[f"{part}_pos_embed"] = {
            "pos_embed": t(f"{part}_pos_embed.position_embeddings.weight"),
            "norm": ln(f"{part}_pos_embed.LayerNorm"),
        }
        out[f"{part}_input_proj"] = {
            "input_norm": ln(f"{part}_input_proj.LayerNorm"),
            "proj": lin(f"{part}_input_proj.net.1"),
        }
        out[f"{part}_encoder"] = {
            "query": lin(f"{part}_encoder.self.query"),
            "key": lin(f"{part}_encoder.self.key"),
            "value": lin(f"{part}_encoder.self.value"),
            "out": lin(f"{part}_encoder.output.dense"),
            "out_norm": ln(f"{part}_encoder.output.LayerNorm"),
        }
    out["modular_vector_mapping"] = {
        "kernel": t("modular_vector_mapping.weight").T}
    out["out_mapping_linear"] = lin("out_mapping_linear")
    return out


def torch_state_dict_to_flax(sd: Dict[str, np.ndarray],
                             double_branch: bool) -> Dict:
    """Reference state_dict (tensor name -> np.ndarray) -> flax params."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}  # DataParallel
    tree = {"inheritance": _branch_tree(sd, "")}
    if double_branch:
        tree["exploration"] = _branch_tree(sd, "exp_")
    return {"params": tree}


def flax_to_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (used by tests to validate the converter round-trip
    and to export checkpoints back to the reference format)."""
    out: Dict[str, np.ndarray] = {}
    tree = params["params"]

    def put_branch(branch: Dict, prefix: str):
        for part in _TOWER_PARTS:
            pe = branch[f"{part}_pos_embed"]
            out[f"{prefix}{part}_pos_embed.position_embeddings.weight"] = \
                np.asarray(pe["pos_embed"])
            out[f"{prefix}{part}_pos_embed.LayerNorm.weight"] = np.asarray(pe["norm"]["scale"])
            out[f"{prefix}{part}_pos_embed.LayerNorm.bias"] = np.asarray(pe["norm"]["bias"])
            ip = branch[f"{part}_input_proj"]
            out[f"{prefix}{part}_input_proj.LayerNorm.weight"] = np.asarray(ip["input_norm"]["scale"])
            out[f"{prefix}{part}_input_proj.LayerNorm.bias"] = np.asarray(ip["input_norm"]["bias"])
            out[f"{prefix}{part}_input_proj.net.1.weight"] = np.asarray(ip["proj"]["kernel"]).T
            out[f"{prefix}{part}_input_proj.net.1.bias"] = np.asarray(ip["proj"]["bias"])
            enc = branch[f"{part}_encoder"]
            for name, ours in (("self.query", "query"), ("self.key", "key"),
                               ("self.value", "value"), ("output.dense", "out")):
                out[f"{prefix}{part}_encoder.{name}.weight"] = np.asarray(enc[ours]["kernel"]).T
                out[f"{prefix}{part}_encoder.{name}.bias"] = np.asarray(enc[ours]["bias"])
            out[f"{prefix}{part}_encoder.output.LayerNorm.weight"] = np.asarray(enc["out_norm"]["scale"])
            out[f"{prefix}{part}_encoder.output.LayerNorm.bias"] = np.asarray(enc["out_norm"]["bias"])
        out[f"{prefix}modular_vector_mapping.weight"] = \
            np.asarray(branch["modular_vector_mapping"]["kernel"]).T
        out[f"{prefix}out_mapping_linear.weight"] = \
            np.asarray(branch["out_mapping_linear"]["kernel"]).T
        out[f"{prefix}out_mapping_linear.bias"] = \
            np.asarray(branch["out_mapping_linear"]["bias"])

    put_branch(tree["inheritance"], "")
    if "exploration" in tree:
        put_branch(tree["exploration"], "exp_")
    return out


def convert_torch_checkpoint(torch_ckpt_path: str, out_dir: str,
                             label_style: str = "soft") -> str:
    """Load a reference model.ckpt and write our checkpoint dir."""
    _ensure_fake_easydict()
    import torch

    from dldkd_tpu import checkpoint as ckpt_lib
    from dldkd_tpu.config import ModelConfig

    ckpt = torch.load(torch_ckpt_path, map_location="cpu", weights_only=False)
    # strip the DataParallel prefix up front so config inference below sees
    # canonical names (reference train.py:197 wraps in DataParallel)
    sd = {k.removeprefix("module."): v.numpy()
          for k, v in ckpt["model"].items()}
    cfg_src = dict(ckpt.get("model_cfg", {}))
    double = any(k.startswith("exp_") for k in sd)
    params = torch_state_dict_to_flax(sd, double)

    w = sd.get("visual_input_proj.net.1.weight")
    q = sd.get("query_input_proj.net.1.weight")
    pos_q = sd.get("query_pos_embed.position_embeddings.weight")
    pos_v = sd.get("visual_pos_embed.position_embeddings.weight")
    mcfg = ModelConfig(
        visual_input_size=int(cfg_src.get("visual_input_size", w.shape[1])),
        query_input_size=int(cfg_src.get("query_input_size", q.shape[1])),
        inheritance_hidden=int(cfg_src.get("inheritance_hidden", w.shape[0])),
        exploration_hidden=int(cfg_src.get("exploration_hidden", w.shape[0])),
        max_ctx_l=int(cfg_src.get("max_ctx_l", pos_v.shape[0])),
        max_desc_l=int(cfg_src.get("max_desc_l", pos_q.shape[0])),
        n_heads=int(cfg_src.get("n_heads", 4)),
        input_drop=float(cfg_src.get("input_drop", 0.1)),
        drop=float(cfg_src.get("drop", 0.1)),
        initializer_range=float(cfg_src.get("initializer_range", 0.02)),
        margin=float(cfg_src.get("margin", 0.2)),
        hard_pool_size=int(cfg_src.get("hard_pool_size", 20)),
        double_branch=double,
        label_style=label_style,
    )
    import jax.numpy as jnp
    params = {"params": __import__("jax").tree.map(jnp.asarray,
                                                   params["params"])}
    ckpt_lib.save_checkpoint(out_dir, {
        "params": params, "opt_state": {},
        "epoch": int(ckpt.get("epoch", -1)), "best_score": 0.0,
        "rng": np.zeros(2, np.uint32),
    }, mcfg)
    return out_dir


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--label_style", default="soft")
    args = p.parse_args(argv)
    out = convert_torch_checkpoint(args.torch_ckpt, args.out_dir,
                                   args.label_style)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
