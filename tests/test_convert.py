"""Checkpoint converter round-trip: flax -> reference state_dict format ->
torch .ckpt -> converted back -> identical params and model outputs."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from dldkd_tpu import checkpoint as ckpt_lib
from dldkd_tpu.config import ModelConfig
from dldkd_tpu.convert import (
    convert_torch_checkpoint,
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)
from dldkd_tpu.models import DLDKD

MCFG = ModelConfig(visual_input_size=20, query_input_size=12,
                   inheritance_hidden=16, exploration_hidden=16,
                   max_ctx_l=10, max_desc_l=6, n_heads=2,
                   double_branch=True)


def make_params():
    model = DLDKD(config=MCFG)
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.randn(2, 10, 20).astype(np.float32)),
        jnp.ones((2, 10), jnp.float32),
        jnp.asarray(rng.randn(3, 6, 12).astype(np.float32)),
        jnp.ones((3, 6), jnp.float32))
    return model, params


def test_name_mapping_roundtrip():
    _, params = make_params()
    sd = flax_to_torch_state_dict(params)
    # every reference name family present
    for key in ("query_pos_embed.position_embeddings.weight",
                "visual_input_proj.net.1.weight",
                "query_encoder.self.key.bias",
                "visual_encoder.output.LayerNorm.weight",
                "modular_vector_mapping.weight",
                "out_mapping_linear.bias",
                "exp_query_encoder.self.query.weight"):
        assert key in sd, key
    back = torch_state_dict_to_flax(sd, double_branch=True)
    flat_a = jax.tree_util.tree_leaves_with_path(params["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    # compare path-by-path
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))


def test_full_torch_ckpt_conversion(tmp_path):
    import torch

    model, params = make_params()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(params).items()}
    # reference checkpoint layout: {"model": sd, "model_cfg": ..., "epoch": N}
    torch_path = str(tmp_path / "model.ckpt")
    torch.save({"model": sd, "model_cfg": {"max_ctx_l": 10, "max_desc_l": 6,
                                           "n_heads": 2},
                "epoch": 7}, torch_path)

    out_dir = str(tmp_path / "converted")
    convert_torch_checkpoint(torch_path, out_dir, label_style="soft")

    mcfg = ckpt_lib.load_model_cfg(out_dir)
    assert mcfg.double_branch is True
    assert mcfg.max_ctx_l == 10 and mcfg.n_heads == 2
    assert mcfg.inheritance_hidden == 16
    restored, epoch = ckpt_lib.restore_params_only(out_dir, params)
    assert epoch == 7

    # identical model outputs from restored params
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.randn(2, 10, 20).astype(np.float32))
    vmask = jnp.ones((2, 10), jnp.float32)
    text = jnp.asarray(rng.randn(3, 6, 12).astype(np.float32))
    tmask = jnp.ones((3, 6), jnp.float32)
    (c1, e1), (q1, x1) = model.apply(params, video, vmask, text, tmask,
                                     deterministic=True)
    (c2, e2), (q2, x2) = model.apply(restored, video, vmask, text, tmask,
                                     deterministic=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_dataparallel_prefix_stripped():
    _, params = make_params()
    sd = {f"module.{k}": v for k, v in flax_to_torch_state_dict(params).items()}
    back = torch_state_dict_to_flax(sd, double_branch=True)
    assert "inheritance" in back["params"]


def test_full_conversion_of_dataparallel_ckpt(tmp_path):
    """End-to-end convert of a 'module.'-prefixed checkpoint: the config
    inference must see stripped names (regression — it used to crash)."""
    import torch

    _, params = make_params()
    sd = {f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch_state_dict(params).items()}
    torch_path = str(tmp_path / "model.ckpt")
    torch.save({"model": sd, "model_cfg": {}, "epoch": 3}, torch_path)
    out_dir = str(tmp_path / "converted")
    convert_torch_checkpoint(torch_path, out_dir)
    mcfg = ckpt_lib.load_model_cfg(out_dir)
    assert mcfg.double_branch is True
