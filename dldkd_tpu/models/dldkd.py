"""The DLDKD dual-branch retrieval model.

Reproduces the architecture of reference `DLDKD` (method/model.py:13-258):
per branch ("inheritance" always; "exploration" when double_branch), a query
tower (input proj -> learned pos-enc -> one attention block -> softmax
pooling to a single vector) and a video tower (same shape, separate weights,
plus an output linear). The frozen CLIP teacher has no parameters at runtime
— its precomputed features enter the loss directly.

Unlike the reference, loss assembly lives outside the module
(dldkd_tpu.models.objective) so the module stays a pure encoder and the
train step can thread RNG / decay scalars explicitly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dldkd_tpu.config import ModelConfig
from dldkd_tpu.models.components import (
    AttentionBlock,
    LinearInputProj,
    TrainablePositionalEncoding,
    param_init,
)
from dldkd_tpu.ops.masking import mask_logits


class Branch(nn.Module):
    """One student branch: query tower + video tower."""

    hidden: int
    max_desc_l: int
    max_ctx_l: int
    n_heads: int
    input_drop: float
    drop: float
    init_std: float = 0.02
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(init_std=self.init_std, dtype=self.dtype)
        self.query_input_proj = LinearInputProj(self.hidden, self.input_drop, **kw)
        self.query_pos_embed = TrainablePositionalEncoding(
            self.max_desc_l, self.hidden, self.input_drop, **kw)
        self.query_encoder = AttentionBlock(
            self.hidden, self.n_heads, self.drop, self.drop, **kw)
        self.modular_vector_mapping = nn.Dense(
            1, use_bias=False, kernel_init=param_init(self.init_std),
            dtype=self.dtype)

        self.visual_input_proj = LinearInputProj(self.hidden, self.input_drop, **kw)
        self.visual_pos_embed = TrainablePositionalEncoding(
            self.max_ctx_l, self.hidden, self.input_drop, **kw)
        self.visual_encoder = AttentionBlock(
            self.hidden, self.n_heads, self.drop, self.drop, **kw)
        self.out_mapping_linear = nn.Dense(
            self.hidden, kernel_init=param_init(self.init_std), dtype=self.dtype)

    def encode_query(self, feat, mask, deterministic: bool = True):
        """(Nq, Lq, Dq), (Nq, Lq) -> pooled (Nq, hidden).

        Reference encode_query + get_modularized_queries (model.py:199-258):
        encode tokens, then softmax-pool with a learned 1-d attention head.
        """
        x = self.query_input_proj(feat, deterministic)
        x = self.query_pos_embed(x, deterministic)
        x = self.query_encoder(x, mask, deterministic)
        att = self.modular_vector_mapping(x)                       # (Nq, Lq, 1)
        att = nn.softmax(mask_logits(att, mask[:, :, None]), axis=1)
        return jnp.einsum("blm,bld->bmd", att, x)[:, 0, :]          # (Nq, D)

    def encode_context(self, feat, mask, deterministic: bool = True):
        """(Nv, Lv, Dv), (Nv, Lv) -> frame features (Nv, Lv, hidden).

        Reference encode_context (model.py:215-227) incl. out_mapping_linear.
        """
        x = self.visual_input_proj(feat, deterministic)
        x = self.visual_pos_embed(x, deterministic)
        x = self.visual_encoder(x, mask, deterministic)
        return self.out_mapping_linear(x)


class DLDKD(nn.Module):
    """Dual-branch student. Teacher features are inputs, never parameters."""

    config: ModelConfig

    def setup(self):
        c = self.config
        dtype = jnp.dtype(c.dtype)
        self.inheritance = Branch(
            hidden=c.inheritance_hidden, max_desc_l=c.max_desc_l,
            max_ctx_l=c.max_ctx_l, n_heads=c.n_heads,
            input_drop=c.input_drop, drop=c.drop,
            init_std=c.initializer_range, dtype=dtype)
        if c.double_branch:
            self.exploration = Branch(
                hidden=c.exploration_hidden, max_desc_l=c.max_desc_l,
                max_ctx_l=c.max_ctx_l, n_heads=c.n_heads,
                input_drop=c.input_drop, drop=c.drop,
                init_std=c.initializer_range, dtype=dtype)

    def encode_query(
        self, feat, mask, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        inher = self.inheritance.encode_query(feat, mask, deterministic)
        if self.config.double_branch:
            return inher, self.exploration.encode_query(feat, mask, deterministic)
        return inher, None

    def encode_context(
        self, feat, mask, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        inher = self.inheritance.encode_context(feat, mask, deterministic)
        if self.config.double_branch:
            return inher, self.exploration.encode_context(feat, mask, deterministic)
        return inher, None

    def __call__(self, video_feat, video_mask, query_feat, query_mask,
                 deterministic: bool = True):
        """Init/trace entry: encodes both modalities through both branches."""
        ctx = self.encode_context(video_feat, video_mask, deterministic)
        qry = self.encode_query(query_feat, query_mask, deterministic)
        return ctx, qry
