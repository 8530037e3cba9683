"""Flax building blocks for the DLDKD towers.

Each module reproduces the math of its reference counterpart
(/root/reference/method/model_components.py) as idiomatic Flax:

  LinearInputProj            <- LinearLayer (model_components.py:294-312)
  TrainablePositionalEncoding<- (model_components.py:269-291)
  AttentionBlock             <- BertAttention = BertSelfAttention +
                                BertSelfOutput (model_components.py:339-450)
  FeedForward                <- BertIntermediate + BertOutput
                                (model_components.py:356-376)
  TransformerBlock           <- BertLayer (model_components.py:315-336);
                                unused by the shipped reference path but a
                                real architectural option it carries

Numerical parity notes: LayerNorm eps 1e-5 (torch default), attention mask
applied as additive (1-mask)*-10000 on the key axis, attention-prob dropout,
weight init normal(0, initializer_range) with zero biases
(reference model.py:80-93).

TPU notes: the whole block is a handful of (B*L, D) MXU matmuls at D=384,
L<=128 — XLA fuses the softmax/mask/dropout chain; shapes are static so a
single compiled program serves every batch.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype


def param_init(std: float):
    return nn.initializers.normal(stddev=std)


class LinearInputProj(nn.Module):
    """LayerNorm -> Dropout -> Dense -> ReLU input projection."""

    out_dim: int
    dropout: float
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="input_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, kernel_init=param_init(self.init_std),
                     dtype=self.dtype, name="proj")(x)
        return nn.relu(x)


class TrainablePositionalEncoding(nn.Module):
    """Learned position embedding + LayerNorm + Dropout."""

    max_len: int
    hidden: int
    dropout: float
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        pos = self.param("pos_embed", param_init(self.init_std),
                         (self.max_len, self.hidden))
        seq_len = x.shape[1]
        x = x + pos[None, :seq_len].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class AttentionBlock(nn.Module):
    """Single multi-head self-attention sublayer with residual LayerNorm.

    Note: like the reference encoder, this is attention-only — there is NO
    feed-forward sublayer (SURVEY.md S2.5: encoders are one BertAttention,
    not a full transformer block).
    """

    hidden: int
    n_heads: int
    attn_dropout: float
    hidden_dropout: float
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                      # (B, L, D)
        mask: Optional[jnp.ndarray] = None,  # (B, L) 1=valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.hidden % self.n_heads:
            raise ValueError(
                f"hidden {self.hidden} not divisible by n_heads {self.n_heads}")
        d_head = self.hidden // self.n_heads
        b, l, _ = x.shape

        def heads(name):
            y = nn.Dense(self.hidden, kernel_init=param_init(self.init_std),
                         dtype=self.dtype, name=name)(x)
            return y.reshape(b, l, self.n_heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = heads("query"), heads("key"), heads("value")
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(d_head)
        if mask is not None:
            # additive mask on the key axis: (1-mask)*-10000
            scores = scores + (1.0 - mask[:, None, None, :]) * -10000.0
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.attn_dropout)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, self.hidden)

        out = nn.Dense(self.hidden, kernel_init=param_init(self.init_std),
                       dtype=self.dtype, name="out")(ctx)
        out = nn.Dropout(self.hidden_dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(out + x)


class FeedForward(nn.Module):
    """ReLU FFN sublayer with residual LayerNorm.

    Reference BertIntermediate + BertOutput (model_components.py:356-376):
    Dense(intermediate) -> ReLU -> Dense(hidden) -> Dropout -> LN(x + input).
    """

    hidden: int
    intermediate: int
    dropout: float
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.intermediate, kernel_init=param_init(self.init_std),
                     dtype=self.dtype, name="intermediate")(x)
        h = nn.relu(h)
        h = nn.Dense(self.hidden, kernel_init=param_init(self.init_std),
                     dtype=self.dtype, name="output")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(h + x)


class TransformerBlock(nn.Module):
    """Full transformer block: (optional) self-attention + FFN.

    Reference BertLayer (model_components.py:315-336) — unused by the
    shipped DLDKD encoders (which are attention-only), provided for
    architectural parity. use_self_attention=False reproduces the
    reference's FFN-only mode.
    """

    hidden: int
    intermediate: int
    n_heads: int
    attn_dropout: float
    hidden_dropout: float
    use_self_attention: bool = True
    init_std: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.use_self_attention:
            x = AttentionBlock(
                self.hidden, self.n_heads, self.attn_dropout,
                self.hidden_dropout, init_std=self.init_std,
                dtype=self.dtype, name="attention")(x, mask, deterministic)
        return FeedForward(
            self.hidden, self.intermediate, self.hidden_dropout,
            init_std=self.init_std, dtype=self.dtype,
            name="ffn")(x, deterministic)
