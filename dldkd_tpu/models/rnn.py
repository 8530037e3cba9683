"""Variable-length RNN encoder + time pooling.

Port of the reference's `utils/model_utils.py` `RNNEncoder` /
`pool_across_time` (model_utils.py:10-88) — shipped with the codebase but
unused by the DL-DKD training path; kept as a real architectural option.

TPU-native design: the reference sorts the batch by length and uses
pack_padded_sequence (model_utils.py:36-57) because cuDNN RNNs want packed
input. On TPU none of that applies — shapes stay static and `seq_lengths`
masking (flax.linen.RNN) freezes each row's carry once past its true
length, which is mathematically identical to packing: outputs beyond a
row's length are zeroed, and the returned hidden state is the one at the
row's last valid step. No sorting, no re-permutation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

_CELLS = {
    "lstm": nn.OptimizedLSTMCell,
    "gru": nn.GRUCell,
    "rnn": nn.SimpleCell,
}


class RNNEncoder(nn.Module):
    """LSTM/GRU/RNN over padded (B, T, D) batches with per-row lengths.

    Returns (outputs, hidden):
      outputs: (B, T, n_dirs * H) — zero past each row's length — or None
               when return_outputs=False;
      hidden:  (B, n_dirs * H) last-layer final state per direction
               (LSTM: the h vector) or None when return_hidden=False.
    Matches reference RNNEncoder's contract (model_utils.py:46-73).
    """

    hidden_size: int
    bidirectional: bool = True
    dropout_p: float = 0.0      # between layers, only when n_layers >= 2
    n_layers: int = 1
    rnn_type: str = "lstm"
    return_hidden: bool = True
    return_outputs: bool = True
    allow_zero: bool = False    # zero-length rows are treated as length 1

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        if self.rnn_type not in _CELLS:
            raise ValueError(f"rnn_type must be one of {sorted(_CELLS)}")
        lengths = lengths.astype(jnp.int32)
        if self.allow_zero:  # reference sort_batch zero->one rewrite
            lengths = jnp.maximum(lengths, 1)

        x = inputs
        carries = []
        for layer in range(self.n_layers):
            directions = []
            dir_carries = []
            for reverse in ([False, True] if self.bidirectional
                            else [False]):
                cell = _CELLS[self.rnn_type](features=self.hidden_size,
                                             name=f"l{layer}_"
                                                  f"{'bwd' if reverse else 'fwd'}")
                carry, outs = nn.RNN(cell, return_carry=True)(
                    x, seq_lengths=lengths, reverse=reverse,
                    keep_order=True)
                # LSTM carry is (c, h); the reference keeps h
                # (model_utils.py:66-67)
                h = carry[1] if self.rnn_type == "lstm" else carry
                directions.append(outs)
                dir_carries.append(h)
            x = jnp.concatenate(directions, axis=-1)
            carries = dir_carries
            if self.dropout_p > 0 and layer + 1 < self.n_layers:
                x = nn.Dropout(rate=self.dropout_p)(
                    x, deterministic=deterministic)

        # zero the outputs past each row's length (pad_packed_sequence
        # semantics; flax freezes the carry but repeats the last output)
        t = jnp.arange(x.shape[1])
        valid = (t[None, :] < lengths[:, None]).astype(x.dtype)
        outputs = x * valid[:, :, None] if self.return_outputs else None
        hidden = (jnp.concatenate(carries, axis=-1)
                  if self.return_hidden else None)
        return outputs, hidden


def pool_across_time(outputs: jnp.ndarray, lengths: jnp.ndarray,
                     pool_type: str = "max") -> jnp.ndarray:
    """Masked max/mean over the time axis of (B, T, D) given per-row
    lengths. Reference pool_across_time (model_utils.py:76-88), vectorized
    over its per-row python loop.

    Zero-length rows: the reference raises (torch max over an empty
    slice); a traced computation cannot raise on data, so such rows come
    back as -inf (max) / NaN (mean) — poison values that --debug_nans or
    any finiteness check traps instead of silently flowing onward."""
    lengths = lengths.astype(jnp.int32)
    t = jnp.arange(outputs.shape[1])
    valid = t[None, :] < lengths[:, None]                 # (B, T)
    if pool_type == "max":
        masked = jnp.where(valid[:, :, None], outputs, -jnp.inf)
        return jnp.max(masked, axis=1)
    if pool_type == "mean":
        s = jnp.sum(outputs * valid[:, :, None].astype(outputs.dtype),
                    axis=1)
        # 0/0 -> NaN poison for zero-length rows, exact mean otherwise
        return s / lengths[:, None].astype(outputs.dtype)
    raise NotImplementedError("Only support mean and max pooling")
