"""Sinusoidal positional encoding (reference model.py:1178-1197).

The table is a pure function of (max_len, d_model), computed at trace time and
folded into the compiled program as a constant — no buffers to carry around.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, 1, d_model) table: sin on even dims, cos on odd dims.

    Matches the reference exactly, including the odd-d_model case where the
    cos half is one column shorter.
    """
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, 1, d_model), dtype=np.float32)
    pe[:, 0, 0::2] = np.sin(position * div_term)
    pe[:, 0, 1::2] = np.cos(position * div_term)[:, : d_model // 2]
    return pe


class PositionalEncoding(nn.Module):
    """x (L, B, D) -> dropout(x + PE[:L])."""

    d_model: int
    dropout: float = 0.2
    max_len: int = 110
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        L = x.shape[0]
        if L > self.max_len:
            raise ValueError(f"sequence length {L} exceeds max_len {self.max_len}")
        pe = jnp.asarray(sinusoidal_table(self.max_len, self.d_model))
        x = x + pe[:L].astype(x.dtype)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
