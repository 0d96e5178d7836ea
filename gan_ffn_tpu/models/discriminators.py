"""The feature discriminator group (reference model.py:1297-1397).

Each discriminator maps a (L, B, D_h) fusion-space sequence to per-utterance
real/fake probabilities (L, B, 1): PE -> 8-layer encoder -> GELU -> three
GELU/dropout FC stages (D_h -> 64 -> 16 -> 1) -> sigmoid.

``VisualDiscriminator`` additionally owns an ``object: Linear(512, 100)``
projection applied iff the input's last dim is 512 — the raw visual-feature
"real" path (reference model.py:1344,1355-1356).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from ..nn.core import TorchLinear, gelu
from ..nn.positional import PositionalEncoding
from ..nn.transformer import TransformerEncoder

from .generators import PE_MAX_LEN


class _TransformerDiscriminator(nn.Module):
    d_model: int
    nhead: int
    num_layers: int = 8
    dropout: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_len=None, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = PositionalEncoding(
            self.d_model, max_len=PE_MAX_LEN, name="position_encoding", dtype=self.dtype
        )(x, deterministic=deterministic)
        x = TransformerEncoder(
            self.d_model,
            self.nhead,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="transformer_encoder",
        )(x, valid_len=valid_len, deterministic=deterministic)
        x = gelu(x)
        x = TorchLinear(64, name="fc1", dtype=self.dtype)(x)
        x = gelu(nn.Dropout(self.dropout)(x, deterministic=deterministic))
        x = TorchLinear(16, name="fc2", dtype=self.dtype)(x)
        x = gelu(nn.Dropout(self.dropout)(x, deterministic=deterministic))
        x = TorchLinear(1, name="fc3", dtype=self.dtype)(x)
        x = jax.nn.sigmoid(nn.Dropout(self.dropout)(x, deterministic=deterministic))
        return x  # (L, B, 1)


class AcousticDiscriminator(nn.Module):
    """(L, B, D_h) -> (L, B, 1). Reference model.py:1297-1327."""

    D_h: int
    dropout: float = 0.2
    num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, fusion, valid_len=None, deterministic: bool = True):
        return _TransformerDiscriminator(
            d_model=self.D_h, nhead=10, dropout=self.dropout, num_layers=self.num_layers, dtype=self.dtype, name="net"
        )(fusion, valid_len=valid_len, deterministic=deterministic)


class VisualDiscriminator(nn.Module):
    """(L, B, 512 or D_h) -> (L, B, 1). Reference model.py:1330-1364.

    Raw 512-d visual input is projected to 100-d by the ``object`` linear
    first (the "real visual features" path).
    """

    D_h: int
    dropout: float = 0.2
    num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, fusion, valid_len=None, deterministic: bool = True):
        if fusion.shape[-1] == 512:
            fusion = TorchLinear(100, name="object", dtype=self.dtype)(fusion)
        return _TransformerDiscriminator(
            d_model=self.D_h, nhead=10, dropout=self.dropout, num_layers=self.num_layers, dtype=self.dtype, name="net"
        )(fusion, valid_len=valid_len, deterministic=deterministic)


class TextDiscriminator(nn.Module):
    """(L, B, D_h) -> (L, B, 1). Reference model.py:1367-1397."""

    D_h: int
    dropout: float = 0.2
    num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, fusion, valid_len=None, deterministic: bool = True):
        return _TransformerDiscriminator(
            d_model=self.D_h, nhead=10, dropout=self.dropout, num_layers=self.num_layers, dtype=self.dtype, name="net"
        )(fusion, valid_len=valid_len, deterministic=deterministic)
