"""The fused-feature generator group (reference model.py:1200-1294).

Three Transformer generators map each modality's utterance features into the
shared ``D_h``-dim fusion space:

- ``AcousticGenerator``: (L, B, 100) -> (L, B, D_h)
- ``VisualGenerator``:   (L, B, 512) -> (L, B, D_h)
- ``TextGenerator``:     (L, B, 100) -> (L, B, D_h)

Each is PE -> 8-layer post-norm Transformer encoder -> GELU -> dropout ->
two GELU/dropout MLP stages, with the reference's exact op order
(``gelu(dropout(fc(x)))`` — dropout inside the activation).

``valid_len`` masks attention keys at positions >= the batch's true max
length so fixed-bucket padding reproduces the reference's dynamic-shape
numerics (see nn/transformer.py). ``dtype`` selects the computation dtype
(bf16 for TPU throughput); parameters stay float32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn.core import TorchLinear, gelu
from ..nn.positional import PositionalEncoding
from ..nn.transformer import TransformerEncoder

# Bucket lengths may exceed the reference's 110-utterance PE table; padded
# positions beyond the true length are key-masked so the extended table rows
# never influence real outputs.
PE_MAX_LEN = 128


class _TransformerGenerator(nn.Module):
    """Shared generator skeleton: PE -> encoder -> gelu/dropout -> 2-stage MLP."""

    d_model: int
    nhead: int
    d_hidden: int
    d_out: int
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
        from ..ops.config import pallas_mlp_enabled

        fc1 = TorchLinear(self.d_hidden, name="fc1", dtype=self.dtype)
        fc2 = TorchLinear(self.d_out, name="fc2", dtype=self.dtype)
        from ..ops.mlp import fused_mlp_supported

        if pallas_mlp_enabled() and fused_mlp_supported(
            self.d_model, self.d_hidden, self.d_out, x.dtype
        ):
            # the whole head — gelu -> dropout -> fc1 -> dropout -> gelu ->
            # fc2 -> dropout -> gelu — as ONE VMEM kernel (ops/mlp.py; the
            # reference chain is model.py:1227-1230)
            import jax

            from ..ops.mlp import fused_mlp

            k1, b1 = fc1(x, return_params=True)
            k2, b2 = fc2(
                jnp.zeros((1, self.d_hidden), x.dtype), return_params=True
            )
            rate = 0.0 if deterministic else self.dropout
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            dtype = x.dtype
            return fused_mlp(
                x,
                k1.astype(dtype), b1.astype(dtype),
                k2.astype(dtype), b2.astype(dtype),
                pre=("gelu", rate),
                mid=("gelu", "drop_first", rate),
                post=("gelu", "drop_first", rate),
                dropout_seed=seed,
            )
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = gelu(nn.Dropout(self.dropout)(fc1(x), deterministic=deterministic))
        x = gelu(nn.Dropout(self.dropout)(fc2(x), deterministic=deterministic))
        return x


class AcousticGenerator(nn.Module):
    """(L, B, 100) -> (L, B, D_h). Reference model.py:1200-1231."""

    D_h: int
    dropout: float = 0.2
    num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, acoustic, valid_len=None, deterministic: bool = True):
        return _TransformerGenerator(
            d_model=100,
            nhead=10,
            d_hidden=512,
            d_out=self.D_h,
            dropout=self.dropout,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="net",
        )(acoustic, valid_len=valid_len, deterministic=deterministic)


class VisualGenerator(nn.Module):
    """(L, B, 512) -> (L, B, D_h). Reference model.py:1234-1263."""

    D_h: int
    dropout: float = 0.2
    num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, visual, valid_len=None, deterministic: bool = True):
        return _TransformerGenerator(
            d_model=512,
            nhead=8,
            d_hidden=1024,
            d_out=self.D_h,
            dropout=self.dropout,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="net",
        )(visual, valid_len=valid_len, deterministic=deterministic)


class TextGenerator(nn.Module):
    """(L, B, 100) -> (L, B, D_h). Reference model.py:1266-1294."""

    D_h: int
    dropout: float = 0.2
    num_layers: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, text, valid_len=None, deterministic: bool = True):
        return _TransformerGenerator(
            d_model=100,
            nhead=10,
            d_hidden=512,
            d_out=self.D_h,
            dropout=self.dropout,
            num_layers=self.num_layers,
            dtype=self.dtype,
            name="net",
        )(text, valid_len=valid_len, deterministic=deterministic)
