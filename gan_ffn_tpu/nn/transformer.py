"""Post-norm Transformer encoder matching ``torch.nn.TransformerEncoder``.

The reference builds all six GAN networks from
``nn.TransformerEncoderLayer(d_model, nhead)`` with torch defaults
(dim_feedforward=2048, dropout=0.1, activation=relu, post-norm) stacked 8 deep
(model.py:1203-1206 etc.), applied WITHOUT any attention mask — every position
up to the batch's padded length attends to every other.

Because this framework pads to fixed bucket lengths (longer than the batch's
true max), an optional ``valid_len`` scalar masks attention *keys* at
positions >= the batch's true max utterance count. With
``valid_len == batch max length`` this reproduces the reference's semantics
exactly (reference padding rows below the batch max are zero vectors + PE and
ARE attended — ours too), while bucket-only padding rows are excluded.

All sequence work is batched: attention is one einsum chain over
(B, H, L, Dh) — no per-timestep Python loops anywhere.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .core import LayerNorm, TorchLinear, xavier_uniform_init

NEG_INF = -1e30


class MultiheadSelfAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` (self-attention, batch_first=False).

    Input (L, B, E). Packed qkv projection (xavier-uniform, zero bias, as in
    torch's ``_reset_parameters``), scaled dot-product softmax over the key
    axis, attention-weight dropout, output projection.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_len: Optional[jnp.ndarray] = None, deterministic: bool = True):
        L, B, E = x.shape
        assert E == self.embed_dim
        H = self.num_heads
        Dh = E // H
        assert Dh * H == E, "embed_dim must be divisible by num_heads"
        dtype = self.dtype or x.dtype

        in_kernel = self.param("in_proj_kernel", xavier_uniform_init, (E, 3 * E))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        qkv = jnp.dot(x.astype(dtype), in_kernel.astype(dtype)) + in_bias.astype(dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each (L, B, E)

        # (L, B, E) -> (B, H, L, Dh)
        def heads(t):
            return t.reshape(L, B, H, Dh).transpose(1, 2, 0, 3)

        q, k, v = heads(q), heads(k), heads(v)

        from ..ops.config import pallas_attention_enabled

        if pallas_attention_enabled() and L <= 128:
            from ..ops.attention import fused_attention

            if not deterministic and self.dropout > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
                rate = self.dropout
            else:
                seed, rate = None, 0.0
            out = fused_attention(
                q, k, v, valid_len=valid_len, dropout_rate=rate, dropout_seed=seed
            ).astype(dtype)
        else:
            scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, dtype=jnp.float32))
            # softmax in float32 for stability under bf16 compute
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if valid_len is not None:
                key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3)
                scores = jnp.where(key_pos < valid_len, scores, NEG_INF)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", attn.astype(dtype), v, preferred_element_type=jnp.float32
            ).astype(dtype)
        out = out.transpose(2, 0, 1, 3).reshape(L, B, E)
        out = TorchLinear(E, dtype=dtype, name="out_proj")(out)
        return out


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer, torch legacy semantics:

    x = norm1(x + dropout(attn(x)));  x = norm2(x + dropout(ff(x)))
    with ff = linear2(dropout(relu(linear1(x)))).
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_len=None, deterministic: bool = True):
        dtype = self.dtype or x.dtype
        attn_out = MultiheadSelfAttention(
            self.d_model, self.nhead, dropout=self.dropout, dtype=dtype, name="self_attn"
        )(x, valid_len=valid_len, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = LayerNorm(name="norm1", dtype=dtype)(x)

        from ..ops.config import pallas_mlp_enabled

        lin1 = TorchLinear(self.dim_feedforward, dtype=dtype, name="linear1")
        lin2 = TorchLinear(self.d_model, dtype=dtype, name="linear2")
        from ..ops.mlp import fused_mlp_supported

        if pallas_mlp_enabled() and fused_mlp_supported(
            self.d_model, self.dim_feedforward, self.d_model, dtype
        ):
            # one VMEM kernel for linear1 -> relu -> dropout -> linear2: the
            # (M, d_ff) intermediate never round-trips HBM (ops/mlp.py)
            from ..ops.mlp import fused_mlp

            k1, b1 = lin1(x, return_params=True)
            k2, b2 = lin2(
                jnp.zeros((1, self.dim_feedforward), dtype), return_params=True
            )
            rate = 0.0 if deterministic else self.dropout
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            h = fused_mlp(
                x.astype(dtype),
                k1.astype(dtype), b1.astype(dtype),
                k2.astype(dtype), b2.astype(dtype),
                mid=("relu", "act_first", rate), dropout_seed=seed,
            )
        else:
            h = lin1(x)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = lin2(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = LayerNorm(name="norm2", dtype=dtype)(x)
        return x


class TransformerEncoder(nn.Module):
    """Stack of ``num_layers`` post-norm encoder layers."""

    d_model: int
    nhead: int
    num_layers: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_len=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, valid_len=valid_len, deterministic=deterministic)
        return x
