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


def _encoder_layer_forward(m, x, valid_len, deterministic: bool):
    """Shared post-norm layer body. ``m`` is the owning module (the unrolled
    ``TransformerEncoderLayer`` or the scanned ``_ScannedEncoderLayer``);
    submodules created here bind to it, so both paths produce the SAME leaf
    names and the per-layer trees convert by a pure stack/unstack
    (:func:`stack_layer_params`)."""
    dtype = m.dtype or x.dtype
    attn_out = MultiheadSelfAttention(
        m.d_model, m.nhead, dropout=m.dropout, dtype=dtype, name="self_attn"
    )(x, valid_len=valid_len, deterministic=deterministic)
    x = x + nn.Dropout(m.dropout)(attn_out, deterministic=deterministic)
    x = LayerNorm(name="norm1", dtype=dtype)(x)

    from ..ops.config import pallas_mlp_enabled

    lin1 = TorchLinear(m.dim_feedforward, dtype=dtype, name="linear1")
    lin2 = TorchLinear(m.d_model, dtype=dtype, name="linear2")
    from ..ops.mlp import fused_mlp_supported

    if pallas_mlp_enabled() and fused_mlp_supported(
        m.d_model, m.dim_feedforward, m.d_model, dtype
    ):
        # one VMEM kernel for linear1 -> relu -> dropout -> linear2: the
        # (M, d_ff) intermediate never round-trips HBM (ops/mlp.py)
        from ..ops.mlp import fused_mlp

        k1, b1 = lin1(x, return_params=True)
        k2, b2 = lin2(
            jnp.zeros((1, m.dim_feedforward), dtype), return_params=True
        )
        rate = 0.0 if deterministic else m.dropout
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                m.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
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
        h = nn.Dropout(m.dropout)(h, deterministic=deterministic)
        h = lin2(h)
    x = x + nn.Dropout(m.dropout)(h, deterministic=deterministic)
    x = LayerNorm(name="norm2", dtype=dtype)(x)
    return x


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
        return _encoder_layer_forward(self, x, valid_len, deterministic)


class _ScannedEncoderLayer(nn.Module):
    """The same layer body in ``nn.scan`` calling convention: carry in,
    (carry, per-step output=None) out. Instantiated only through
    :class:`TransformerEncoder`'s scan path."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_len, deterministic: bool):
        return _encoder_layer_forward(self, x, valid_len, deterministic), None


class TransformerEncoder(nn.Module):
    """Stack of ``num_layers`` post-norm encoder layers.

    Two structurally different renditions of the same math, selected by the
    trace-time ``scan_layers`` switch (ops/config.py, ``GANFFN_SCAN_LAYERS``):

    - **unrolled** (default): ``num_layers`` named child layers
      (``layers_0`` .. ``layers_{n-1}``) — the torch-checkpoint-shaped tree
      every parity/transplant test uses.
    - **scanned**: ONE ``nn.scan`` over a single layer whose params carry a
      stacked leading ``num_layers`` axis (child name ``layers``). The traced
      program is ~``num_layers``× smaller, which is what the hosted
      remote-compile path charges for (the unrolled 12-duel stage-A program
      costs ~7-20 min to build, PERF.md "scan-over-layers"). Deterministic
      outputs/gradients are equivalent (tests/test_scan_layers.py); dropout
      draws differ (per-step rng split vs per-path fold), like any rng
      re-derivation. Convert checkpoints between the two layouts with
      :func:`stack_layer_params` / :func:`unstack_layer_params`.
    """

    d_model: int
    nhead: int
    num_layers: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, valid_len=None, deterministic: bool = True):
        from ..ops.config import scan_layers_enabled

        if scan_layers_enabled():
            scanned = nn.scan(
                _ScannedEncoderLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )
            x, _ = scanned(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                name="layers",
            )(x, valid_len, deterministic)
            return x
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


def _is_unrolled_encoder(d) -> bool:
    return isinstance(d, dict) and "layers_0" in d


def _is_scanned_encoder(d) -> bool:
    return (
        isinstance(d, dict)
        and isinstance(d.get("layers"), dict)
        and "self_attn" in d["layers"]
    )


def _map_containers(fn, node):
    """Recurse ``fn`` through dicts, lists, tuples and NamedTuples (optimizer
    states mirror the param tree inside optax NamedTuples)."""
    if isinstance(node, dict):
        return {k: fn(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        vals = [fn(v) for v in node]
        if hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*vals)
        return type(node)(vals)
    return node


def stack_layer_params(params):
    """Convert every unrolled-encoder subtree (``layers_0``..``layers_{n-1}``)
    in ``params`` to the scanned layout (one ``layers`` subtree, leaves
    stacked on a new leading axis). Walks dicts, lists, tuples and
    NamedTuples, so it accepts a single encoder's subtree, a model's
    ``params``, a full GAN state's ``params`` dict, or an optimizer-state
    tree that mirrors the params. Non-encoder subtrees pass through
    unchanged (by reference — deep-copy before donating either tree)."""
    if _is_unrolled_encoder(params):
        n = sum(1 for k in params if k.startswith("layers_"))
        layers = [params[f"layers_{i}"] for i in range(n)]
        rest = {k: stack_layer_params(v) for k, v in params.items()
                if not k.startswith("layers_")}
        rest["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return rest
    return _map_containers(stack_layer_params, params)


def unstack_layer_params(params):
    """Inverse of :func:`stack_layer_params`: split every scanned-encoder
    ``layers`` subtree back into per-layer ``layers_i`` subtrees."""
    if _is_scanned_encoder(params):
        stacked = params["layers"]
        n = jax.tree.leaves(stacked)[0].shape[0]
        rest = {k: unstack_layer_params(v) for k, v in params.items()
                if k != "layers"}
        for i in range(n):
            rest[f"layers_{i}"] = jax.tree.map(lambda x: x[i], stacked)
        return rest
    return _map_containers(unstack_layer_params, params)
