"""Attention primitives (reference model.py:22-298).

- ``SimpleAttention``: scalar-projection softmax pooling over the sequence axis
  (model.py:22-37; defined twice identically in the reference — once here).
- ``MatchingAttention``: memory/candidate attention with the reference's four
  score types, including the masked+renormalized ``general2``
  (model.py:134-194). Queries may carry a leading time axis so call sites that
  the reference loops over timesteps (BiModel att2, model.py:1045-1052;
  MELDLSTMModel, model.py:546-555) are one batched einsum here.
- ``Attention``: the reference's multi-head attention (model.py:197-286),
  including its softmax-over-dim-0 quirk (model.py:279 applies softmax over
  the flattened head*batch axis rather than the key axis) — replicated
  faithfully because the LSTMModel baseline depends on it.
- ``matching``: the functional cross-modal matching helper (model.py:289-298).

All attention masks use an additive -1e30 before softmax; ``general2``
additionally replicates the reference's multiply-then-renormalize scheme
exactly (it multiplies scores by the mask rather than adding -inf, then
renormalizes the masked softmax output).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .core import TorchLinear, normal_init, torch_linear_bias_init, uniform_bound_init

NEG_INF = -1e30


class SimpleAttention(nn.Module):
    """M (L, B, D) -> (pool (B, D), alpha (B, 1, L)).

    ``mask`` (B, L), optional: positions with mask==0 are excluded from the
    softmax (the reference achieves the same by only ever passing the valid
    history prefix).
    """

    input_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, M, x=None, mask: Optional[jnp.ndarray] = None):
        scale = TorchLinear(1, use_bias=False, name="scalar", dtype=self.dtype)(M)  # (L, B, 1)
        scores = scale[..., 0].astype(jnp.float32)  # (L, B)
        if mask is not None:
            scores = jnp.where(mask.T > 0, scores, NEG_INF)
        alpha_lb = jax.nn.softmax(scores, axis=0)  # (L, B)
        pool = jnp.einsum("lb,lbd->bd", alpha_lb.astype(M.dtype), M)
        alpha = alpha_lb.T[:, None, :]  # (B, 1, L)
        return pool, alpha


class MatchingAttention(nn.Module):
    """Memory-candidate attention, score types dot/general/general2/concat.

    ``M`` (L, B, mem_dim); ``x`` (B, cand_dim) or (T, B, cand_dim);
    ``mask`` (B, L). Returns (pool, alpha) with pool (B, mem_dim) or
    (T, B, mem_dim) and alpha (B, 1, L) or (T, B, 1, L) matching the input
    rank.
    """

    mem_dim: int
    cand_dim: int
    alpha_dim: Optional[int] = None
    att_type: str = "general2"
    dtype: Any = None

    @nn.compact
    def __call__(self, M, x, mask: Optional[jnp.ndarray] = None):
        assert self.att_type != "concat" or self.alpha_dim is not None
        assert self.att_type != "dot" or self.mem_dim == self.cand_dim
        L, B, _ = M.shape
        single = x.ndim == 2
        if single:
            x = x[None]  # (1, B, cand_dim)
        T = x.shape[0]

        if mask is None:
            mask = jnp.ones((B, L), dtype=M.dtype)

        # For dot/general/concat the reference ignores `mask` because its
        # callers pass only the valid history prefix (a dynamically-sized
        # tensor). With a fixed-size buffer the same semantics require an
        # additive -inf mask over invalid key positions.
        def _masked_softmax(scores):  # scores (T, B, L)
            s = jnp.where(mask[None, :, :] > 0, scores.astype(jnp.float32), NEG_INF)
            return jax.nn.softmax(s, axis=-1).astype(M.dtype)

        if self.att_type == "dot":
            scores = jnp.einsum("tbd,lbd->tbl", x, M)
            alpha = _masked_softmax(scores)
        elif self.att_type == "general":
            xt = TorchLinear(self.mem_dim, use_bias=False, name="transform", dtype=self.dtype)(x)
            scores = jnp.einsum("tbd,lbd->tbl", xt, M)
            alpha = _masked_softmax(scores)
        elif self.att_type == "general2":
            # reference init: weight ~ N(0, 0.01), bias keeps torch Linear default
            xt = TorchLinear(
                self.mem_dim,
                name="transform",
                dtype=self.dtype,
                kernel_init=normal_init(0.01),
                bias_init=torch_linear_bias_init(self.cand_dim),
            )(x)
            M_masked = M * mask.T[:, :, None]  # (L, B, mem)
            scores = jnp.einsum("tbd,lbd->tbl", xt, M_masked)
            scores = jnp.tanh(scores * mask[None, :, :])
            alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            alpha = alpha * mask[None, :, :]
            # Safe renormalization: an all-masked row (empty history at t=0 in
            # the DialogueRNN scan, or a fully-padded dialogue column) divides
            # by 1 instead of 0 so neither the forward nor the division's
            # backward produces NaN. With any valid position the sum is
            # >= 1/L and the substitution is inert.
            denom = jnp.sum(alpha, axis=-1, keepdims=True)
            alpha = alpha / jnp.where(denom > 0, denom, 1.0)
            alpha = alpha.astype(M.dtype)
        elif self.att_type == "concat":
            # (T, B, L, mem+cand)
            M_exp = jnp.broadcast_to(M.transpose(1, 0, 2)[None], (T, B, L, self.mem_dim))
            x_exp = jnp.broadcast_to(x[:, :, None, :], (T, B, L, self.cand_dim))
            mx = jnp.concatenate([M_exp, x_exp], axis=-1)
            mx_a = jnp.tanh(
                TorchLinear(self.alpha_dim, use_bias=False, name="transform", dtype=self.dtype)(mx)
            )
            scores = TorchLinear(1, use_bias=False, name="vector_prod", dtype=self.dtype)(mx_a)
            alpha = _masked_softmax(scores[..., 0])
        else:
            raise ValueError(f"unknown att_type {self.att_type!r}")

        pool = jnp.einsum("tbl,lbd->tbd", alpha, M)
        alpha = alpha[:, :, None, :]  # (T, B, 1, L)
        if single:
            return pool[0], alpha[0]
        return pool, alpha


class Attention(nn.Module):
    """The reference's multi-head ``Attention`` (model.py:197-286), quirks
    included: softmax over axis 0 of the (n_head*batch, q_len, k_len) score
    tensor, and output formed from ``kx`` (not a separate value projection).
    ``k``/``q`` are batch-first (B, L, E)."""

    embed_dim: int
    hidden_dim: Optional[int] = None
    out_dim: Optional[int] = None
    n_head: int = 4
    score_function: str = "scaled_dot_product"
    dropout: float = 0.6
    dtype: Any = None

    @nn.compact
    def __call__(self, k, q, deterministic: bool = True):
        hidden_dim = self.hidden_dim or self.embed_dim // self.n_head
        out_dim = self.out_dim or self.embed_dim
        if q.ndim == 2:
            q = q[:, None, :]
        if k.ndim == 2:
            k = k[:, None, :]
        B, k_len, _ = k.shape
        q_len = q.shape[1]
        H = self.n_head

        w_k = TorchLinear(H * hidden_dim, name="w_k", dtype=self.dtype)
        w_q = TorchLinear(H * hidden_dim, name="w_q", dtype=self.dtype)
        # (B, L, H*Dh) -> (H*B, L, Dh), exactly the reference's permute+view
        kx = w_k(k).reshape(B, k_len, H, hidden_dim).transpose(2, 0, 1, 3).reshape(
            H * B, k_len, hidden_dim
        )
        qx = w_q(q).reshape(B, q_len, H, hidden_dim).transpose(2, 0, 1, 3).reshape(
            H * B, q_len, hidden_dim
        )

        stdv = 1.0 / jnp.sqrt(jnp.asarray(hidden_dim, jnp.float32))
        if self.score_function == "dot_product":
            score = jnp.einsum("zqd,zkd->zqk", qx, kx)
        elif self.score_function == "scaled_dot_product":
            score = jnp.einsum("zqd,zkd->zqk", qx, kx) / jnp.sqrt(
                jnp.asarray(hidden_dim, qx.dtype)
            )
        elif self.score_function == "mlp":
            weight = self.param(
                "weight", uniform_bound_init(float(stdv)), (hidden_dim * 2,)
            )
            kxx = jnp.broadcast_to(kx[:, None], (H * B, q_len, k_len, hidden_dim))
            qxx = jnp.broadcast_to(qx[:, :, None], (H * B, q_len, k_len, hidden_dim))
            kq = jnp.concatenate([kxx, qxx], axis=-1)
            score = jnp.tanh(jnp.einsum("zqkd,d->zqk", kq, weight))
        elif self.score_function == "bi_linear":
            weight = self.param(
                "weight", uniform_bound_init(float(stdv)), (hidden_dim, hidden_dim)
            )
            qw = jnp.einsum("zqd,de->zqe", qx, weight)
            score = jnp.einsum("zqe,zke->zqk", qw, kx)
        else:
            raise ValueError("invalid score_function")

        # Reference quirk: softmax over dim=0 (the head*batch axis).
        score = jax.nn.softmax(score.astype(jnp.float32), axis=0).astype(kx.dtype)
        output = jnp.einsum("zqk,zkd->zqd", score, kx)  # (H*B, q_len, Dh)
        # torch.cat(torch.split(output, B, dim=0), dim=-1) -> (B, q_len, H*Dh)
        output = output.reshape(H, B, q_len, hidden_dim).transpose(1, 2, 0, 3).reshape(
            B, q_len, H * hidden_dim
        )
        output = TorchLinear(out_dim, name="proj", dtype=self.dtype)(output)
        output = nn.Dropout(self.dropout)(output, deterministic=deterministic)
        return output, score


def matching(matchatt_apply, emotions, modal, umask):
    """Functional cross-modal matching (model.py:289-298), batched: attends
    every timestep of ``modal`` over ``emotions`` then adds gelu residual.

    ``matchatt_apply(M, x, mask)`` must be a bound MatchingAttention callable.
    """
    att_emotions, alpha = matchatt_apply(emotions, modal, umask)
    hidden = att_emotions + jax.nn.gelu(emotions, approximate=False)
    return hidden, alpha
