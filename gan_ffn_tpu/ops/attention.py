"""Pallas TPU fused multi-head attention for short dialogue sequences.

The encoders attend over padded dialogues of <= 128 utterances with small
per-head dims (Dh = 10 for the d=100 generators, 64 for the visual one).
XLA materializes the (B, H, L, L) score tensor in HBM between the QK^T
matmul, the masked softmax and the PV matmul; at these sizes the attention
stack is bandwidth-bound, so fusing the whole chain into one VMEM-resident
kernel removes those round trips.

TPU-native layout: the sequence axis lives on the 128-wide lane dimension
throughout. Per grid program (one per batch element) the operands are
(H, Dh, Lp) transposes with Lp = L padded to 128; scores (H, Lp, Lp) and the
softmax run in float32 in VMEM; the output is written back as (H, Dh, Lp).

Semantics match nn/transformer.MultiheadSelfAttention exactly:
- scale 1/sqrt(Dh), softmax over the key axis in float32,
- keys at positions >= valid_len masked to -1e30 (the bucket-padding mask),
- optional attention-weight dropout regenerated from the on-core PRNG with
  the same (dynamic) seed in forward and backward — no mask tensor is stored.

A custom VJP recomputes the softmax in the backward kernel (flash-style)
instead of saving the (B, H, L, L) attention tensor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_weights(qT, kT, valid_len, scale, H, Lp):
    """scores + key mask + softmax, float32. qT/kT: (H, Dh, Lp)."""
    scores = jax.lax.dot_general(
        qT,
        kT,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (H, Lq, Lk)
    scores = scores * scale
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (H, Lp, Lp), 2)
    scores = jnp.where(key_pos < valid_len, scores, NEG_INF)
    return jax.nn.softmax(scores, axis=-1)


def _dropout_scale(shape, rate):
    """Regenerable keep-mask * 1/(1-rate) from the already-seeded core PRNG.

    ``prng_random_bits`` yields int32 on TPU — bitcast to uint32 before the
    threshold compare or the signed comparison keeps everything.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (2**32)), 2**32 - 1))
    keep = (bits >= threshold).astype(jnp.float32)
    return keep / (1.0 - rate)


def _fwd_kernel(scalar_ref, qT_ref, kT_ref, vT_ref, out_ref, *, H, Dh, Lp, rate, scale):
    valid_len = scalar_ref[0]
    attn = _attn_weights(qT_ref[0], kT_ref[0], valid_len, scale, H, Lp)
    if rate > 0.0:
        pltpu.prng_seed(scalar_ref[1] + pl.program_id(0))
        attn = attn * _dropout_scale(attn.shape, rate)
    attn = attn.astype(vT_ref.dtype)
    # (H, Dh, Lk) x (H, Lq, Lk) -> (H, Dh, Lq)
    outT = jax.lax.dot_general(
        vT_ref[0],
        attn,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = outT.astype(out_ref.dtype)


def _bwd_kernel(
    scalar_ref, qT_ref, kT_ref, vT_ref, dOutT_ref, dq_ref, dk_ref, dv_ref,
    *, H, Dh, Lp, rate, scale,
):
    valid_len = scalar_ref[0]
    qT = qT_ref[0]
    kT = kT_ref[0]
    vT = vT_ref[0]
    dOutT = dOutT_ref[0]

    attn = _attn_weights(qT, kT, valid_len, scale, H, Lp)  # f32 (H, Lq, Lk)
    if rate > 0.0:
        pltpu.prng_seed(scalar_ref[1] + pl.program_id(0))
        keep_scale = _dropout_scale(attn.shape, rate)
        attn_drop = attn * keep_scale
    else:
        keep_scale = None
        attn_drop = attn

    # dV^T (H, Dh, Lk) = dOut^T (H, Dh, Lq) x attn_drop (H, Lq, Lk) over Lq
    dVT = jax.lax.dot_general(
        dOutT, attn_drop.astype(dOutT.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dAttn_drop (H, Lq, Lk) = contract dOut^T with v^T over Dh
    dAttn = jax.lax.dot_general(
        dOutT, vT,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if keep_scale is not None:
        dAttn = dAttn * keep_scale
    # softmax backward (w.r.t. pre-dropout attn)
    dS = attn * (dAttn - jnp.sum(dAttn * attn, axis=-1, keepdims=True))
    dS = (dS * scale).astype(qT.dtype)
    # dQ^T (H, Dh, Lq) = k^T (H, Dh, Lk) x dS (H, Lq, Lk) over Lk
    dQT = jax.lax.dot_general(
        kT, dS,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dK^T (H, Dh, Lk) = q^T (H, Dh, Lq) x dS (H, Lq, Lk) over Lq
    dKT = jax.lax.dot_general(
        qT, dS,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = dQT.astype(dq_ref.dtype)
    dk_ref[0] = dKT.astype(dk_ref.dtype)
    dv_ref[0] = dVT.astype(dv_ref.dtype)


def _specs(n, H, Dh, Lp):
    return [
        pl.BlockSpec((1, H, Dh, Lp), lambda b, s: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(n)
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention_padded(qT, kT, vT, scalars, rate, scale):
    out, _ = _fa_fwd(qT, kT, vT, scalars, rate, scale)
    return out


@functools.lru_cache(maxsize=None)
def _fwd_call(rate: float, scale: float):
    """Geometry-shared fwd runner: every attention site with the same
    (rate, scale) — and, via jit's own cache, the same shapes/dtypes — calls
    ONE jitted function, so a multi-encoder program (e.g. the fused 12-duel
    stage-A step, which instantiates ~60 attention sites) presents each
    distinct kernel geometry to XLA/Mosaic once instead of per site."""

    @jax.jit
    def run(scalars, qT, kT, vT):
        B, H, Dh, Lp = qT.shape
        kernel = functools.partial(
            _fwd_kernel, H=H, Dh=Dh, Lp=Lp, rate=rate, scale=scale
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=_specs(3, H, Dh, Lp),
            out_specs=_specs(1, H, Dh, Lp)[0],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(qT.shape, qT.dtype),
            grid_spec=grid_spec,
        )(scalars, qT, kT, vT)

    return run


@functools.lru_cache(maxsize=None)
def _bwd_call(rate: float, scale: float):
    """Geometry-shared bwd runner (see _fwd_call)."""

    @jax.jit
    def run(scalars, qT, kT, vT, dOut):
        B, H, Dh, Lp = qT.shape
        kernel = functools.partial(
            _bwd_kernel, H=H, Dh=Dh, Lp=Lp, rate=rate, scale=scale
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=_specs(4, H, Dh, Lp),
            out_specs=_specs(3, H, Dh, Lp),
        )
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct(qT.shape, qT.dtype)] * 3,
            grid_spec=grid_spec,
        )(scalars, qT, kT, vT, dOut)

    return run


def _fa_fwd(qT, kT, vT, scalars, rate, scale):
    out = _fwd_call(rate, scale)(scalars, qT, kT, vT)
    return out, (qT, kT, vT, scalars)


def _fa_bwd(rate, scale, res, dOut):
    qT, kT, vT, scalars = res
    dq, dk, dv = _bwd_call(rate, scale)(scalars, qT, kT, vT, dOut)
    return dq, dk, dv, None


_fused_attention_padded.defvjp(_fa_fwd, _fa_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_len: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_seed: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused attention over (B, H, L, Dh) operands; returns (B, H, L, Dh).

    ``valid_len`` masks keys at positions >= it (defaults to L; dynamic).
    ``dropout_rate`` > 0 applies attention-weight dropout seeded from the
    dynamic ``dropout_seed`` scalar.
    """
    B, H, L, Dh = q.shape
    Lp = _round_up(L, LANE)
    sub = 16 if q.dtype == jnp.bfloat16 else 8
    Dhp = _round_up(Dh, sub)

    def to_T(x):
        xT = x.transpose(0, 1, 3, 2)  # (B, H, Dh, L)
        return jnp.pad(xT, ((0, 0), (0, 0), (0, Dhp - Dh), (0, Lp - L)))

    if valid_len is None:
        valid_len = jnp.asarray(L, jnp.int32)
    else:
        valid_len = jnp.minimum(jnp.asarray(valid_len, jnp.int32), L)
    if dropout_seed is None:
        dropout_seed = jnp.asarray(0, jnp.int32)
    scalars = jnp.stack(
        [valid_len.astype(jnp.int32), jnp.asarray(dropout_seed, jnp.int32)]
    )

    outT = _fused_attention_padded(
        to_T(q), to_T(k), to_T(v), scalars, float(dropout_rate), 1.0 / float(Dh) ** 0.5
    )
    return outT[:, :, :Dh, :L].transpose(0, 1, 3, 2)
