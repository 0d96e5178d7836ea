"""Pallas TPU fused 2-layer MLP: ``act/dropout -> x@W1+b1 -> act/dropout ->
@W2+b2 -> act/dropout`` in one VMEM-resident kernel.

Covers the framework's two hottest elementwise-between-matmul chains
(SURVEY.md §7 "Pallas kernels"):

- the generator MLP heads (reference model.py:1227-1230):
  ``gelu -> dropout -> fc1 -> dropout -> gelu -> fc2 -> dropout -> gelu``
- the encoder feed-forward block (torch ``TransformerEncoderLayer`` FFN):
  ``linear1 -> relu -> dropout -> linear2``

XLA keeps the (M, d_ff) intermediate in HBM between the two matmuls; at the
flagship shape (M = 112x32 tokens, d_ff = 2048, x8 layers x3 encoders) that
intermediate traffic is the classifier step's main HBM cost after attention.
Here both matmuls and every elementwise op run per row-tile in VMEM with the
weights resident.

TPU-native layout: grid over row tiles (MB, K) with K/H/N padded to the
128-lane tile; matmuls accumulate in float32 on the MXU; dropout masks are
regenerated from the on-core PRNG with the same dynamic seed in forward and
backward (flash-style recompute — nothing is stashed between passes).

The elementwise chains are described by a static ``cfg`` tuple:
  pre  = None | ("gelu", rate)              # act THEN dropout, on the input
  mid  = (act, order, rate)                 # between the matmuls
  post = None | (act, "drop_first", rate)   # after the second matmul
with order in {"drop_first" (head: gelu(dropout(z))), "act_first"
(FFN: dropout(relu(z)))}. rate == 0 elides the mask generation entirely.

A custom VJP recomputes the forward in the backward kernel and accumulates
dW1/db1/dW2/db2 across row tiles (sequential TPU grid), so the backward is a
single fused kernel too.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _dropout_scale, _round_up

LANE = 128


def _erf(x):
    """erf from Mosaic-supported primitives (exp/abs/sign only — this TPU
    lowering implements neither erf nor erfc). Abramowitz & Stegun 7.1.26
    rational approximation, |error| <= 1.5e-7 — far inside the kernels'
    parity tolerance against the exact-erf XLA path."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _act(name, x):
    if name == "gelu":
        # exact-erf gelu (torch F.gelu default; nn/core.py gelu)
        return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))
    if name == "relu":
        return jnp.maximum(x, 0.0)
    raise ValueError(name)


def _needs_prng(cfg) -> bool:
    pre, mid, post = cfg
    return any(c is not None and c[-1] > 0.0 for c in (pre, mid, post))


def _masks(cfg, MB, K, H, N):
    """Generate the (up to) three dropout keep-masks in a FIXED order so the
    forward and backward kernels consume the PRNG stream identically."""
    pre, mid, post = cfg
    m_pre = m_mid = m_post = None
    if pre is not None and pre[1] > 0.0:
        m_pre = _dropout_scale((MB, K), pre[1])
    if mid[2] > 0.0:
        m_mid = _dropout_scale((MB, H), mid[2])
    if post is not None and post[2] > 0.0:
        m_post = _dropout_scale((MB, N), post[2])
    return m_pre, m_mid, m_post


def _forward_chain(x, w1, b1, w2, b2, masks, cfg, dot_dtype):
    """Returns (t1, z1, a1, z2, out). Elementwise in float32; matmul operands
    in the weights' native dtype (no f32 weight copies in VMEM), accumulating
    float32 on the MXU."""
    pre, mid, post = cfg
    m_pre, m_mid, m_post = masks
    t1 = x
    if pre is not None:
        t1 = _act(pre[0], t1)
        if m_pre is not None:
            t1 = t1 * m_pre
    z1 = (
        jax.lax.dot_general(
            t1.astype(dot_dtype), w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1
    )
    act, order, _ = mid
    if order == "drop_first":
        a1 = z1 if m_mid is None else z1 * m_mid
        a1 = _act(act, a1)
    else:  # act_first
        a1 = _act(act, z1)
        if m_mid is not None:
            a1 = a1 * m_mid
    z2 = (
        jax.lax.dot_general(
            a1.astype(dot_dtype), w2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2
    )
    out = z2
    if post is not None:
        out = z2 if m_post is None else z2 * m_post
        out = _act(post[0], out)
    return t1, z1, a1, z2, out


def _fwd_kernel(scalar_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, cfg):
    MB, K = x_ref.shape[0], x_ref.shape[1]
    H, N = w2_ref.shape[0], w2_ref.shape[1]
    if _needs_prng(cfg):
        pltpu.prng_seed(scalar_ref[0] + pl.program_id(0))
    masks = _masks(cfg, MB, K, H, N)
    x = x_ref[...].astype(jnp.float32)
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    *_, out = _forward_chain(
        x, w1_ref[...], b1, w2_ref[...], b2, masks, cfg, x_ref.dtype
    )
    out_ref[...] = out.astype(out_ref.dtype)


def _act_grad(name, z):
    """d act(z) / dz evaluated at pre-activation z (float32)."""
    if name == "relu":
        return (z > 0.0).astype(jnp.float32)
    if name == "gelu":
        # exact gelu: 0.5 z (1 + erf(z/sqrt(2))); d/dz = Phi(z) + z phi(z)
        inv_sqrt2 = 0.7071067811865476
        phi = jnp.exp(-0.5 * z * z) * 0.3989422804014327
        Phi = 0.5 * (1.0 + _erf(z * inv_sqrt2))
        return Phi + z * phi
    raise ValueError(name)


def _bwd_kernel(
    scalar_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, dout_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *, cfg,
):
    MB, K = x_ref.shape[0], x_ref.shape[1]
    H, N = w2_ref.shape[0], w2_ref.shape[1]
    if _needs_prng(cfg):
        pltpu.prng_seed(scalar_ref[0] + pl.program_id(0))
    masks = _masks(cfg, MB, K, H, N)
    m_pre, m_mid, m_post = masks
    pre, mid, post = cfg

    dot_dtype = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    t1, z1, a1, z2, _ = _forward_chain(x, w1, b1, w2, b2, masks, cfg, dot_dtype)
    g = dout_ref[...].astype(jnp.float32)

    if post is not None:
        zd2 = z2 if m_post is None else z2 * m_post
        g = g * _act_grad(post[0], zd2)
        if m_post is not None:
            g = g * m_post
    # g == dz2
    gd = g.astype(dot_dtype)
    dw2 = jax.lax.dot_general(
        a1.astype(dot_dtype), gd, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(g, axis=0, keepdims=True)
    da1 = jax.lax.dot_general(
        gd, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    act, order, _ = mid
    if order == "drop_first":
        zd1 = z1 if m_mid is None else z1 * m_mid
        dz1 = da1 * _act_grad(act, zd1)
        if m_mid is not None:
            dz1 = dz1 * m_mid
    else:  # act_first: a1 = mask * act(z1)
        if m_mid is not None:
            da1 = da1 * m_mid
        dz1 = da1 * _act_grad(act, z1)
    dz1d = dz1.astype(dot_dtype)
    dw1 = jax.lax.dot_general(
        t1.astype(dot_dtype), dz1d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(dz1, axis=0, keepdims=True)
    dt1 = jax.lax.dot_general(
        dz1d, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if pre is not None:
        if m_pre is not None:
            dt1 = dt1 * m_pre
        dt1 = dt1 * _act_grad(pre[0], x)
    dx_ref[...] = dt1.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dw1_ref[...] += dw1.astype(dw1_ref.dtype)
    db1_ref[...] += db1.astype(db1_ref.dtype)
    dw2_ref[...] += dw2.astype(dw2_ref.dtype)
    db2_ref[...] += db2.astype(db2_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_mlp_padded(x, w1, b1, w2, b2, scalars, cfg, mb):
    out, _ = _mlp_fwd(x, w1, b1, w2, b2, scalars, cfg, mb)
    return out


def _mlp_fwd(x, w1, b1, w2, b2, scalars, cfg, mb):
    M, K = x.shape
    H, N = w2.shape
    grid = (M // mb,)
    kernel = functools.partial(_fwd_kernel, cfg=cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mb, K), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, N), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid_spec=grid_spec,
    )(scalars, x, w1, b1, w2, b2)
    return out, (x, w1, b1, w2, b2, scalars)


def _mlp_bwd(cfg, mb, res, dout):
    x, w1, b1, w2, b2, scalars = res
    M, K = x.shape
    H, N = w2.shape
    grid = (M // mb,)
    kernel = functools.partial(_bwd_kernel, cfg=cfg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((mb, K), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mb, N), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((mb, K), lambda i, s: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((M, K), x.dtype),
            jax.ShapeDtypeStruct((K, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(scalars, x, w1, b1, w2, b2, dout)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
        None,
    )


_fused_mlp_padded.defvjp(_mlp_fwd, _mlp_bwd)

# The backward kernel keeps the f32 dW1/dW2 accumulators + both weight
# matrices + the per-tile activations resident in VMEM; stay under the
# compiler's scoped-vmem budget (16 MiB) with headroom.
_VMEM_BUDGET = 12 * 1024 * 1024


def _bwd_vmem_bytes(mb: int, K: int, H: int, N: int, dsize: int) -> int:
    weights = (K * H + H * N) * dsize  # native-dtype weights
    dw_accum = (K * H + H * N) * 4  # f32 accumulators
    # f32 per-tile activations: t1/x/dx (K), z1/a1/da1/dz1 + mask (H), g/z2 (N)
    acts = mb * 4 * (3 * K + 5 * H + 3 * N)
    return weights + dw_accum + acts


def _pick_block_rows(block_rows: int, K: int, H: int, N: int, dsize: int):
    for mb in (block_rows, 128, 64, 32):
        if mb <= block_rows and _bwd_vmem_bytes(mb, K, H, N, dsize) <= _VMEM_BUDGET:
            return mb
    return None


def fused_mlp_supported(
    K: int, H: int, N: int, dtype=jnp.float32, block_rows: int = 256
) -> bool:
    """True iff the (K -> H -> N) geometry fits the kernel's VMEM budget at
    some row tile. Callers keep the XLA path for oversized geometries (e.g.
    the visual generator's 512 -> 2048 -> 512 encoder FFN, whose f32 dW
    accumulators alone are 8 MiB)."""
    Kp, Hp, Np = _round_up(K, LANE), _round_up(H, LANE), _round_up(N, LANE)
    dsize = jnp.dtype(dtype).itemsize
    return _pick_block_rows(block_rows, Kp, Hp, Np, dsize) is not None


def fused_mlp(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    pre: Optional[Tuple] = None,
    mid: Tuple = ("relu", "act_first", 0.0),
    post: Optional[Tuple] = None,
    dropout_seed: Optional[jnp.ndarray] = None,
    block_rows: int = 256,
) -> jnp.ndarray:
    """Fused MLP over (..., K) inputs; returns (..., N).

    ``w1`` (K, H), ``b1`` (H,), ``w2`` (H, N), ``b2`` (N,). ``pre``/``mid``/
    ``post`` describe the elementwise chains (see module docstring).
    ``dropout_seed`` is a dynamic int32 scalar used whenever any rate > 0.
    """
    orig_shape = x.shape
    K = orig_shape[-1]
    H = w1.shape[1]
    N = w2.shape[1]
    M = 1
    for d in orig_shape[:-1]:
        M *= d
    x2 = x.reshape(M, K)

    Kp = _round_up(K, LANE)
    Hp = _round_up(H, LANE)
    Np = _round_up(N, LANE)
    mb = _pick_block_rows(block_rows, Kp, Hp, Np, jnp.dtype(x.dtype).itemsize)
    if mb is None:
        raise ValueError(
            f"fused_mlp geometry K={K} H={H} N={N} exceeds the VMEM budget; "
            "guard call sites with fused_mlp_supported(...)"
        )
    # row-tile: multiple of 16 sublanes (covers bf16's (16, 128) tile too)
    mb = min(mb, _round_up(M, 16))
    Mp = _round_up(M, mb)

    x2 = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    w1p = jnp.pad(w1, ((0, Kp - K), (0, Hp - H)))
    b1p = jnp.pad(b1.reshape(1, H), ((0, 0), (0, Hp - H)))
    w2p = jnp.pad(w2, ((0, Hp - H), (0, Np - N)))
    b2p = jnp.pad(b2.reshape(1, N), ((0, 0), (0, Np - N)))

    if dropout_seed is None:
        dropout_seed = jnp.asarray(0, jnp.int32)
    scalars = jnp.asarray(dropout_seed, jnp.int32).reshape(1)

    cfg = (
        tuple(pre) if pre is not None else None,
        tuple(mid),
        tuple(post) if post is not None else None,
    )
    out = _fused_mlp_padded(x2, w1p, b1p, w2p, b2p, scalars, cfg, mb)
    return out[:M, :N].reshape(*orig_shape[:-1], N)
