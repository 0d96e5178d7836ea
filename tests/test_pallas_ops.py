"""Pallas kernel parity tests (interpreter mode on CPU).

The fused attention kernel must match the XLA reference path bit-closely in
deterministic mode, for both head geometries used by the GAN group
(Dh=10 generators, Dh=64 visual), forward and backward.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gan_ffn_tpu.ops.attention as A


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(A.pl, "pallas_call", patched)
    yield


def xla_attention(q, k, v, valid_len):
    B, H, L, Dh = q.shape
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.float32(np.sqrt(Dh))
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3)
    scores = jnp.where(pos < valid_len, scores, -1e30)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v)


@pytest.mark.parametrize("H,Dh", [(10, 10), (8, 64)])
@pytest.mark.parametrize("L,vl", [(112, 90), (48, 48)])
def test_fused_attention_fwd_parity(H, Dh, L, vl):
    rng = np.random.default_rng(0)
    B = 2
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32)) for _ in range(3)
    )
    valid = jnp.asarray(vl, jnp.int32)
    got = A.fused_attention(q, k, v, valid)
    want = xla_attention(q, k, v, valid)
    np.testing.assert_allclose(
        np.asarray(got)[:, :, :vl], np.asarray(want)[:, :, :vl], rtol=2e-4, atol=2e-5
    )


def test_fused_attention_grad_parity():
    rng = np.random.default_rng(1)
    B, H, L, Dh = 2, 4, 64, 10
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32)) for _ in range(3)
    )
    valid = jnp.asarray(50, jnp.int32)

    def loss_p(q, k, v):
        return (A.fused_attention(q, k, v, valid)[:, :, :50] ** 2).sum()

    def loss_x(q, k, v):
        return (xla_attention(q, k, v, valid)[:, :, :50] ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


@pytest.mark.skip(
    reason="pltpu.prng_* is not supported by the CPU interpreter; dropout "
    "seed behavior is exercised on hardware (validated on v5e: distinct "
    "seeds -> distinct masks, 40-seed mean within sampling error of the "
    "deterministic output)"
)
def test_fused_attention_dropout_seeds():
    rng = np.random.default_rng(2)
    B, H, L, Dh = 1, 2, 48, 10
    q, k, v = (
        jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32)) for _ in range(3)
    )
    valid = jnp.asarray(48, jnp.int32)
    o1 = A.fused_attention(q, k, v, valid, dropout_rate=0.5, dropout_seed=jnp.asarray(1))
    o2 = A.fused_attention(q, k, v, valid, dropout_rate=0.5, dropout_seed=jnp.asarray(2))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_fused_attention_in_transformer_module():
    """The integrated MultiheadSelfAttention pallas path == its XLA path."""
    from gan_ffn_tpu.nn.transformer import MultiheadSelfAttention
    from gan_ffn_tpu.ops.config import use_pallas_attention

    E, H, L, B = 100, 10, 48, 3
    m = MultiheadSelfAttention(E, H)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(L, B, E)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    vl = jnp.asarray(40, jnp.int32)
    base = m.apply(params, x, valid_len=vl, deterministic=True)
    with use_pallas_attention(True):
        fused = m.apply(params, x, valid_len=vl, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(fused)[:40], np.asarray(base)[:40], rtol=2e-4, atol=2e-5
    )
