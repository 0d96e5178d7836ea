"""Pallas kernel parity tests (interpreter mode on CPU).

The fused attention kernel must match the XLA reference path bit-closely in
deterministic mode, for both head geometries used by the GAN group
(Dh=10 generators, Dh=64 visual), forward and backward.

COVERAGE POLICY: the in-kernel PRNG dropout paths (``pltpu.prng_*``) cannot
run under the CPU interpreter, so the two ``tpu_hardware``-marked dropout
tests SKIP in the CPU CI gate — a green CPU suite does NOT cover them. They
run whenever a real TPU is reachable; the most recent hardware runs are
recorded in PERF.md ("Pallas kernel validation on hardware").
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import gan_ffn_tpu.ops.attention as A


@pytest.fixture(autouse=True)
def interpret_pallas(request, monkeypatch):
    # the geometry-shared jitted runners cache traced pallas_calls; a trace
    # made under the interpret patch must not leak into hardware tests (or
    # vice versa), so drop the caches around every test
    A._fwd_call.cache_clear()
    A._bwd_call.cache_clear()
    if "tpu_hardware" in request.keywords:
        # hardware tests run the compiled Mosaic kernel on the real chip
        yield
        A._fwd_call.cache_clear()
        A._bwd_call.cache_clear()
        return
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(A.pl, "pallas_call", patched)
    yield
    A._fwd_call.cache_clear()
    A._bwd_call.cache_clear()


def _tpu_device():
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        return None


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


@pytest.mark.tpu_hardware
def test_fused_attention_dropout_seeds():
    """TPU-gated: ``pltpu.prng_*`` is unsupported by the CPU interpreter, so
    the dropout path runs on real hardware whenever a TPU is reachable
    (skipped otherwise). Distinct seeds must give distinct masks; the same
    seed must reproduce bitwise; the kept-element mean must track the
    deterministic output (inverted-dropout scaling)."""
    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device reachable; dropout kernel needs pltpu.prng_*")
    rng = np.random.default_rng(2)
    B, H, L, Dh = 1, 2, 48, 10
    with jax.default_device(dev):
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, H, L, Dh)).astype(np.float32))
            for _ in range(3)
        )
        valid = jnp.asarray(48, jnp.int32)

        def run(seed, rate=0.5):
            return np.asarray(
                A.fused_attention(
                    q, k, v, valid, dropout_rate=rate, dropout_seed=jnp.asarray(seed)
                )
            )

        o1, o1b, o2 = run(1), run(1), run(2)
        base = np.asarray(A.fused_attention(q, k, v, valid))
    assert not np.allclose(o1, o2), "distinct seeds must produce distinct masks"
    np.testing.assert_array_equal(o1, o1b)  # same seed -> bitwise reproducible
    # dropout is mean-preserving: averaging over many seeds approaches the
    # deterministic output
    with jax.default_device(dev):
        mean = np.mean([run(s) for s in range(20)], axis=0)
    err = np.abs(mean - base).mean() / (np.abs(base).mean() + 1e-9)
    assert err < 0.35, f"20-seed mean deviates {err:.2%} from deterministic output"


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


@pytest.mark.slow
def test_generator_grads_pallas_vs_xla():
    """Full-module gradient A/B: TextGenerator parameter grads with the Pallas
    fused-attention VJP (interpret mode) == the XLA attention path. Covers the
    custom VJP inside a real 2-layer encoder backward, not just the bare op."""
    from gan_ffn_tpu.models import TextGenerator
    from gan_ffn_tpu.ops.config import use_pallas_attention

    L, B, vl = 14, 3, 10
    m = TextGenerator(D_h=100, num_layers=2)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    valid = jnp.asarray(vl, jnp.int32)

    def make_loss(pallas_on):
        def loss(p):
            with use_pallas_attention(pallas_on):
                out = m.apply({"params": p}, x, valid_len=valid, deterministic=True)
            return (out[:vl] ** 2).sum()

        return loss

    g_xla = jax.grad(make_loss(False))(params)
    g_pallas = jax.grad(make_loss(True))(params)
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_pallas)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# Fused MLP kernel (ops/mlp.py)
# ---------------------------------------------------------------------------


def _xla_head(x, k1, b1, k2, b2):
    """Reference chain for the generator head (deterministic): gelu -> fc1 ->
    gelu -> fc2 -> gelu (dropouts elided at rate 0)."""
    g = lambda t: jax.nn.gelu(t, approximate=False)
    return g(g(g(x) @ k1 + b1) @ k2 + b2)


def _xla_ffn(x, k1, b1, k2, b2):
    """Encoder FFN chain: linear1 -> relu -> linear2."""
    return jnp.maximum(x @ k1 + b1, 0.0) @ k2 + b2


@pytest.mark.parametrize(
    "shape,cfg_name",
    [
        ((50, 3, 100), "head"),     # generator head: K=100 -> 512 -> 100
        ((50, 3, 100), "ffn"),      # encoder FFN: K=100 -> 2048 -> 100
        ((23, 2, 512), "head512"),  # visual head: 512 -> 1024 -> 100
    ],
)
def test_fused_mlp_fwd_parity(shape, cfg_name):
    from gan_ffn_tpu.ops.mlp import fused_mlp

    rng = np.random.default_rng(11)
    K = shape[-1]
    H, N = {"head": (512, 100), "ffn": (2048, 100), "head512": (1024, 100)}[cfg_name]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(K, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
    k2 = jnp.asarray(rng.normal(size=(H, N)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.05)

    if cfg_name == "ffn":
        got = fused_mlp(x, k1, b1, k2, b2, mid=("relu", "act_first", 0.0))
        want = _xla_ffn(x, k1, b1, k2, b2)
    else:
        got = fused_mlp(
            x, k1, b1, k2, b2,
            pre=("gelu", 0.0), mid=("gelu", "drop_first", 0.0),
            post=("gelu", "drop_first", 0.0),
        )
        want = _xla_head(x, k1, b1, k2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("cfg_name", ["head", "ffn"])
def test_fused_mlp_grad_parity(cfg_name):
    from gan_ffn_tpu.ops.mlp import fused_mlp

    rng = np.random.default_rng(12)
    K, H, N = 100, 256, 100
    x = jnp.asarray(rng.normal(size=(30, 2, K)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(K, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
    k2 = jnp.asarray(rng.normal(size=(H, N)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.05)

    if cfg_name == "ffn":
        f_p = lambda *a: (fused_mlp(*a, mid=("relu", "act_first", 0.0)) ** 2).sum()
        f_x = lambda *a: (_xla_ffn(*a) ** 2).sum()
    else:
        f_p = lambda *a: (
            fused_mlp(
                *a, pre=("gelu", 0.0), mid=("gelu", "drop_first", 0.0),
                post=("gelu", "drop_first", 0.0),
            ) ** 2
        ).sum()
        f_x = lambda *a: (_xla_head(*a) ** 2).sum()

    gp = jax.grad(f_p, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3, 4))(x, k1, b1, k2, b2)
    for name, a, b in zip(("x", "w1", "b1", "w2", "b2"), gp, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_generator_fused_mlp_integration():
    """TextGenerator with the fused MLP head+FFN (interpret mode) == the XLA
    path, forward AND parameter grads."""
    from gan_ffn_tpu.models import TextGenerator
    from gan_ffn_tpu.ops.config import use_pallas_mlp

    L, B, vl = 14, 3, 10
    m = TextGenerator(D_h=100, num_layers=1)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    valid = jnp.asarray(vl, jnp.int32)

    def loss(p, on):
        with use_pallas_mlp(on):
            out = m.apply({"params": p}, x, valid_len=valid, deterministic=True)
        return (out[:vl] ** 2).sum(), out

    (l_x, out_x), g_x = jax.value_and_grad(lambda p: loss(p, False), has_aux=True)(params)
    (l_p, out_p), g_p = jax.value_and_grad(lambda p: loss(p, True), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(out_p)[:vl], np.asarray(out_x)[:vl],
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)


@pytest.mark.tpu_hardware
def test_fused_mlp_dropout_tpu():
    """TPU-gated dropout semantics for the fused MLP: seed-reproducible,
    seed-sensitive, mean-preserving."""
    from gan_ffn_tpu.ops.mlp import fused_mlp

    dev = _tpu_device()
    if dev is None:
        pytest.skip("no TPU device reachable")
    rng = np.random.default_rng(14)
    K, H, N = 100, 256, 100
    with jax.default_device(dev):
        x = jnp.asarray(rng.normal(size=(40, 2, K)).astype(np.float32))
        k1 = jnp.asarray(rng.normal(size=(K, H)).astype(np.float32) * 0.05)
        b1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32) * 0.05)
        k2 = jnp.asarray(rng.normal(size=(H, N)).astype(np.float32) * 0.05)
        b2 = jnp.asarray(rng.normal(size=(N,)).astype(np.float32) * 0.05)

        def run(seed, rate):
            return np.asarray(
                fused_mlp(
                    x, k1, b1, k2, b2,
                    pre=("gelu", rate), mid=("gelu", "drop_first", rate),
                    post=("gelu", "drop_first", rate),
                    dropout_seed=jnp.asarray(seed),
                )
            )

        o1, o1b, o2 = run(1, 0.3), run(1, 0.3), run(2, 0.3)
        base = run(0, 0.0)
        mean = np.mean([run(s, 0.3) for s in range(24)], axis=0)
    np.testing.assert_array_equal(o1, o1b)
    assert not np.allclose(o1, o2)
    # gelu is nonlinear so the mean only TRACKS the deterministic output
    err = np.abs(mean - base).mean() / (np.abs(base).mean() + 1e-9)
    assert err < 0.6, f"24-seed mean deviates {err:.2%}"
