"""AOT executable cache tests (CPU: multi-device guard => no disk cache, but
the wrapper must still compile/dispatch correctly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.utils.aot import ShapeDispatchingAOT, cached_compile


def test_cached_compile_runs():
    def f(x, y):
        return (x @ y).sum()

    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32))
    compiled = cached_compile(f, (x, x), salt="test")
    expected = float((np.asarray(x) @ np.asarray(x)).sum())
    assert float(compiled(x, x)) == pytest.approx(expected, rel=1e-5)


def test_shape_dispatching_aot():
    calls = []

    def f(x):
        calls.append(x.shape)
        return x * 2.0

    wrapper = ShapeDispatchingAOT(f, salt="test2")
    a = jnp.ones((4, 4))
    b = jnp.ones((8, 8))
    np.testing.assert_array_equal(np.asarray(wrapper(a)), 2 * np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(wrapper(b)), 2 * np.ones((8, 8)))
    np.testing.assert_array_equal(np.asarray(wrapper(a)), 2 * np.ones((4, 4)))
    # two distinct compilations (trace per shape), third call reuses
    assert len(wrapper._compiled) == 2


def test_aot_donation():
    def f(state, x):
        return {"v": state["v"] + x}, (state["v"] * 0).sum()

    wrapper = ShapeDispatchingAOT(f, salt="test3", donate_argnums=(0,))
    state = {"v": jnp.ones((16, 16))}
    x = jnp.ones((16, 16))
    state2, aux = wrapper(state, x)
    np.testing.assert_array_equal(np.asarray(state2["v"]), 2 * np.ones((16, 16)))
