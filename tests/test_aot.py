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


def test_cached_compile_multi_device_roundtrip(tmp_path, caplog):
    """Sharded executables serialize to disk and reload onto the same mesh
    devices (deserialize_and_load(execution_devices=...))."""
    import logging

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices("cpu")[:4]
    mesh = Mesh(np.array(devs), ("data",))
    x = jax.device_put(
        jnp.arange(16.0).reshape(8, 2), NamedSharding(mesh, P("data"))
    )

    def f(a):
        return (a * 3.0).sum(axis=1)

    expected = np.asarray(x).sum(axis=1) * 3.0
    cache_dir = str(tmp_path)
    c1 = cached_compile(f, (x,), salt="multidev", cache_dir=cache_dir, devices=devs)
    np.testing.assert_allclose(np.asarray(c1(x)), expected, rtol=1e-6)
    entries = [p for p in tmp_path.iterdir() if p.suffix == ".jaxexec"]
    assert len(entries) == 1, "sharded executable was not written to the cache"

    with caplog.at_level(logging.INFO, logger="gan_ffn_tpu.utils.aot"):
        c2 = cached_compile(f, (x,), salt="multidev", cache_dir=cache_dir, devices=devs)
    assert any("loaded cached executable" in r.message for r in caplog.records)
    out = c2(x)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)
    # the reloaded executable must keep the mesh placement
    assert out.sharding.device_set == set(devs)


def test_cached_compile_multi_device_host_without_devices_bypasses_cache(tmp_path):
    """No devices hint on a multi-device host => compile, don't cache."""

    def f(a):
        return a + 1.0

    x = jnp.ones((4,))
    c = cached_compile(f, (x,), salt="nodev", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(c(x)), 2.0)
    assert not any(p.suffix == ".jaxexec" for p in tmp_path.iterdir())


def test_aot_donation():
    def f(state, x):
        return {"v": state["v"] + x}, (state["v"] * 0).sum()

    wrapper = ShapeDispatchingAOT(f, salt="test3", donate_argnums=(0,))
    state = {"v": jnp.ones((16, 16))}
    x = jnp.ones((16, 16))
    state2, aux = wrapper(state, x)
    np.testing.assert_array_equal(np.asarray(state2["v"]), 2 * np.ones((16, 16)))
