"""AOT executable cache tests: single-device and mesh-sharded disk round
trips, placement inference from args, dispatch keying, donation, LRU
pruning, and classifier-step equivalence vs plain jit. The conftest points
GANFFN_EXEC_CACHE at a throwaway dir."""

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


def test_cached_compile_multi_device_roundtrip(tmp_path, caplog, monkeypatch):
    """Sharded executables serialize to disk and reload onto the same mesh
    devices (deserialize_and_load(execution_devices=...))."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
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


def test_cached_compile_infers_single_device_placement(tmp_path, monkeypatch):
    """No devices hint: a program whose args all live on one device caches
    against exactly that device, even on the 8-device host (and regardless of
    which platform plugin owns jax.devices()[0])."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")

    def f(a):
        return a + 1.0

    x = jax.device_put(jnp.ones((4,)), jax.devices("cpu")[0])
    c = cached_compile(f, (x,), salt="nodev", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(c(x)), 2.0)
    assert any(p.suffix == ".jaxexec" for p in tmp_path.iterdir())
    c2 = cached_compile(f, (x,), salt="nodev", cache_dir=str(tmp_path))
    out = c2(x)
    np.testing.assert_allclose(np.asarray(out), 2.0)
    assert out.sharding.device_set == {jax.devices("cpu")[0]}


def test_cached_compile_ambiguous_placement_bypasses_cache(tmp_path, monkeypatch):
    """Args spanning several devices without an explicit devices list:
    compile, don't cache (a set loses the mesh order deserialization needs)."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices("cpu")[:2]
    mesh = Mesh(np.array(devs), ("data",))
    x = jax.device_put(jnp.ones((4, 2)), NamedSharding(mesh, P("data")))

    def f(a):
        return a * 2.0

    c = cached_compile(f, (x,), salt="ambig", cache_dir=str(tmp_path))
    np.testing.assert_allclose(np.asarray(c(x)), 2.0)
    assert not any(p.suffix == ".jaxexec" for p in tmp_path.iterdir())


def test_sig_argnums_out_of_range_fails_fast():
    """A sig_argnums index beyond the function's positional arity is a
    construction-time error, not a silently weakened dispatch key; indices
    covering optional trailing args (lr_scale) remain valid."""

    def f(state, rng, batch, lr_scale=1.0):
        return state

    ShapeDispatchingAOT(f, sig_argnums=(1, 2, 3))  # ok: 3 is lr_scale
    with pytest.raises(ValueError, match=r"sig_argnums \[4\]"):
        ShapeDispatchingAOT(f, sig_argnums=(1, 4))


def test_aot_donation():
    def f(state, x):
        return {"v": state["v"] + x}, (state["v"] * 0).sum()

    wrapper = ShapeDispatchingAOT(f, salt="test3", donate_argnums=(0,))
    state = {"v": jnp.ones((16, 16))}
    x = jnp.ones((16, 16))
    state2, aux = wrapper(state, x)
    np.testing.assert_array_equal(np.asarray(state2["v"]), 2 * np.ones((16, 16)))


@pytest.mark.slow
def test_classifier_steps_aot_matches_jit(tmp_path, monkeypatch):
    """make_classifier_steps(aot_cache=True) is numerically identical to the
    plain-jit path, for both the 3-arg call and the 4-arg lr_scale call
    (separate dispatch signatures)."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE", str(tmp_path))
    from gan_ffn_tpu.models import GAN_FFN
    from gan_ffn_tpu.train.classifier import init_classifier_state, make_classifier_steps
    from gan_ffn_tpu.train.optim import torch_adam

    L, B = 6, 4
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    rng = np.random.default_rng(9)
    batch = {
        "text": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "umask": jnp.asarray(np.ones((B, L), dtype=np.float32)),
        "label": jnp.asarray(rng.integers(0, 6, size=(B, L))),
        "valid_len": jnp.asarray(L, dtype=jnp.int32),
        "n_real": jnp.asarray(B, dtype=jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
    )["params"]

    def apply_train(p, r, b):
        return model.apply(
            {"params": p}, b["audio"], b["visual"], b["text"],
            valid_len=b["valid_len"], deterministic=False, rngs={"dropout": r},
        )[0]

    def apply_eval(p, b):
        return model.apply(
            {"params": p}, b["audio"], b["visual"], b["text"],
            valid_len=b["valid_len"], deterministic=True,
        )[0]

    opt = torch_adam(1e-4, weight_decay=0.008)
    key = jax.random.PRNGKey(3)

    results = {}
    for aot in (False, True):
        train_step, eval_step = make_classifier_steps(
            apply_train, apply_eval, opt, 6, aot_cache=aot
        )
        state = init_classifier_state(
            jax.tree.map(lambda x: jnp.array(np.asarray(x)), params), opt
        )
        state, loss1, _ = train_step(state, key, batch)
        state, loss2, _ = train_step(state, key, batch, 0.5)  # lr_scale arity
        eloss, _ = eval_step(state["params"], batch)
        results[aot] = (float(loss1), float(loss2), float(eloss), state["params"])

    assert results[False][0] == pytest.approx(results[True][0], rel=1e-6)
    assert results[False][1] == pytest.approx(results[True][1], rel=1e-6)
    assert results[False][2] == pytest.approx(results[True][2], rel=1e-6)
    for a, b in zip(
        jax.tree.leaves(results[False][3]), jax.tree.leaves(results[True][3])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_cache_pruning_evicts_lru(tmp_path, monkeypatch):
    """Entries beyond GANFFN_EXEC_CACHE_MAX_GB are evicted oldest-first; the
    just-written entry survives."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_MAX_GB", "0.000001")  # 1 kB
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")

    import os
    import time

    dev = jax.devices("cpu")[0]
    x = jax.device_put(jnp.ones((64, 64)), dev)
    paths = []
    for i in range(3):
        salt = f"prune{i}"
        cached_compile(lambda a, k=i: a + k, (x,), salt=salt, cache_dir=str(tmp_path))
        entries = sorted(tmp_path.glob("*.jaxexec"), key=lambda p: p.stat().st_mtime)
        paths.append(entries[-1])
        time.sleep(0.01)
        os.utime(entries[-1])  # distinct access times

    remaining = set(tmp_path.glob("*.jaxexec"))
    # each entry far exceeds 1 kB, so only the most recent write survives
    assert paths[-1] in remaining
    assert len(remaining) == 1


def test_cache_key_distinguishes_dead_args(tmp_path, monkeypatch):
    """Regression: a computation that uses only its args' SHAPES (like
    model.init) lowers to IDENTICAL HLO for different batch sizes — XLA drops
    the dead args from the module signature — so the cache key must hash the
    argument avals independently of the lowered text. Without that, a 4-batch
    init executable is served for a 32-batch call and fails aval validation."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
    dev = jax.devices("cpu")[0]

    def shape_only(a):
        return jnp.zeros((a.shape[1],))  # uses the shape, not the values

    x4 = jax.device_put(jnp.ones((8, 4)), dev)
    x32 = jax.device_put(jnp.ones((8, 32)), dev)
    c4 = cached_compile(shape_only, (x4,), salt="dead", cache_dir=str(tmp_path))
    assert np.asarray(c4(x4)).shape == (4,)
    c32 = cached_compile(shape_only, (x32,), salt="dead", cache_dir=str(tmp_path))
    assert np.asarray(c32(x32)).shape == (32,)  # collided pre-fix: TypeError
    assert len(list(tmp_path.glob("*.jaxexec"))) == 2


def test_cache_key_distinguishes_out_tree(tmp_path, monkeypatch):
    """Regression: pytree nodes with ZERO array leaves (empty attention
    dicts/lists) contribute no XLA outputs, so an eval step returning
    ``(loss, preds)`` and one returning ``(loss, preds, {})`` lower to
    byte-identical HLO with identical avals — but deserialization rebuilds
    results with the out_tree STORED in the entry. Pre-fix the second load
    collided with the first entry and replayed the 2-tuple protocol
    (run_epoch's ``loss, preds, attn = eval_step(...)`` crashed on TPU where
    the disk cache is on by default; tests/CI missed it because the CPU cache
    is opt-in). The key now hashes the output pytree structure."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
    dev = jax.devices("cpu")[0]

    def two_tuple(x):
        return x.sum(), x * 2.0

    def three_tuple_empty_attn(x):  # identical HLO: {} adds no outputs
        return x.sum(), x * 2.0, {}

    x = jax.device_put(jnp.ones((4, 3)), dev)
    c2 = cached_compile(two_tuple, (x,), salt="ot", cache_dir=str(tmp_path))
    assert len(c2(x)) == 2
    c3 = cached_compile(
        three_tuple_empty_attn, (x,), salt="ot", cache_dir=str(tmp_path)
    )
    loss, preds, attn = c3(x)  # collided pre-fix: ValueError on unpack
    assert attn == {}
    assert float(loss) == pytest.approx(12.0)
    assert len(list(tmp_path.glob("*.jaxexec"))) == 2


def test_corrupt_cache_entry_recovers_at_first_call(tmp_path, monkeypatch):
    """Regression: XLA:CPU AOT entries can deserialize cleanly yet fail at
    DISPATCH (observed: 'Function bitcast_slice_fusion.1 not found' driving
    the flagship CLI with GANFFN_EXEC_CACHE_CPU=1). For non-donating
    programs the loader wraps the cached executable so the first call falls
    back to a fresh compile and evicts the bad entry instead of crashing."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
    dev = jax.devices("cpu")[0]

    def f(x):
        return x * 3.0

    x = jax.device_put(jnp.ones((4,)), dev)
    c1 = cached_compile(f, (x,), salt="corrupt", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(c1(x)), 3 * np.ones((4,)))
    (entry,) = tmp_path.glob("*.jaxexec")

    from jax.experimental import serialize_executable as se

    class _BoobyTrapped:
        def __call__(self, *args):
            raise RuntimeError("Function bitcast_slice_fusion.1 not found")

    monkeypatch.setattr(
        se, "deserialize_and_load", lambda *a, **k: _BoobyTrapped()
    )
    c2 = cached_compile(f, (x,), salt="corrupt", cache_dir=str(tmp_path))
    # first call hits the booby trap, recompiles, and still returns the result
    np.testing.assert_array_equal(np.asarray(c2(x)), 3 * np.ones((4,)))
    assert not entry.exists()  # the corrupt entry was evicted
    # subsequent calls go straight to the recompiled executable
    np.testing.assert_array_equal(np.asarray(c2(x)), 3 * np.ones((4,)))
    # a .bad sentinel marks the key so later processes neither load NOR
    # re-store it — without it the cache oscillates: the next fresh process
    # would re-serialize the same corrupt-on-reload bytes forever
    assert list(tmp_path.glob("*.jaxexec.bad"))
    c3 = cached_compile(f, (x,), salt="corrupt", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(c3(x)), 3 * np.ones((4,)))
    assert not list(tmp_path.glob("*.jaxexec"))  # sentinel blocked the re-store


def test_corrupt_donating_entry_validated_at_load(tmp_path, monkeypatch):
    """Donating programs (the big train steps) cannot retry a failed REAL
    call — donation may already have consumed the caller's buffers — so
    cache-loaded donating executables are validated EAGERLY at load time on
    zero-filled dummies the loader owns (observed in the field: a corrupt
    cached classifier train step crashed the DialogueRNN CLI at
    run_epoch's device_get, past any per-call recovery)."""
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
    dev = jax.devices("cpu")[0]

    def f(x):
        return x + 1.0

    x = jax.device_put(jnp.ones((4,)), dev)
    c1 = cached_compile(
        f, (x,), salt="corrupt-donate", donate_argnums=(0,), cache_dir=str(tmp_path)
    )
    np.testing.assert_array_equal(np.asarray(c1(x)), 2 * np.ones((4,)))
    (entry,) = tmp_path.glob("*.jaxexec")

    from jax.experimental import serialize_executable as se

    class _BoobyTrapped:
        def __call__(self, *args):
            raise RuntimeError("Function wrapped_broadcast.20 not found")

    monkeypatch.setattr(se, "deserialize_and_load", lambda *a, **k: _BoobyTrapped())
    x2 = jax.device_put(jnp.ones((4,)), dev)
    c2 = cached_compile(
        f, (x2,), salt="corrupt-donate", donate_argnums=(0,), cache_dir=str(tmp_path)
    )
    # validation already happened at load: the returned executable is the
    # in-process recompile, the entry is evicted and sentinel-marked, and
    # the caller's buffer was NOT consumed by the failed validation call
    assert not entry.exists()
    assert list(tmp_path.glob("*.jaxexec.bad"))
    np.testing.assert_array_equal(np.asarray(c2(x2)), 2 * np.ones((4,)))
