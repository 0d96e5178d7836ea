"""Mesh tests on the 8-device virtual CPU mesh: DP numerical equivalence and
the multi-seed sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.models import GAN_FFN
from gan_ffn_tpu.parallel import make_mesh, replicate, shard_batch
from gan_ffn_tpu.parallel.sweep import (
    init_seed_sweep,
    make_grid_mesh,
    make_seed_mesh,
    make_sweep_train_step,
)
from gan_ffn_tpu.train.classifier import init_classifier_state, make_classifier_steps
from gan_ffn_tpu.train.optim import torch_adam

L, B = 16, 8  # B divisible by 8 devices


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "umask": jnp.asarray((rng.random((B, L)) > 0.2).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 6, size=(B, L))),
        "valid_len": jnp.asarray(L, dtype=jnp.int32),
        "n_real": jnp.asarray(B, dtype=jnp.int32),
    }


def _steps(model):
    def apply_train(p, rng, batch):
        return model.apply(
            {"params": p}, batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=False, rngs={"dropout": rng},
        )[0]

    def apply_eval(p, batch):
        return model.apply(
            {"params": p}, batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=True,
        )[0]

    opt = torch_adam(1e-3)
    return make_classifier_steps(apply_train, apply_eval, opt, 6), opt


def test_eight_cpu_devices_available(cpu_devices):
    assert len(cpu_devices) == 8


def test_dp_eval_matches_single_device(cpu_devices):
    """Batch-sharded eval == single-device eval, bitwise-close."""
    mesh = make_mesh(cpu_devices)
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
    )["params"]
    (train_step, eval_step), opt = _steps(model)

    loss_single, preds_single = eval_step(params, batch)

    params_r = replicate(params, mesh)
    sharded = shard_batch(batch, mesh)
    loss_dp, preds_dp = eval_step(params_r, sharded)

    assert float(loss_dp) == pytest.approx(float(loss_single), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(preds_dp), np.asarray(preds_single))


def test_dp_train_step_matches_single_device(cpu_devices):
    """One DP train step produces the same params as single-device (global
    masked loss => identical gradients; this is what nn.DataParallel broke)."""
    mesh = make_mesh(cpu_devices)
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _batch()
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
    )["params"]
    (train_step, eval_step), opt = _steps(model)

    # the train step donates its input state; give each run its own copy
    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    state1 = init_classifier_state(params, opt)
    state1, loss1, _ = train_step(state1, jax.random.PRNGKey(7), batch)

    state2 = init_classifier_state(replicate(params_copy, mesh), opt)
    state2 = {"params": state2["params"], "opt": replicate(state2["opt"], mesh)}
    state2, loss2, _ = train_step(state2, jax.random.PRNGKey(7), shard_batch(batch, mesh))

    assert float(loss2) == pytest.approx(float(loss1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(state1["params"]), jax.tree.leaves(state2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_gan_dp_step_matches_single_device(cpu_devices, tmp_path, monkeypatch):
    """The fused 12-duel stage-A step is numerically equivalent under mesh DP
    (the stage the reference wraps in nn.DataParallel and that DEGRADED its
    accuracy, train_IEMOCAP.py:588-593 / README.md:83). The DP step runs with
    the AOT executable cache ON, covering the multi-device serialize path."""
    from gan_ffn_tpu.train.gan import GANConfig, init_gan_state, make_gan_train_step

    monkeypatch.setenv("GANFFN_EXEC_CACHE", str(tmp_path))
    monkeypatch.setenv("GANFFN_EXEC_CACHE_CPU", "1")
    cfg = GANConfig(num_layers=1, aot_cache=False)
    cfg_dp = GANConfig(num_layers=1, aot_cache=True)
    mesh = make_mesh(cpu_devices)
    rng = np.random.default_rng(5)
    gl, gb = 8, 8  # batch divisible by the 8 devices
    batch = {
        "text": jnp.asarray(rng.normal(size=(gl, gb, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(gl, gb, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(gl, gb, 100)).astype(np.float32)),
        "valid_len": jnp.asarray(gl, dtype=jnp.int32),
        "n_real": jnp.asarray(gb, dtype=jnp.int32),
    }
    state = init_gan_state(cfg, jax.random.PRNGKey(0))
    state_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), state)
    key = jax.random.PRNGKey(11)

    step_single = make_gan_train_step(cfg)
    state1, losses1 = step_single(state, batch, key)

    step_dp = make_gan_train_step(cfg_dp, mesh=mesh)
    state2, losses2 = step_dp(
        replicate(state_copy, mesh), shard_batch(batch, mesh), key
    )

    from gan_ffn_tpu.train.gan import LOGGED_LOSS_KEYS

    for k in LOGGED_LOSS_KEYS:
        assert float(losses2[k]) == pytest.approx(float(losses1[k]), rel=1e-5), k
    for a, b in zip(
        jax.tree.leaves(state1["params"]), jax.tree.leaves(state2["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # the mesh-sharded 12-duel executable was serialized to the disk cache
    assert any(p.suffix == ".jaxexec" for p in tmp_path.iterdir())


@pytest.mark.slow
def test_dp_train_step_matches_single_device_depth2(cpu_devices):
    """DP equivalence holds at encoder depth >= 2 (the round-2 suite only
    ever exercised num_layers=1; depth changes XLA's fusion/reduction
    structure, so equivalence at depth 1 does not imply it at depth 8)."""
    mesh = make_mesh(cpu_devices)
    model = GAN_FFN(n_classes=6, gen_num_layers=2)
    batch = _batch(3)
    params = model.init(
        jax.random.PRNGKey(21), batch["audio"], batch["visual"], batch["text"]
    )["params"]
    (train_step, eval_step), opt = _steps(model)

    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    state1 = init_classifier_state(params, opt)
    state1, loss1, _ = train_step(state1, jax.random.PRNGKey(8), batch)

    state2 = init_classifier_state(replicate(params_copy, mesh), opt)
    state2 = {"params": state2["params"], "opt": replicate(state2["opt"], mesh)}
    state2, loss2, _ = train_step(state2, jax.random.PRNGKey(8), shard_batch(batch, mesh))

    assert float(loss2) == pytest.approx(float(loss1), rel=1e-5)
    # atol 3e-4: the deeper program reorders more reductions, and Adam's
    # m/(sqrt(v)+eps) normalization amplifies ulp-level gradient differences
    # near zero-crossings (observed max 1.5e-5 over 2/204800 elements)
    for a, b in zip(jax.tree.leaves(state1["params"]), jax.tree.leaves(state2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-4)


@pytest.mark.slow
def test_gan_stepwise_dp_matches_single_device_partial_batch(cpu_devices):
    """The per-duel schedule (fused_schedule=False) under a mesh, on a
    PARTIAL final batch (n_real < batch_size) with padded timesteps
    (valid_len < L): the masked BCE means must be computed globally under
    sharding, so per-duel DP losses and the updated params match the
    single-device step exactly. Covers the train/gan.py:203-221 constraint
    path that the fused-program tests never touch."""
    from gan_ffn_tpu.train.gan import GANConfig, LOGGED_LOSS_KEYS, init_gan_state, make_gan_train_step

    cfg = GANConfig(num_layers=1, fused_schedule=False, aot_cache=False)
    mesh = make_mesh(cpu_devices)
    rng = np.random.default_rng(17)
    gl, gb = 10, 8  # batch divisible by the 8 devices
    batch = {
        "text": jnp.asarray(rng.normal(size=(gl, gb, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(gl, gb, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(gl, gb, 100)).astype(np.float32)),
        "valid_len": jnp.asarray(7, dtype=jnp.int32),  # padded timesteps
        "n_real": jnp.asarray(5, dtype=jnp.int32),  # padding dialogue columns
    }
    state = init_gan_state(cfg, jax.random.PRNGKey(1))
    state_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), state)
    key = jax.random.PRNGKey(23)

    state1, losses1 = make_gan_train_step(cfg)(state, batch, key)
    state2, losses2 = make_gan_train_step(cfg, mesh=mesh)(
        replicate(state_copy, mesh), shard_batch(batch, mesh), key
    )

    for i in range(12):
        assert float(losses2[f"duel_{i}"]) == pytest.approx(
            float(losses1[f"duel_{i}"]), rel=1e-5
        ), f"duel_{i}"
    for k in LOGGED_LOSS_KEYS:
        assert float(losses2[k]) == pytest.approx(float(losses1[k]), rel=1e-5), k
    # atol 3e-4: same Adam zero-crossing amplification as the depth-2 test
    # (observed max 9.9e-5 over 5/51200 elements under sharded reductions)
    for a, b in zip(
        jax.tree.leaves(state1["params"]), jax.tree.leaves(state2["params"])
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=3e-4)


def _qmask(seed, n_party=2):
    rng = np.random.default_rng(seed)
    party = rng.integers(0, n_party, size=(L, B))
    return jnp.asarray(np.eye(n_party, dtype=np.float32)[party])


@pytest.mark.slow
def test_dialoguernn_dp_train_step_matches_single_device(cpu_devices):
    """DP equivalence for the recurrent flagship: one GAN_FFN_DialogueRNN
    train step (generators -> fusion -> BiModel fwd/rev scans -> att2) on the
    8-device mesh produces the same loss and params as single-device. This is
    the hardest model under batch sharding — the scan's fixed-size g_hist
    buffer (models/dialogue_rnn.py:45-57), the one-hot party select, and the
    masked take_along_axis reversal (models/dialogue_rnn.py:146) all carry
    the sharded batch axis through lax.scan; every prior DP test only covered
    the feed-forward GAN_FFN."""
    from gan_ffn_tpu.models import GAN_FFN_DialogueRNN

    mesh = make_mesh(cpu_devices)
    kwargs = dict(
        D_m=100, D_g=64, D_p=64, D_e=32, D_h=100, D_a=32,
        n_classes=6, gen_num_layers=1,
    )
    model_train = GAN_FFN_DialogueRNN(**kwargs, deterministic=False)
    model_eval = GAN_FFN_DialogueRNN(**kwargs, deterministic=True)
    batch = dict(_batch(41), qmask=_qmask(42))
    params = model_eval.init(
        jax.random.PRNGKey(31), batch["audio"], batch["visual"], batch["text"],
        batch["qmask"], batch["umask"],
    )["params"]

    def apply_train(p, rng, b):
        return model_train.apply(
            {"params": p}, b["audio"], b["visual"], b["text"],
            b["qmask"], b["umask"], valid_len=b["valid_len"],
            rngs={"dropout": rng},
        )[0]

    def apply_eval(p, b):
        return model_eval.apply(
            {"params": p}, b["audio"], b["visual"], b["text"],
            b["qmask"], b["umask"], valid_len=b["valid_len"],
        )[0]

    lr = 1e-3
    opt = torch_adam(lr)
    train_step, eval_step = make_classifier_steps(apply_train, apply_eval, opt, 6)

    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)

    # eval parity on identical params: the reversal + attention path without
    # dropout must agree bitwise-close under batch sharding
    eloss1, epreds1 = eval_step(params, batch)
    eloss2, epreds2 = eval_step(replicate(params_copy, mesh), shard_batch(batch, mesh))
    assert float(eloss2) == pytest.approx(float(eloss1), rel=1e-5)
    np.testing.assert_array_equal(np.asarray(epreds2), np.asarray(epreds1))

    state1 = init_classifier_state(params, opt)
    state1, loss1, _ = train_step(state1, jax.random.PRNGKey(13), batch)

    state2 = init_classifier_state(replicate(params_copy, mesh), opt)
    state2 = {"params": state2["params"], "opt": replicate(state2["opt"], mesh)}
    state2, loss2, _ = train_step(
        state2, jax.random.PRNGKey(13), shard_batch(batch, mesh)
    )

    assert float(loss2) == pytest.approx(float(loss1), rel=1e-5)
    # Two-tier parameter check. The deep scan program reorders many more
    # float32 reductions than the feed-forward tests; where a tiny gradient's
    # SIGN flips at the ulp level, torch-Adam's m/(sqrt(v)+eps) normalization
    # turns it into a full +/-lr first step, so the worst-case single-step
    # delta is ~2*lr regardless of how close the gradients are. Assert (a)
    # every element is inside that principled 2.5*lr bound, and (b) the
    # fraction of elements beyond the ordinary reduction tolerance 3e-4 is
    # ulp-rare (observed: 71 / 1,317,390 = 5.4e-5), far from the systematic
    # divergence of the reference's DataParallel (README.md:83).
    n_loose = n_total = 0
    for a, b in zip(jax.tree.leaves(state1["params"]), jax.tree.leaves(state2["params"])):
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.max() <= 2.5 * lr, f"param delta {d.max()} exceeds the Adam step bound"
        n_loose += int((d > 3e-4).sum())
        n_total += d.size
    assert n_loose <= 2e-4 * n_total, (
        f"{n_loose}/{n_total} elements beyond reduction tolerance"
    )


@pytest.mark.slow
def test_meld_dp_train_step_matches_single_device(cpu_devices):
    """DP equivalence for the MELD entry's model: one MELDLSTMModel train
    step (4-layer BiLSTM scans + batched general2 MatchingAttention +
    hardswish residual) on the mesh matches single-device, with a partial
    final batch's padded umask columns in play (the loader's fixed-bucket
    padding means real deployments always hit this)."""
    from gan_ffn_tpu.models import MELDLSTMModel

    mesh = make_mesh(cpu_devices)
    model = MELDLSTMModel(D_m=32, D_e=16, D_h=16, n_classes=7)
    rng = np.random.default_rng(51)
    batch = {
        "text": jnp.asarray(rng.normal(size=(L, B, 32)).astype(np.float32)),
        "qmask": _qmask(52, n_party=9),
        "umask": jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 7, size=(B, L))),
        "valid_len": jnp.asarray(L, dtype=jnp.int32),
        "n_real": jnp.asarray(B, dtype=jnp.int32),
    }
    # zero out one dialogue column entirely (padding row of a partial batch)
    batch["umask"] = batch["umask"].at[B - 1].set(0.0)
    params = model.init(
        jax.random.PRNGKey(61), batch["text"], batch["qmask"], batch["umask"]
    )["params"]

    def apply_train(p, rng, b):
        return model.apply(
            {"params": p}, b["text"], b["qmask"], b["umask"],
            deterministic=False, rngs={"dropout": rng},
        )[0]

    def apply_eval(p, b):
        return model.apply(
            {"params": p}, b["text"], b["qmask"], b["umask"], deterministic=True
        )[0]

    opt = torch_adam(1e-3)
    train_step, eval_step = make_classifier_steps(apply_train, apply_eval, opt, 7)

    params_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    state1 = init_classifier_state(params, opt)
    state1, loss1, _ = train_step(state1, jax.random.PRNGKey(71), batch)

    state2 = init_classifier_state(replicate(params_copy, mesh), opt)
    state2 = {"params": state2["params"], "opt": replicate(state2["opt"], mesh)}
    state2, loss2, _ = train_step(
        state2, jax.random.PRNGKey(71), shard_batch(batch, mesh)
    )

    assert float(loss2) == pytest.approx(float(loss1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(state1["params"]), jax.tree.leaves(state2["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_multi_seed_sweep(cpu_devices):
    """8 seeds train in one vmapped step; different seeds diverge."""
    mesh = make_seed_mesh(cpu_devices)
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _batch()
    (train_step, eval_step), opt = _steps(model)

    def init_fn(key):
        params = model.init(key, batch["audio"], batch["visual"], batch["text"])["params"]
        return init_classifier_state(params, opt)

    seeds = list(range(8))
    stacked = init_seed_sweep(init_fn, seeds, mesh)
    sweep_step = make_sweep_train_step(train_step, mesh)
    rngs = jnp.stack([jax.random.PRNGKey(100 + s) for s in seeds])
    stacked, losses, preds = sweep_step(stacked, rngs, batch)
    losses = np.asarray(losses)
    assert losses.shape == (8,)
    assert np.isfinite(losses).all()
    assert len(np.unique(losses.round(6))) > 1  # seeds diverge
    assert preds.shape == (8, B * L)


@pytest.mark.slow
def test_grid_mesh_sweep_matches_seed_mesh(cpu_devices):
    """2 seeds x 4-way DP on the (seed, data) grid mesh produce the SAME
    per-seed losses and params as the pure 1-D seed mesh (data sharding is
    numerically transparent)."""
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _batch()
    (train_step, eval_step), opt = _steps(model)

    def init_fn(key):
        params = model.init(key, batch["audio"], batch["visual"], batch["text"])["params"]
        return init_classifier_state(params, opt)

    seeds = [0, 1]
    rngs = jnp.stack([jax.random.PRNGKey(100 + s) for s in seeds])

    mesh_1d = make_seed_mesh(cpu_devices[: len(seeds)])
    stacked_1d = init_seed_sweep(init_fn, seeds, mesh_1d)
    step_1d = make_sweep_train_step(train_step, mesh_1d)
    stacked_1d, losses_1d, preds_1d = step_1d(stacked_1d, rngs, batch)

    grid = make_grid_mesh(n_seed=len(seeds), devices=cpu_devices)
    assert dict(grid.shape) == {"seed": 2, "data": 4}
    stacked_2d = init_seed_sweep(init_fn, seeds, grid)
    step_2d = make_sweep_train_step(train_step, grid)
    stacked_2d, losses_2d, preds_2d = step_2d(stacked_2d, rngs, batch)

    np.testing.assert_allclose(
        np.asarray(losses_2d), np.asarray(losses_1d), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(preds_2d), np.asarray(preds_1d))
    for a, b in zip(jax.tree.leaves(stacked_1d["params"]), jax.tree.leaves(stacked_2d["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
