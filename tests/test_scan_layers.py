"""Scan-over-layers encoder: equivalence with the unrolled stack.

``TransformerEncoder`` has two structurally different renditions of the same
math (nn/transformer.py): the default unrolled per-layer children
(``layers_i`` — the torch-checkpoint-shaped tree used by every transplant
test) and an opt-in ``nn.scan`` over stacked layer params
(``GANFFN_SCAN_LAYERS`` / ``GANConfig.scan_layers``), built to shrink the
traced program ~num_layers× and with it the hosted remote-compile cost of
the fused 12-duel stage-A step (reference stage: train_IEMOCAP.py:255-393).

These tests pin what the scan path promises:
- converting a tree between layouts is a pure stack/unstack round-trip;
- deterministic forward AND backward are equivalent to the unrolled stack
  (float32 reduction-order tolerance — the op sequence is identical, only
  XLA's scheduling differs);
- the full 12-duel GAN step at dropout=0 produces the same duel losses and
  updated params under either layout;
- the AOT-cache salt (``str(GANConfig)``) is byte-stable for configs that
  do not set the new field, so adding the knob did not re-key (= force a
  multi-minute recompile of) every previously cached executable.

Dropout>0 trajectories are NOT equivalent across layouts by design: scan
splits the dropout rng per step while the unrolled stack folds per module
path (see ops/config.py module doc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.nn.transformer import (
    TransformerEncoder,
    stack_layer_params,
    unstack_layer_params,
)
from gan_ffn_tpu.ops.config import use_scan_layers

L, B, D = 10, 4, 16


def _encoder():
    return TransformerEncoder(
        d_model=D, nhead=4, num_layers=3, dim_feedforward=32, dropout=0.1
    )


def _x(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(L, B, D)).astype(np.float32))


def test_converter_round_trip_and_structure():
    enc = _encoder()
    x = _x()
    p = enc.init(jax.random.PRNGKey(0), x)["params"]
    stacked = stack_layer_params(p)
    assert set(stacked.keys()) == {"layers"}
    k = stacked["layers"]["self_attn"]["in_proj_kernel"]
    assert k.shape == (3, D, 3 * D)
    back = unstack_layer_params(stacked)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(p)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(p)):
        assert jnp.array_equal(a, b)


def test_scanned_init_structure_and_per_layer_diversity():
    enc = _encoder()
    x = _x()
    with use_scan_layers(True):
        p = enc.init(jax.random.PRNGKey(0), x)["params"]
    assert set(p.keys()) == {"layers"}
    k = p["layers"]["self_attn"]["in_proj_kernel"]
    assert k.shape == (3, D, 3 * D)
    # split_rngs={"params": True}: each scanned layer gets its own init draw
    assert not jnp.array_equal(k[0], k[1])
    # and the scanned apply accepts its own init
    with use_scan_layers(True):
        y = enc.apply({"params": p}, x, deterministic=True)
    assert np.isfinite(np.asarray(y)).all()


def test_scanned_forward_matches_unrolled():
    enc = _encoder()
    x = _x()
    p = enc.init(jax.random.PRNGKey(0), x)["params"]
    y_unrolled = enc.apply(
        {"params": p}, x, valid_len=jnp.asarray(L - 1), deterministic=True
    )
    with use_scan_layers(True):
        y_scan = enc.apply(
            {"params": stack_layer_params(p)},
            x,
            valid_len=jnp.asarray(L - 1),
            deterministic=True,
        )
    np.testing.assert_allclose(
        np.asarray(y_scan), np.asarray(y_unrolled), atol=5e-6, rtol=1e-5
    )


def test_scanned_gradients_match_unrolled():
    enc = _encoder()
    x = _x()
    p = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss_u(q):
        return jnp.sum(enc.apply({"params": q}, x, deterministic=True) ** 2)

    g_u = jax.grad(loss_u)(p)

    with use_scan_layers(True):

        def loss_s(q):
            return jnp.sum(enc.apply({"params": q}, x, deterministic=True) ** 2)

        g_s = jax.grad(loss_s)(stack_layer_params(p))
    g_s = unstack_layer_params(g_s)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_u)):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5 * scale, rtol=1e-4
        )


def test_scanned_dropout_runs_and_differs_per_layer():
    """Stochastic path executes under scan (split dropout rngs) — finite
    output that actually differs from the deterministic one."""
    enc = _encoder()
    x = _x()
    with use_scan_layers(True):
        p = enc.init(jax.random.PRNGKey(0), x)["params"]
        y_det = enc.apply({"params": p}, x, deterministic=True)
        y_drop = enc.apply(
            {"params": p}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
    assert np.isfinite(np.asarray(y_drop)).all()
    assert float(jnp.max(jnp.abs(y_drop - y_det))) > 1e-3


def test_gan_ffn_forward_matches_with_converted_tree():
    from gan_ffn_tpu.models import GAN_FFN

    model = GAN_FFN(n_classes=6, gen_num_layers=2)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32))
    p = model.init(jax.random.PRNGKey(0), a, v, t)["params"]
    y = model.apply({"params": p}, a, v, t, deterministic=True)[0]
    with use_scan_layers(True):
        y_s = model.apply(
            {"params": stack_layer_params(p)}, a, v, t, deterministic=True
        )[0]
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y), atol=5e-6, rtol=1e-5)


def test_ganconfig_salt_str_is_stable():
    """str(GANConfig) keys the AOT executable cache (train/gan.py salts).
    It must render default configs EXACTLY as the round-3 dataclass repr so
    existing disk entries stay valid, and append new fields only when they
    are non-default (a non-default structural switch MUST re-key)."""
    from gan_ffn_tpu.train.gan import GANConfig

    round3 = (
        "GANConfig(D_h=100, dropout=0.2, num_layers=8, lr=0.0001, b1=0.5, "
        "b2=0.6, dtype=None, seed=3407, fused_schedule=True, "
        "pallas_attention=False, aot_cache=True)"
    )
    assert str(GANConfig()) == round3
    assert f"{GANConfig()}" == round3
    s = str(GANConfig(scan_layers=True))
    assert "scan_layers=True" in s
    assert str(GANConfig(num_layers=2)) != round3  # legacy fields still key


def test_gan_checkpoint_cross_layout_load(tmp_path):
    """A GAN checkpoint saved under one encoder layout loads into a template
    of the OTHER layout (utils/checkpoint.py::_load_any_layout): the
    ``--use-trained-GAN`` path composes with ``--scan-layers`` in either
    direction, converting params AND optimizer moments."""
    from gan_ffn_tpu.train.gan import GANConfig, init_gan_state
    from gan_ffn_tpu.utils.checkpoint import load_gan_state, save_gan_state

    cfg_u = GANConfig(num_layers=2, aot_cache=False)
    cfg_s = GANConfig(num_layers=2, aot_cache=False, scan_layers=True)
    st_u = init_gan_state(cfg_u, jax.random.PRNGKey(0))
    save_gan_state(str(tmp_path / "GAN_save"), st_u)

    template_s = init_gan_state(cfg_s, jax.random.PRNGKey(1))
    loaded = load_gan_state(str(tmp_path / "GAN_save"), template_s, reset_opt=False)
    want = stack_layer_params(st_u["params"])
    assert jax.tree_util.tree_structure(loaded["params"]) == (
        jax.tree_util.tree_structure(template_s["params"])
    )
    for a, b in zip(jax.tree.leaves(loaded["params"]), jax.tree.leaves(want)):
        assert jnp.array_equal(a, b)
    # optimizer moments follow the same conversion
    assert jax.tree_util.tree_structure(loaded["opt"]) == (
        jax.tree_util.tree_structure(template_s["opt"])
    )

    # and the reverse direction: scanned checkpoint into an unrolled template
    save_gan_state(str(tmp_path / "GAN_save_s"), loaded)
    template_u = init_gan_state(cfg_u, jax.random.PRNGKey(2))
    back = load_gan_state(str(tmp_path / "GAN_save_s"), template_u, reset_opt=True)
    for a, b in zip(jax.tree.leaves(back["params"]), jax.tree.leaves(st_u["params"])):
        assert jnp.array_equal(a, b)


def test_classifier_checkpoint_cross_layout_load(tmp_path):
    """cli/export and cli/predict load ``classifier_best.msgpack`` against an
    unrolled template; a checkpoint written by a --scan-layers run must
    bridge (utils/checkpoint.py::load_params_any_layout)."""
    from gan_ffn_tpu.models import GAN_FFN
    from gan_ffn_tpu.utils.checkpoint import load_params_any_layout, save_params

    model = GAN_FFN(n_classes=6, gen_num_layers=2)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32))
    template = model.init(jax.random.PRNGKey(0), a, v, t)["params"]
    scanned = stack_layer_params(template)
    path = str(tmp_path / "classifier_best.msgpack")
    save_params(path, scanned)
    loaded = load_params_any_layout(path, template)
    assert jax.tree_util.tree_structure(loaded) == (
        jax.tree_util.tree_structure(template)
    )
    for x, y in zip(jax.tree.leaves(loaded), jax.tree.leaves(template)):
        assert jnp.array_equal(x, y)


@pytest.mark.slow
def test_12duel_step_scanned_equivalence(monkeypatch):
    """The fused 12-duel schedule (train_IEMOCAP.py:355-382) produces the
    same losses and updated params under either encoder layout once dropout
    is out of the picture. ``GANConfig.dropout=0`` is NOT enough: the
    encoder layers keep torch's internal default dropout=0.1 (reference
    parity — nn.TransformerEncoderLayer defaults, model.py:1203-1206) and
    train-mode draws differ across layouts by rng derivation, by design.
    So this test monkeypatches nn.Dropout to identity, leaving pure math."""
    from flax import linen as fnn

    monkeypatch.setattr(
        fnn.Dropout, "__call__", lambda self, x, deterministic=None, rng=None: x
    )
    from gan_ffn_tpu.train.gan import (
        GANConfig,
        create_gan_optimizers,
        init_gan_state,
        make_gan_train_step,
    )

    Lg, Bg = 8, 2
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.normal(size=(Lg, Bg, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(Lg, Bg, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(Lg, Bg, 100)).astype(np.float32)),
        "valid_len": jnp.asarray(Lg, dtype=jnp.int32),
        "n_real": jnp.asarray(Bg, dtype=jnp.int32),
    }
    cfg_u = GANConfig(num_layers=2, dropout=0.0, aot_cache=False)
    cfg_s = GANConfig(num_layers=2, dropout=0.0, aot_cache=False, scan_layers=True)
    st_u = init_gan_state(cfg_u, jax.random.PRNGKey(0))
    # deep-copy: the unrolled step DONATES st_u, and stack_layer_params
    # passes non-layer leaves through by reference
    params_s = jax.tree.map(
        lambda x: jnp.array(np.asarray(x)), stack_layer_params(st_u["params"])
    )
    opts = create_gan_optimizers(cfg_s)
    st_s = {
        "params": params_s,
        "opt": {n: opts[n].init(params_s[n]) for n in params_s},
    }

    su, lu = make_gan_train_step(cfg_u)(st_u, batch, jax.random.PRNGKey(3))
    ss, ls = make_gan_train_step(cfg_s)(st_s, batch, jax.random.PRNGKey(3))
    for k in lu:
        if k.startswith("duel_"):
            assert abs(float(lu[k]) - float(ls[k])) < 2e-5, (
                k, float(lu[k]), float(ls[k]),
            )
    pu = jax.tree.leaves(su["params"])
    ps = jax.tree.leaves(unstack_layer_params(ss["params"]))
    max_delta = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ps, pu))
    # torch-Adam amplifies an ulp-level gradient sign flip to a full ±lr
    # step; 2.5*lr is the same bound the DP equivalence tests use
    assert max_delta <= 2.5 * cfg_u.lr, max_delta


def test_resolve_scan_layers_env_default_cannot_split_layouts(monkeypatch):
    """Regression: ``GANFFN_SCAN_LAYERS=1`` with no ``--scan-layers`` flag
    used to leave ``GANConfig.scan_layers`` False (stage A pinned unrolled)
    while stage B's classifier construction read the env-derived global
    (scanned) — the generator graft then failed with a flax scope error
    AFTER the multi-minute GAN stage. ``resolve_scan_layers`` is the single
    reconciliation point the trainer CLIs now call: whatever it returns is
    both the process-global and the GANConfig value."""
    from gan_ffn_tpu.ops import config as opscfg

    # simulate GANFFN_SCAN_LAYERS=1 (env is folded into _STATE at import)
    monkeypatch.setitem(opscfg._STATE, "scan_layers", True)
    assert opscfg.resolve_scan_layers(False) is True
    assert opscfg.scan_layers_enabled() is True

    # unset env: flag absent -> off everywhere
    monkeypatch.setitem(opscfg._STATE, "scan_layers", None)
    assert opscfg.resolve_scan_layers(False) is False
    assert opscfg.scan_layers_enabled() is False

    # env=0 but the flag passed -> flag wins, global follows
    monkeypatch.setitem(opscfg._STATE, "scan_layers", False)
    assert opscfg.resolve_scan_layers(True) is True
    assert opscfg.scan_layers_enabled() is True
