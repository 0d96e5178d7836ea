"""Model-layer tests: shape contracts, jit-compilability, and a step-by-step
numpy oracle for the DialogueRNN scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.models import (
    AcousticDiscriminator,
    AcousticGenerator,
    BiModel,
    DialogueRNN,
    GAN_FFN,
    GAN_FFN_DialogueRNN,
    MELDLSTMModel,
    TextDiscriminator,
    TextGenerator,
    VisualDiscriminator,
    VisualGenerator,
)
from gan_ffn_tpu.models.dialogue_rnn import reverse_padded

KEY = jax.random.PRNGKey(0)
L, B, D_h = 12, 3, 100


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


# small encoder stacks for test speed
GEN_KW = dict(D_h=D_h)


@pytest.mark.parametrize(
    "cls,d_in",
    [(AcousticGenerator, 100), (VisualGenerator, 512), (TextGenerator, 100)],
)
def test_generator_shapes(cls, d_in):
    m = cls(**GEN_KW)
    x = _x((L, B, d_in))
    params = m.init(KEY, x)
    y = m.apply(params, x, deterministic=True)
    assert y.shape == (L, B, D_h)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("cls", [AcousticDiscriminator, TextDiscriminator])
def test_discriminator_shapes(cls):
    m = cls(D_h=D_h)
    x = _x((L, B, D_h))
    params = m.init(KEY, x)
    y = m.apply(params, x, deterministic=True)
    assert y.shape == (L, B, 1)
    assert (np.asarray(y) >= 0).all() and (np.asarray(y) <= 1).all()


def test_visual_discriminator_dual_input():
    """512-d real path goes through the `object` projection; 100-d fake path
    skips it — one param set serves both."""
    m = VisualDiscriminator(D_h=D_h)
    raw = _x((L, B, 512))
    params = m.init(KEY, raw)
    assert "object" in params["params"]
    y_raw = m.apply(params, raw, deterministic=True)
    y_fake = m.apply(params, _x((L, B, 100), 1), deterministic=True)
    assert y_raw.shape == y_fake.shape == (L, B, 1)


def test_gan_ffn_forward_and_jit():
    m = GAN_FFN(n_classes=6)
    a, v, t = _x((L, B, 100)), _x((L, B, 512), 1), _x((L, B, 100), 2)
    params = m.init(KEY, a, v, t)
    fn = jax.jit(lambda p, a, v, t: m.apply(p, a, v, t, deterministic=True)[0])
    log_prob = fn(params, a, v, t)
    assert log_prob.shape == (L, B, 6)
    # rows are valid log-probs
    np.testing.assert_allclose(
        np.exp(np.asarray(log_prob)).sum(-1), np.ones((L, B)), rtol=1e-5
    )


def test_reverse_padded_oracle():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(6, 3, 4)).astype(np.float32)
    lengths = [6, 3, 1]
    umask = np.zeros((3, 6), dtype=np.float32)
    for b, n in enumerate(lengths):
        umask[b, :n] = 1
        x[n:, b] = 0.0  # padding is zero, as produced by the loader
    got = np.asarray(reverse_padded(jnp.asarray(x), jnp.asarray(umask)))
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(got[:n, b], x[:n, b][::-1], rtol=1e-6)
        assert np.all(got[n:, b] == 0)


def _np_gru(p, x, h):
    gi = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    H = h.shape[-1]
    sig = lambda z: 1 / (1 + np.exp(-z))
    r = sig(gi[:, :H] + gh[:, :H])
    z = sig(gi[:, H : 2 * H] + gh[:, H : 2 * H])
    n = np.tanh(gi[:, 2 * H :] + r * gh[:, 2 * H :])
    return (1 - z) * n + z * h


def test_dialogue_rnn_matches_numpy_step_oracle():
    """Scan output == an explicit per-timestep numpy replay of the reference
    cell semantics (simple attention, no listener, eval mode)."""
    D_m, D_g, D_p, D_e, P = 10, 8, 6, 5, 2
    Lh, Bh = 5, 2
    m = DialogueRNN(D_m, D_g, D_p, D_e, context_attention="simple", deterministic=True)
    rng = np.random.default_rng(4)
    U = rng.normal(size=(Lh, Bh, D_m)).astype(np.float32)
    party = rng.integers(0, P, size=(Lh, Bh))
    qmask = np.eye(P, dtype=np.float32)[party]  # (L, B, P)
    params = m.init(KEY, jnp.asarray(U), jnp.asarray(qmask))
    e_got, _ = m.apply(params, jnp.asarray(U), jnp.asarray(qmask))

    cell = params["params"]["dialogue_cell"]
    g_cell = jax.tree.map(np.asarray, cell["g_cell"])
    p_cell = jax.tree.map(np.asarray, cell["p_cell"])
    e_cell = jax.tree.map(np.asarray, cell["e_cell"])
    W_att = np.asarray(cell["attention"]["scalar"]["kernel"])  # (D_g, 1)

    g_hist = []
    q = np.zeros((Bh, P, D_p), dtype=np.float32)
    e = np.zeros((Bh, D_e), dtype=np.float32)
    outs = []
    for t in range(Lh):
        U_t, qm_t = U[t], qmask[t]
        idx = qm_t.argmax(1)
        q_sel = q[np.arange(Bh), idx]
        g_prev = g_hist[-1] if g_hist else np.zeros((Bh, D_g), np.float32)
        g_ = _np_gru(g_cell, np.concatenate([U_t, q_sel], 1), g_prev)
        if g_hist:
            Mh = np.stack(g_hist)  # (t, B, D_g)
            scores = (Mh @ W_att)[:, :, 0]  # (t, B)
            a = np.exp(scores - scores.max(0))
            a /= a.sum(0)
            c = np.einsum("tb,tbd->bd", a, Mh)
        else:
            c = np.zeros((Bh, D_g), np.float32)
        Uc = np.concatenate([U_t, c], 1)
        Uc_exp = np.repeat(Uc[:, None, :], P, axis=1).reshape(Bh * P, -1)
        qs = _np_gru(p_cell, Uc_exp, q.reshape(Bh * P, D_p)).reshape(Bh, P, D_p)
        qm_exp = qm_t[:, :, None]
        q = q * (1 - qm_exp) + qs * qm_exp
        e = _np_gru(e_cell, q[np.arange(Bh), idx], e)
        g_hist.append(g_)
        outs.append(e)
    expected = np.stack(outs)
    np.testing.assert_allclose(np.asarray(e_got), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_bimodel_shapes_and_jit():
    D_m, D_g, D_p, D_e, D_hh, C = 10, 8, 6, 5, 7, 6
    m = BiModel(D_m, D_g, D_p, D_e, D_hh, n_classes=C, deterministic=True)
    rng = np.random.default_rng(5)
    U = jnp.asarray(rng.normal(size=(L, B, D_m)).astype(np.float32))
    qmask = jnp.asarray(np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))])
    umask = np.zeros((B, L), dtype=np.float32)
    for b, n in enumerate([L, L - 3, 2]):
        umask[b, :n] = 1
    umask = jnp.asarray(umask)
    params = m.init(KEY, U, qmask, umask)
    log_prob, alpha, alpha_f, alpha_b = jax.jit(
        lambda p, U, q, u: m.apply(p, U, q, u)
    )(params, U, qmask, umask)
    assert log_prob.shape == (L, B, C)
    assert np.isfinite(np.asarray(log_prob)).all()
    assert alpha.shape == (L, B, L)


@pytest.mark.parametrize("ctx", ["simple", "general"])
def test_bimodel_stacked_bidir_matches_reference_path(ctx):
    """The fused bidirectional scan (ops/config.py GANFFN_STACK_BIDIR,
    measured 1.39x on v5e) must reproduce the two-scan reference path's four
    outputs to float noise in deterministic mode — including ragged lengths
    and a fully-padded dialogue column (the bucketed collate produces
    those)."""
    from gan_ffn_tpu.ops.config import use_stacked_bidir

    D_m, D_g, D_p, D_e, D_hh, C = 10, 8, 6, 5, 7, 6
    m = BiModel(D_m, D_g, D_p, D_e, D_hh, n_classes=C, context_attention=ctx,
                deterministic=True)
    rng = np.random.default_rng(11)
    U = jnp.asarray(rng.normal(size=(L, B, D_m)).astype(np.float32))
    qmask_np = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))]
    umask_np = np.zeros((B, L), dtype=np.float32)
    umask_np[0, :] = 1.0
    umask_np[1, :5] = 1.0
    qmask_np[:, 2, :] = 0.0  # column 2: fully-padded dialogue
    qmask = jnp.asarray(qmask_np)
    umask = jnp.asarray(umask_np)
    params = m.init(KEY, U, qmask, umask)
    with use_stacked_bidir(False):
        ref = m.apply(params, U, qmask, umask)
    with use_stacked_bidir(True):
        got = m.apply(params, U, qmask, umask)
    for name, a, b in zip(("log_prob", "alpha", "alpha_f", "alpha_b"), ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=name
        )
    # bf16: output DTYPES must also match the reference path (simple's
    # alpha stays float32 — attention.py:52-54 never casts it back; the
    # stacked path once bf16-rounded it)
    U16 = U.astype(jnp.bfloat16)
    with use_stacked_bidir(False):
        ref16 = m.apply(params, U16, qmask, umask)
    with use_stacked_bidir(True):
        got16 = m.apply(params, U16, qmask, umask)
    for name, a, b in zip(("log_prob", "alpha", "alpha_f", "alpha_b"), ref16, got16):
        assert a.dtype == b.dtype, (name, a.dtype, b.dtype)
    # train mode: the fused path draws its own dropout masks (explicit
    # fold_in keys — same distribution, different stream); it must run,
    # stay finite, and actually be stochastic
    mt = BiModel(D_m, D_g, D_p, D_e, D_hh, n_classes=C, context_attention=ctx,
                 deterministic=False)
    with use_stacked_bidir(True):
        o1 = mt.apply(params, U, qmask, umask, rngs={"dropout": jax.random.PRNGKey(1)})[0]
        o2 = mt.apply(params, U, qmask, umask, rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert np.isfinite(np.asarray(o1)).all()
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_bimodel_stacked_bidir_unroll_invariant():
    """GANFFN_STACK_UNROLL (ops/config.py) only changes how lax.scan tiles
    the fused body (measured on v5e: unroll>1 loses, scripts/ab_stack_unroll
    .py) — deterministic outputs must be identical for any factor."""
    from gan_ffn_tpu.ops.config import use_stack_unroll, use_stacked_bidir

    D_m, D_g, D_p, D_e, D_hh, C = 10, 8, 6, 5, 7, 6
    m = BiModel(D_m, D_g, D_p, D_e, D_hh, n_classes=C, deterministic=True)
    rng = np.random.default_rng(13)
    U = jnp.asarray(rng.normal(size=(L, B, D_m)).astype(np.float32))
    qmask = jnp.asarray(np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))])
    umask = np.zeros((B, L), dtype=np.float32)
    for b, n in enumerate([L, L - 3, 2]):
        umask[b, :n] = 1
    umask = jnp.asarray(umask)
    params = m.init(KEY, U, qmask, umask)
    with use_stacked_bidir(True):
        base = m.apply(params, U, qmask, umask)
        with use_stack_unroll(3):  # non-divisor of L exercises the remainder
            got = m.apply(params, U, qmask, umask)
    for name, a, b in zip(("log_prob", "alpha", "alpha_f", "alpha_b"), base, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_bimodel_stacked_bidir_gate_falls_back():
    """Configs the fused body doesn't cover (listener_state, general2/concat
    context attention) must silently take the reference path. Pinned by
    EQUALITY against a use_stacked_bidir(False) run — if the gate ever
    admitted such a config to _stacked_bidir_scan, it would run the wrong
    math on those params (e.g. general2's bias/tanh/renormalize dropped)
    yet still produce finite correctly-shaped output."""
    from gan_ffn_tpu.ops.config import use_stacked_bidir

    D_m, D_g, D_p, D_e, D_hh, C = 10, 8, 6, 5, 7, 6
    rng = np.random.default_rng(12)
    U = jnp.asarray(rng.normal(size=(L, B, D_m)).astype(np.float32))
    qmask = jnp.asarray(np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))])
    umask = jnp.asarray(np.ones((B, L), dtype=np.float32))
    for kwargs in (
        dict(context_attention="general2"),
        dict(context_attention="general", listener_state=True),
    ):
        m = BiModel(D_m, D_g, D_p, D_e, D_hh, n_classes=C, deterministic=True,
                    **kwargs)
        params = m.init(KEY, U, qmask, umask)
        with use_stacked_bidir(True):
            log_prob = m.apply(params, U, qmask, umask)[0]
        assert log_prob.shape == (L, B, C)
        assert np.isfinite(np.asarray(log_prob)).all()
        with use_stacked_bidir(False):
            ref = m.apply(params, U, qmask, umask)[0]
        np.testing.assert_array_equal(np.asarray(log_prob), np.asarray(ref))


@pytest.mark.slow
def test_gan_ffn_dialoguernn_forward():
    m = GAN_FFN_DialogueRNN(n_classes=6, context_attention="general", deterministic=True)
    rng = np.random.default_rng(6)
    a, v, t = _x((L, B, 100)), _x((L, B, 512), 1), _x((L, B, 100), 2)
    qmask = jnp.asarray(np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))])
    umask = jnp.asarray(np.ones((B, L), dtype=np.float32))
    params = m.init(KEY, a, v, t, qmask, umask)
    log_prob, _, _, _ = m.apply(params, a, v, t, qmask, umask)
    assert log_prob.shape == (L, B, 6)
    assert np.isfinite(np.asarray(log_prob)).all()


def test_meld_lstm_model():
    m = MELDLSTMModel(D_m=600, D_e=300, D_h=600, n_classes=7)
    x = _x((L, B, 600))
    umask = jnp.asarray(np.ones((B, L), dtype=np.float32))
    params = m.init(KEY, x, None, umask)
    log_prob, alpha, _, _ = m.apply(params, x, None, umask, deterministic=True)
    assert log_prob.shape == (L, B, 7)
    assert np.isfinite(np.asarray(log_prob)).all()


@pytest.mark.slow
def test_gan_ffn_train_mode_dropout_active():
    """Two different dropout keys give different outputs in train mode."""
    m = GAN_FFN(n_classes=6)
    a, v, t = _x((L, B, 100)), _x((L, B, 512), 1), _x((L, B, 100), 2)
    params = m.init(KEY, a, v, t)
    o1 = m.apply(params, a, v, t, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})[0]
    o2 = m.apply(params, a, v, t, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})[0]
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


@pytest.mark.slow
def test_bimodel_partial_batch_gradients_finite():
    """Regression: fully-padded dialogue columns must not produce NaN grads
    (the general2 renormalization's backward on all-masked rows)."""
    D_m, D_g, D_p, D_e, D_hh, C = 10, 8, 6, 5, 7, 6
    m = BiModel(D_m, D_g, D_p, D_e, D_hh, n_classes=C, context_attention="general",
                deterministic=True)
    rng = np.random.default_rng(7)
    U = jnp.asarray(rng.normal(size=(L, B, D_m)).astype(np.float32))
    qmask_np = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))]
    umask_np = np.zeros((B, L), dtype=np.float32)
    umask_np[0, :] = 1.0
    umask_np[1, :5] = 1.0
    # column 2 is a fully-padded dialogue
    qmask_np[:, 2, :] = 0.0
    qmask = jnp.asarray(qmask_np)
    umask = jnp.asarray(umask_np)
    params = m.init(KEY, U, qmask, umask)

    from gan_ffn_tpu.nn.losses import masked_nll_loss

    labels = jnp.asarray(rng.integers(0, C, size=(B, L)))

    def loss_fn(p):
        log_prob, *_ = m.apply(p, U, qmask, umask)
        flat = log_prob.transpose(1, 0, 2).reshape(-1, C)
        return masked_nll_loss(flat, labels.reshape(-1), umask)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_bf16_dialoguernn_and_meld_paths():
    """Regression: bf16 compute must thread consistently through the scan
    carries (history buffer, party/emotion states) and the LSTM layers."""
    rng = np.random.default_rng(11)
    m = GAN_FFN_DialogueRNN(n_classes=6, gen_num_layers=1, deterministic=True, dtype=jnp.bfloat16)
    a = _x((L, B, 100)); v = _x((L, B, 512), 1); t = _x((L, B, 100), 2)
    qm = jnp.asarray(np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))])
    um = jnp.asarray(np.ones((B, L), dtype=np.float32))
    params = m.init(KEY, a, v, t, qm, um)
    lp, *_ = m.apply(params, a, v, t, qm, um)
    assert np.isfinite(np.asarray(lp)).all()

    mm = MELDLSTMModel(D_m=600, D_e=32, D_h=64, n_classes=7, dtype=jnp.bfloat16)
    x = _x((L, B, 600)).astype(jnp.bfloat16)
    pm = mm.init(KEY, x, None, um)
    lp2, *_ = mm.apply(pm, x, None, um, deterministic=True)
    assert np.isfinite(np.asarray(lp2)).all()
