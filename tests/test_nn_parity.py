"""Numerical parity of gan_ffn_tpu.nn against torch's public modules.

Each test builds a torch oracle, copies its weights into the Flax module, and
asserts the outputs match in eval (deterministic) mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from gan_ffn_tpu import nn as gnn
from torch_mapping import (
    encoder_params,
    gru_cell_params,
    linear_params,
    lstm_params,
    mha_params,
)

torch.manual_seed(0)
RTOL, ATOL = 1e-5, 1e-5


def test_torch_linear_parity():
    tl = tnn.Linear(7, 5).eval()
    x = np.random.default_rng(0).normal(size=(3, 7)).astype(np.float32)
    expected = tl(torch.from_numpy(x)).detach().numpy()
    got = gnn.TorchLinear(5).apply({"params": linear_params(tl)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)


def test_positional_encoding_table():
    # independent oracle for the sin/cos table
    d, max_len = 10, 20
    table = gnn.sinusoidal_table(max_len, d)
    for t in (0, 3, 19):
        for i in range(0, d, 2):
            div = np.exp(i * (-np.log(10000.0) / d))
            assert table[t, 0, i] == pytest.approx(np.sin(t * div), abs=1e-6)
            assert table[t, 0, i + 1] == pytest.approx(np.cos(t * div), abs=1e-6)


def test_mha_self_attention_parity():
    E, H, L, B = 100, 10, 12, 4
    mha = tnn.MultiheadAttention(E, H, dropout=0.1).eval()
    x = np.random.default_rng(1).normal(size=(L, B, E)).astype(np.float32)
    xt = torch.from_numpy(x)
    expected, _ = mha(xt, xt, xt)
    got = gnn.MultiheadSelfAttention(E, H, dropout=0.1).apply(
        {"params": mha_params(mha)}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), expected.detach().numpy(), rtol=1e-4, atol=1e-5)


def _torch_encoder(d_model, nhead, num_layers):
    layer = tnn.TransformerEncoderLayer(d_model=d_model, nhead=nhead)
    return tnn.TransformerEncoder(encoder_layer=layer, num_layers=num_layers).eval()


def test_transformer_encoder_parity():
    d, H, L, B, N = 100, 10, 9, 3, 2
    enc = _torch_encoder(d, H, N)
    x = np.random.default_rng(2).normal(size=(L, B, d)).astype(np.float32)
    expected = enc(torch.from_numpy(x)).detach().numpy()
    got = gnn.TransformerEncoder(d, H, num_layers=N).apply(
        {"params": encoder_params(enc)}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_transformer_valid_len_equals_truncated_torch():
    """Bucket-padded input + valid_len masking == torch on the truncated batch.

    This is the core static-shape design claim: attention-key masking at the
    batch's true max length reproduces the reference's dynamic-shape numerics.
    """
    d, H, L_true, L_pad, B, N = 100, 10, 7, 16, 3, 2
    enc = _torch_encoder(d, H, N)
    rng = np.random.default_rng(3)
    x_true = rng.normal(size=(L_true, B, d)).astype(np.float32)
    x_pad = np.zeros((L_pad, B, d), dtype=np.float32)
    x_pad[:L_true] = x_true
    expected = enc(torch.from_numpy(x_true)).detach().numpy()
    got = gnn.TransformerEncoder(d, H, num_layers=N).apply(
        {"params": encoder_params(enc)},
        jnp.asarray(x_pad),
        valid_len=jnp.asarray(L_true),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got)[:L_true], expected, rtol=1e-4, atol=1e-4)


def test_lstm_parity_bidirectional_multilayer():
    D, H, L, B = 20, 16, 11, 5
    lstm = tnn.LSTM(input_size=D, hidden_size=H, num_layers=2, bidirectional=True).eval()
    x = np.random.default_rng(4).normal(size=(L, B, D)).astype(np.float32)
    out_t, (h_t, c_t) = lstm(torch.from_numpy(x))
    out, (h, c) = gnn.LSTM(hidden_size=H, num_layers=2, bidirectional=True).apply(
        {"params": lstm_params(lstm)}, jnp.asarray(x), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(out), out_t.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_t.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_t.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_gru_cell_parity():
    D, H, B = 12, 8, 4
    cell = tnn.GRUCell(D, H).eval()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(B, D)).astype(np.float32)
    h = rng.normal(size=(B, H)).astype(np.float32)
    expected = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    got = gnn.GRUCell(H).apply(
        {"params": gru_cell_params(cell)}, jnp.asarray(x), jnp.asarray(h)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-5)


def test_simple_attention_oracle():
    """SimpleAttention == softmax-over-seq pooling (numpy oracle with loops)."""
    L, B, D = 6, 3, 10
    rng = np.random.default_rng(6)
    M = rng.normal(size=(L, B, D)).astype(np.float32)
    W = rng.normal(size=(D, 1)).astype(np.float32)
    pool, alpha = gnn.SimpleAttention(D).apply(
        {"params": {"scalar": {"kernel": W}}}, jnp.asarray(M)
    )
    for b in range(B):
        scores = M[:, b, :] @ W[:, 0]  # (L,)
        a = np.exp(scores - scores.max())
        a /= a.sum()
        expected = sum(a[t] * M[t, b] for t in range(L))
        np.testing.assert_allclose(np.asarray(pool[b]), expected, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(alpha[b, 0]), a, rtol=1e-5, atol=1e-5)


def test_matching_attention_general2_oracle():
    """general2: mask-multiplied tanh scores, softmax, re-mask, renormalize."""
    L, B, Dm, Dc = 5, 2, 8, 6
    rng = np.random.default_rng(7)
    M = rng.normal(size=(L, B, Dm)).astype(np.float32)
    x = rng.normal(size=(B, Dc)).astype(np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.float32)
    W = rng.normal(size=(Dc, Dm)).astype(np.float32)
    b_ = rng.normal(size=(Dm,)).astype(np.float32)
    params = {"transform": {"kernel": W, "bias": b_}}
    pool, alpha = gnn.MatchingAttention(Dm, Dc, att_type="general2").apply(
        {"params": params}, jnp.asarray(M), jnp.asarray(x), jnp.asarray(mask)
    )
    for bb in range(B):
        xt = x[bb] @ W + b_  # (Dm,)
        Mm = M[:, bb, :] * mask[bb][:, None]  # (L, Dm)
        scores = np.tanh((Mm @ xt) * mask[bb])  # (L,)
        a = np.exp(scores - scores.max())
        a /= a.sum()
        a = a * mask[bb]
        a = a / a.sum()
        expected = (a[:, None] * M[:, bb, :]).sum(0)
        np.testing.assert_allclose(np.asarray(pool[bb]), expected, rtol=1e-5, atol=1e-5)


def test_matching_attention_batched_matches_looped():
    """A (T, B, Dc) query batch equals T separate single-query calls."""
    L, B, Dm, T = 5, 3, 8, 4
    rng = np.random.default_rng(8)
    M = jnp.asarray(rng.normal(size=(L, B, Dm)).astype(np.float32))
    xs = jnp.asarray(rng.normal(size=(T, B, Dm)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32))
    mask = mask.at[:, 0].set(1.0)  # at least one valid position
    mod = gnn.MatchingAttention(Dm, Dm, att_type="general2")
    params = mod.init(jax.random.PRNGKey(0), M, xs[0], mask)
    batched, _ = mod.apply(params, M, xs, mask)
    for t in range(T):
        single, _ = mod.apply(params, M, xs[t], mask)
        np.testing.assert_allclose(np.asarray(batched[t]), np.asarray(single), rtol=1e-5, atol=1e-6)


def test_masked_nll_loss_parity():
    N, C = 12, 6
    rng = np.random.default_rng(9)
    logits = rng.normal(size=(N, C)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=1)
    target = rng.integers(0, C, size=N)
    mask = (rng.random(N) > 0.3).astype(np.float32)
    weight = rng.random(C).astype(np.float32) + 0.5

    # torch oracle following the reference formula via torch's public NLLLoss
    tloss = tnn.NLLLoss(weight=torch.from_numpy(weight), reduction="sum")
    mask_t = torch.from_numpy(mask).view(-1, 1)
    expected = tloss(log_probs * mask_t, torch.from_numpy(target)) / torch.sum(
        torch.from_numpy(weight)[torch.from_numpy(target)] * mask_t.squeeze()
    )
    got = gnn.masked_nll_loss(
        jnp.asarray(log_probs.numpy()),
        jnp.asarray(target),
        jnp.asarray(mask),
        jnp.asarray(weight),
    )
    assert float(got) == pytest.approx(float(expected), rel=1e-5)

    # unweighted
    tloss_u = tnn.NLLLoss(reduction="sum")
    expected_u = tloss_u(log_probs * mask_t, torch.from_numpy(target)) / mask.sum()
    got_u = gnn.masked_nll_loss(
        jnp.asarray(log_probs.numpy()), jnp.asarray(target), jnp.asarray(mask)
    )
    assert float(got_u) == pytest.approx(float(expected_u), rel=1e-5)


def test_bce_loss_parity():
    rng = np.random.default_rng(10)
    p = rng.random((7, 4, 1)).astype(np.float32)
    y = (rng.random((7, 4, 1)) > 0.5).astype(np.float32)
    expected = tnn.BCELoss()(torch.from_numpy(p), torch.from_numpy(y))
    got = gnn.bce_loss(jnp.asarray(p), jnp.asarray(y))
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


def test_bce_loss_saturated_gradient_matches_torch():
    """Regression for the stage-A NaN blow-up: at sigmoid outputs of exactly
    0.0 / 1.0 (float32 saturation — reached in practice once a discriminator
    wins, measured at stage-A epoch 118 on a reference-scale run), naive
    autodiff of the log-clamped BCE yields 0*inf = NaN gradients, while
    torch's BCELoss backward clamps the denominator ((p-t)/clamp_min(p(1-p),
    1e-12)) and stays finite. bce_loss must match torch's forward AND
    backward at and near saturation."""
    import jax

    p_np = np.array([0.0, 1.0, 1e-30, 1.0 - 1e-7, 0.5, 0.2], dtype=np.float32)
    y_np = np.array([1.0, 0.0, 1.0, 0.0, 1.0, 0.0], dtype=np.float32)

    p_t = torch.tensor(p_np, requires_grad=True)
    loss_t = tnn.BCELoss()(p_t, torch.from_numpy(y_np))
    loss_t.backward()

    grad_j = jax.grad(lambda p: gnn.bce_loss(p, jnp.asarray(y_np)))(jnp.asarray(p_np))
    loss_j = gnn.bce_loss(jnp.asarray(p_np), jnp.asarray(y_np))

    assert np.isfinite(np.asarray(grad_j)).all(), np.asarray(grad_j)
    assert float(loss_j) == pytest.approx(float(loss_t), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad_j), p_t.grad.numpy(), rtol=1e-5, atol=0
    )
    # masked variant stays finite too
    mask = jnp.asarray(np.array([1, 1, 1, 1, 0, 0], dtype=np.float32))
    gm = jax.grad(lambda p: gnn.bce_loss(p, jnp.asarray(y_np), mask))(jnp.asarray(p_np))
    assert np.isfinite(np.asarray(gm)).all()


def test_bce_loss_masked_equals_reference_dynamic_shape():
    """BCE over a bucket-padded tensor with mask == BCE over the dynamic slice."""
    rng = np.random.default_rng(11)
    L_true, B_real, L_pad, B_pad = 5, 3, 8, 4
    p_small = rng.random((L_true, B_real, 1)).astype(np.float32)
    y_small = np.ones_like(p_small)
    expected = tnn.BCELoss()(torch.from_numpy(p_small), torch.from_numpy(y_small))

    p_big = rng.random((L_pad, B_pad, 1)).astype(np.float32)
    p_big[:L_true, :B_real] = p_small
    y_big = np.ones_like(p_big)
    mask = np.zeros((L_pad, B_pad, 1), dtype=np.float32)
    mask[:L_true, :B_real] = 1.0
    got = gnn.bce_loss(jnp.asarray(p_big), jnp.asarray(y_big), jnp.asarray(mask))
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


def test_masked_mse_loss_parity():
    rng = np.random.default_rng(12)
    pred = rng.normal(size=20).astype(np.float32)
    target = rng.normal(size=20).astype(np.float32)
    mask = (rng.random(20) > 0.4).astype(np.float32)
    expected = tnn.MSELoss(reduction="sum")(
        torch.from_numpy(pred * mask), torch.from_numpy(target)
    ) / mask.sum()
    got = gnn.masked_mse_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    assert float(got) == pytest.approx(float(expected), rel=1e-5)


def test_gelu_and_hardswish_match_torch():
    from gan_ffn_tpu.nn.core import gelu, hardswish

    x = np.linspace(-4, 4, 33, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(gelu(jnp.asarray(x))),
        torch.nn.functional.gelu(torch.from_numpy(x)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(hardswish(jnp.asarray(x))),
        torch.nn.functional.hardswish(torch.from_numpy(x)).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
