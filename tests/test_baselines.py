"""Smoke + parity tests for the legacy/baseline model surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from gan_ffn_tpu import nn as gnn
from gan_ffn_tpu.models import (
    BiE2EModel,
    CNN,
    CNNFeatureExtractor,
    E2ELSTMModel,
    Emoformer,
    FullyConnection,
    LSTMModel,
    LSTMModel2,
)
from torch_mapping import linear_params, lstm_params

KEY = jax.random.PRNGKey(0)
L, B = 10, 3


def _x(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_gru_parity_with_torch():
    D, H = 12, 8
    gru = tnn.GRU(D, H).eval()
    x = np.random.default_rng(0).normal(size=(L, B, D)).astype(np.float32)
    out_t, h_t = gru(torch.from_numpy(x))
    params = {
        f"{p}_l0": (
            np.ascontiguousarray(getattr(gru, f"{'weight' if p.startswith('w') else 'bias'}_{p[2:4]}_l0").detach().numpy().T)
            if p.startswith("w")
            else getattr(gru, f"bias_{p[2:4]}_l0").detach().numpy()
        )
        for p in ("w_ih", "w_hh", "b_ih", "b_hh")
    }
    out, h_n = gnn.GRU(H).apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_t.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_n), h_t.detach().numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_lstm_model2_shapes():
    m = LSTMModel2(D_m=20, D_e=8, D_h=12, n_classes=6, attention=True)
    U = _x((L, B, 20))
    umask = jnp.ones((B, L), dtype=jnp.float32)
    params = m.init(KEY, U, None, umask)
    log_prob, alpha, _, _ = m.apply(params, U, None, umask, deterministic=True)
    assert log_prob.shape == (L, B, 6)
    assert np.isfinite(np.asarray(log_prob)).all()


@pytest.mark.slow
def test_lstm_model_shapes():
    m = LSTMModel(D_m=100, D_e=100, D_h=100, n_classes=6)
    t, a, v = _x((L, B, 100)), _x((L, B, 100), 1), _x((L, B, 512), 2)
    umask = jnp.ones((B, L), dtype=jnp.float32)
    params = m.init(KEY, t, a, v, None, umask)
    log_prob, *_ = m.apply(params, t, a, v, None, umask, deterministic=True)
    assert log_prob.shape == (L, B, 6)
    assert np.isfinite(np.asarray(log_prob)).all()


def test_cnn_shapes():
    m = CNN(embedding_dim=100, num_filter=16, filter_sizes=(2, 3, 4), output_dim=6)
    t = _x((L, B, 100))
    params = m.init(KEY, t, None, None)
    log_prob, *_ = m.apply(params, t, None, None, deterministic=True)
    assert log_prob.shape == (B, 6)


def test_fully_connection_shapes():
    m = FullyConnection()
    x = _x((L, B, 100))
    params = m.init(KEY, x)
    y = m.apply(params, x)
    assert y.shape == (L, B, 2048)


@pytest.mark.slow
def test_emoformer_shapes():
    m = Emoformer(D_m=100, D_e=30, n_classes=6, attention=False)
    t, a, v = _x((L, B, 100)), _x((L, B, 100), 1), _x((L, B, 512), 2)
    umask = jnp.ones((B, L), dtype=jnp.float32)
    params = m.init(KEY, t, a, v, None, umask)
    log_prob, *_ = m.apply(params, t, a, v, None, umask, deterministic=True)
    assert log_prob.shape == (L, B, 6)
    assert np.isfinite(np.asarray(log_prob)).all()


@pytest.mark.slow
def test_e2e_lstm_model_shapes():
    m = E2ELSTMModel(D_e=8, D_h=12, vocab_size=50, embedding_dim=16, n_classes=6)
    tokens = jnp.asarray(np.random.default_rng(3).integers(0, 50, size=(L, B, 7)))
    umask = jnp.ones((B, L), dtype=jnp.float32)
    params = m.init(KEY, tokens, None, umask)
    log_prob, *_ = m.apply(params, tokens, None, umask, deterministic=True)
    assert log_prob.shape == (L, B, 6)


@pytest.mark.slow
def test_bi_e2e_model_shapes():
    m = BiE2EModel(
        D_emb=16, D_m=12, D_g=10, D_p=8, D_e=6, D_h=14, vocab_size=50, n_classes=7
    )
    rng = np.random.default_rng(4)
    turns = [jnp.asarray(rng.integers(0, 50, size=(9, B))) for _ in range(3)]
    params = m.init(KEY, *turns)
    log_prob = m.apply(params, *turns)
    assert log_prob.shape == (B, 7)
    np.testing.assert_allclose(
        np.exp(np.asarray(log_prob)).sum(-1), np.ones(B), rtol=1e-5
    )


def test_focal_loss_matches_reference_formula():
    """FocalLoss oracle via torch CrossEntropyLoss, reference formula
    (model.py:40-59)."""
    N, C = 12, 6
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(N, C)).astype(np.float32)
    log_probs = torch.log_softmax(torch.from_numpy(logits), dim=1)
    target = rng.integers(0, C, size=N)
    mask = (rng.random(N) > 0.3).astype(np.float32)
    weight = (rng.random(C) + 0.5).astype(np.float32)
    gamma = 2.0

    ce = tnn.CrossEntropyLoss(weight=torch.from_numpy(weight), reduction="mean")
    mask_t = torch.from_numpy(mask).view(-1, 1)
    logp = ce(log_probs * mask_t, torch.from_numpy(target)) / torch.sum(
        torch.from_numpy(weight)[torch.from_numpy(target)] * mask_t.squeeze()
    )
    p = torch.exp(-logp)
    expected = ((1 - p) ** gamma * logp).mean()

    got = gnn.focal_loss(
        jnp.asarray(log_probs.numpy()),
        jnp.asarray(target),
        jnp.asarray(mask),
        jnp.asarray(weight),
        gamma=gamma,
    )
    assert float(got) == pytest.approx(float(expected), rel=1e-4)


def test_token_collate():
    from gan_ffn_tpu.data import DailyDialogueDataset, write_synthetic_dailydialogue
    from gan_ffn_tpu.data.loaders import collate_token_dialogues
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = write_synthetic_dailydialogue(os.path.join(d, "dd.pkl"), n_train=5)
        ds = DailyDialogueDataset(path, split="train")
        items = [ds[i] for i in range(3)]
        batch = collate_token_dialogues(items, bucket_len=24, batch_size=4, max_tokens=32)
        assert batch.tokens.shape == (24, 4, 32)
        assert batch.qmask.shape == (24, 4, 2)
        assert batch.umask.shape == (4, 24)
        assert batch.n_real == 3
        assert batch.umask[3].sum() == 0
