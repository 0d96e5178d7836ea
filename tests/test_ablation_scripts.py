"""Validity guards for the kernel-decision ablation harnesses in scripts/.

scripts/ab_layernorm_epilogue.py and scripts/ab_matchatt_ablation.py justify
closing ROADMAP item 4's candidate-kernel lines by ablation: they claim the
patched ("identity") variants keep the param tree — and therefore the Adam
update work — identical, and that the matchatt harness's inlined 'general'
context path is the REAL computation. Those claims are what make the
measured deltas valid upper bounds; pin them here so a drift in the product
modules (param renames, att branch changes) breaks the suite instead of
silently invalidating a committed perf decision.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from ab_layernorm_epilogue import identity_layernorm  # noqa: E402
from ab_matchatt_ablation import identity_matching_attention  # noqa: E402


def _tree_spec(params):
    return jax.tree.map(lambda x: (x.shape, str(x.dtype)), params)


def test_identity_layernorm_preserves_param_tree_and_drops_norm():
    from gan_ffn_tpu.nn.transformer import TransformerEncoder

    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 2, 8)), jnp.float32)
    model = TransformerEncoder(d_model=8, nhead=2, num_layers=1, dim_feedforward=16)

    real_params = model.init(jax.random.PRNGKey(0), x)["params"]
    with identity_layernorm():
        patched_params = model.init(jax.random.PRNGKey(0), x)["params"]
        patched_out = model.apply({"params": patched_params}, x)

    # identical tree -> identical optimizer work in the timed A/B
    assert _tree_spec(real_params) == _tree_spec(patched_params)
    # non-LN params are bit-identical under the same init key; the patched
    # forward differs from the real one (the normalization is really gone)
    real_out = model.apply({"params": real_params}, x)
    assert not np.allclose(np.asarray(real_out), np.asarray(patched_out))
    # outside the context the real LayerNorm is restored
    restored = model.init(jax.random.PRNGKey(0), x)["params"]
    out_restored = model.apply({"params": restored}, x)
    np.testing.assert_array_equal(np.asarray(real_out), np.asarray(out_restored))


def test_identity_matchatt_general2_is_passthrough_with_same_tree():
    from gan_ffn_tpu.models import dialogue_rnn

    rng = np.random.default_rng(1)
    L, B, D = 5, 3, 4
    M = jnp.asarray(rng.normal(size=(L, B, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(L, B, D)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32))

    real = dialogue_rnn.MatchingAttention(D, D, att_type="general2")
    real_params = real.init(jax.random.PRNGKey(0), M, x, mask)["params"]

    with identity_matching_attention():
        patched = dialogue_rnn.MatchingAttention(D, D, att_type="general2")
        patched_params = patched.init(jax.random.PRNGKey(0), M, x, mask)["params"]
        pool, alpha = patched.apply({"params": patched_params}, M, x, mask)

    assert _tree_spec(real_params) == _tree_spec(patched_params)
    np.testing.assert_array_equal(np.asarray(pool), np.asarray(x))
    np.testing.assert_allclose(np.asarray(alpha), 1.0 / L, rtol=1e-6)
    assert alpha.shape == (L, B, 1, L)


def test_identity_matchatt_general_path_matches_real_module():
    """The in-cell 'general' context attention must be the REAL computation
    (the recurrence depends on it) — same params, same outputs."""
    from gan_ffn_tpu.models import dialogue_rnn

    rng = np.random.default_rng(2)
    L, B, Dm, Dc = 6, 3, 5, 7
    M = jnp.asarray(rng.normal(size=(L, B, Dm)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, Dc)), jnp.float32)  # single-query form
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32))
    # ensure at least one valid key per row (the cell always has history)
    mask = mask.at[:, 0].set(1.0)

    real = dialogue_rnn.MatchingAttention(Dm, Dc, att_type="general")
    real_params = real.init(jax.random.PRNGKey(3), M, x, mask)["params"]
    real_pool, real_alpha = real.apply({"params": real_params}, M, x, mask)

    with identity_matching_attention():
        patched = dialogue_rnn.MatchingAttention(Dm, Dc, att_type="general")
        patched_params = patched.init(jax.random.PRNGKey(3), M, x, mask)["params"]
        pool, alpha = patched.apply({"params": patched_params}, M, x, mask)

    assert _tree_spec(real_params) == _tree_spec(patched_params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(real_params)[0]),
        np.asarray(jax.tree.leaves(patched_params)[0]),
    )
    np.testing.assert_allclose(np.asarray(real_pool), np.asarray(pool), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(real_alpha), np.asarray(alpha), rtol=1e-6)


def test_identity_matchatt_rejects_unmirrored_att_types():
    from gan_ffn_tpu.models import dialogue_rnn

    M = jnp.ones((3, 2, 4), jnp.float32)
    x = jnp.ones((2, 4), jnp.float32)
    with identity_matching_attention():
        mod = dialogue_rnn.MatchingAttention(4, 4, att_type="dot")
        with pytest.raises(AssertionError, match="general"):
            mod.init(jax.random.PRNGKey(0), M, x)
