"""Training-engine tests: the jitted 12-duel GAN step, classifier steps,
generator grafting, and a miniature end-to-end IEMOCAP slice."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gan_ffn_tpu.data import get_iemocap_loaders
from gan_ffn_tpu.models import GAN_FFN
from gan_ffn_tpu.train import (
    GANConfig,
    init_classifier_state,
    init_gan_state,
    make_classifier_steps,
    make_gan_train_step,
    run_epoch,
    torch_adam,
)
from gan_ffn_tpu.train.classifier import graft_generator_params
from gan_ffn_tpu.train.gan import LOGGED_LOSS_KEYS
from gan_ffn_tpu.train.loop import batch_to_arrays

L, B = 8, 2
CFG = GANConfig(num_layers=1)


def _gan_batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "text": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "valid_len": jnp.asarray(L, dtype=jnp.int32),
        "n_real": jnp.asarray(B, dtype=jnp.int32),
    }


def test_torch_adam_matches_torch():
    import torch

    w0 = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    g = np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32)

    p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.Adam([p_t], lr=1e-2, betas=(0.5, 0.6), weight_decay=0.01)
    for _ in range(3):
        opt_t.zero_grad()
        p_t.grad = torch.from_numpy(g.copy())
        opt_t.step()

    opt_j = torch_adam(1e-2, 0.5, 0.6, weight_decay=0.01)
    params = jnp.asarray(w0)
    state = opt_j.init(params)
    for _ in range(3):
        updates, state = opt_j.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), p_t.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_gan_state_init():
    state = init_gan_state(CFG, jax.random.PRNGKey(0))
    assert set(state["params"]) == {
        "acoustic_gen", "visual_gen", "text_gen",
        "acoustic_disc", "visual_disc", "text_disc",
    }
    assert "object" in state["params"]["visual_disc"]


@pytest.mark.slow
def test_gan_train_step_runs_and_updates():
    state = init_gan_state(CFG, jax.random.PRNGKey(0))
    step = make_gan_train_step(CFG)
    before = jax.tree.map(np.asarray, state["params"]["acoustic_gen"])
    batch = _gan_batch()
    state, losses = step(state, batch, jax.random.PRNGKey(1))
    for k in LOGGED_LOSS_KEYS:
        assert np.isfinite(float(losses[k])), k
    assert all(f"duel_{i}" in losses for i in range(12))
    after = state["params"]["acoustic_gen"]
    diffs = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - b).max()), after, before)
    assert max(jax.tree.leaves(diffs)) > 0
    # second step with same shapes: no retrace needed, still finite
    state, losses2 = step(state, _gan_batch(1), jax.random.PRNGKey(2))
    assert np.isfinite(float(losses2["visual_G_loss"]))


@pytest.mark.slow
def test_logged_loss_overwrite_semantics():
    """Logged keys must equal the LAST duel writing them (reference dict
    overwrite, train_IEMOCAP.py:355-382)."""
    state = init_gan_state(CFG, jax.random.PRNGKey(0))
    step = make_gan_train_step(CFG)
    _, losses = step(state, _gan_batch(), jax.random.PRNGKey(1))
    expected_src = {
        "visual_D_loss": "duel_2",
        "acoustic_G_loss": "duel_5",
        "acoustic_D_loss": "duel_10",
        "text_G_loss": "duel_7",
        "text_D_loss": "duel_8",
        "visual_G_loss": "duel_11",
    }
    for key, duel in expected_src.items():
        assert float(losses[key]) == float(losses[duel]), (key, duel)


def _make_gan_ffn_steps(model, loss_weights=None, lr=1e-3):
    def apply_train(params, rng, batch):
        return model.apply(
            {"params": params},
            batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=False,
            rngs={"dropout": rng},
        )[0]

    def apply_eval(params, batch):
        return model.apply(
            {"params": params},
            batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=True,
        )[0]

    opt = torch_adam(lr, weight_decay=0.008)
    train_step, eval_step = make_classifier_steps(
        apply_train, apply_eval, opt, n_classes=6, loss_weights=loss_weights
    )
    return train_step, eval_step, opt


@pytest.mark.slow
def test_graft_and_classifier_step():
    gan_state = init_gan_state(CFG, jax.random.PRNGKey(0))
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _gan_batch()
    batch["label"] = jnp.asarray(np.random.default_rng(2).integers(0, 6, size=(B, L)))
    batch["umask"] = jnp.asarray(np.ones((B, L), dtype=np.float32))

    params = model.init(
        jax.random.PRNGKey(3), batch["audio"], batch["visual"], batch["text"]
    )["params"]
    grafted = graft_generator_params(params, gan_state["params"])
    # grafted generator subtree IS the GAN-trained one
    a0 = jax.tree.leaves(grafted["acoustic_generator"])[0]
    b0 = jax.tree.leaves(gan_state["params"]["acoustic_gen"])[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))

    train_step, eval_step, opt = _make_gan_ffn_steps(model)
    state = init_classifier_state(grafted, opt)
    state, loss, preds = train_step(state, jax.random.PRNGKey(4), batch)
    assert np.isfinite(float(loss))
    assert preds.shape == (B * L,)
    loss_e, preds_e = eval_step(state["params"], batch)
    assert np.isfinite(float(loss_e))


def test_lr_schedule_decay_scales_updates():
    """train_step's lr_scale multiplies the applied update exactly (the
    --lr-schedule decay path); default 1.0 reproduces the reference's
    constant-lr quirk."""
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _gan_batch()
    batch["label"] = jnp.asarray(np.random.default_rng(2).integers(0, 6, size=(B, L)))
    batch["umask"] = jnp.asarray(np.ones((B, L), dtype=np.float32))
    params = model.init(
        jax.random.PRNGKey(3), batch["audio"], batch["visual"], batch["text"]
    )["params"]
    train_step, _, opt = _make_gan_ffn_steps(model)

    def copy(t):
        return jax.tree.map(lambda x: jnp.array(np.asarray(x)), t)

    p0 = copy(params)
    rng = jax.random.PRNGKey(4)
    s_full, _, _ = train_step(init_classifier_state(copy(params), opt), rng, batch)
    s_default, _, _ = train_step(init_classifier_state(copy(params), opt), rng, batch, 1.0)
    s_half, _, _ = train_step(init_classifier_state(copy(params), opt), rng, batch, 0.5)

    for a, b in zip(jax.tree.leaves(s_full["params"]), jax.tree.leaves(s_default["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # delta at scale 0.5 == 0.5 * delta at scale 1.0, leafwise
    for base, full, half in zip(
        jax.tree.leaves(p0), jax.tree.leaves(s_full["params"]), jax.tree.leaves(s_half["params"])
    ):
        np.testing.assert_allclose(
            np.asarray(half - base), 0.5 * np.asarray(full - base), rtol=2e-4, atol=1e-8
        )


@pytest.mark.slow
def test_train_grads_returns_applied_gradients():
    """train_grads=True: the step's 4th return IS the gradient the update
    applied — jax.grad of the same loss at the PRE-update params with the
    step's own dropout key (the reference's ``param.grad`` at histogram
    time, train_IEMOCAP.py:166-168) — and the state transition is unchanged
    from the plain step. run_epoch(train_grads=True) hands those grads to
    the on_batch hook."""
    from gan_ffn_tpu.train.classifier import make_grad_fn

    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    batch = _gan_batch()
    batch["label"] = jnp.asarray(np.random.default_rng(2).integers(0, 6, size=(B, L)))
    batch["umask"] = jnp.asarray(np.ones((B, L), dtype=np.float32))
    params = model.init(
        jax.random.PRNGKey(3), batch["audio"], batch["visual"], batch["text"]
    )["params"]

    def apply_train(p, rng, b):
        return model.apply(
            {"params": p}, b["audio"], b["visual"], b["text"],
            valid_len=b["valid_len"], deterministic=False, rngs={"dropout": rng},
        )[0]

    def apply_eval(p, b):
        return model.apply(
            {"params": p}, b["audio"], b["visual"], b["text"],
            valid_len=b["valid_len"], deterministic=True,
        )[0]

    opt = torch_adam(1e-3, weight_decay=0.008)
    plain_step, _ = make_classifier_steps(apply_train, apply_eval, opt, 6)
    grads_step, _ = make_classifier_steps(
        apply_train, apply_eval, opt, 6, train_grads=True
    )

    def copy(t):
        return jax.tree.map(lambda x: jnp.array(np.asarray(x)), t)

    rng = jax.random.PRNGKey(4)
    s1, loss1, preds1 = plain_step(init_classifier_state(copy(params), opt), rng, batch)
    s2, loss2, preds2, grads = grads_step(
        init_classifier_state(copy(params), opt), rng, batch
    )
    # identical training semantics
    np.testing.assert_array_equal(np.asarray(loss1), np.asarray(loss2))
    np.testing.assert_array_equal(np.asarray(preds1), np.asarray(preds2))
    for a, b in zip(jax.tree.leaves(s1["params"]), jax.tree.leaves(s2["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the returned grads are the pre-update grads under the SAME dropout key
    expected = make_grad_fn(apply_train, 6)(params, rng, batch)
    assert jax.tree.structure(grads) == jax.tree.structure(expected)
    for g, ge in zip(jax.tree.leaves(grads), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(ge), rtol=1e-5, atol=1e-7)

    # run_epoch plumbs them to the hook (one extra arg vs the plain protocol)
    from gan_ffn_tpu.data.loaders import Batch

    rng_np = np.random.default_rng(7)
    loader = [Batch(
        text=rng_np.normal(size=(L, B, 100)).astype(np.float32),
        audio=rng_np.normal(size=(L, B, 100)).astype(np.float32),
        visual=rng_np.normal(size=(L, B, 512)).astype(np.float32),
        qmask=np.eye(2, dtype=np.float32)[rng_np.integers(0, 2, size=(L, B))],
        umask=np.ones((B, L), dtype=np.float32),
        label=rng_np.integers(0, 6, size=(B, L)),
        vids=["d0", "d1"],
        n_real=B,
    )]
    captured = []
    state, _ = run_epoch(
        loader, init_classifier_state(copy(params), opt), train_step=grads_step,
        rng=jax.random.PRNGKey(5), train_grads=True,
        on_batch=lambda i, st, arrays, g: captured.append(g),
    )
    assert len(captured) == 1
    assert jax.tree.structure(captured[0]) == jax.tree.structure(params)


@pytest.mark.slow
def test_eval_attentions_surfaced_in_epoch_result():
    """eval_attentions=True plumbs the model's attention weights through the
    eval step into EpochResult.attentions (the reference's 7th return,
    train_IEMOCAP.py:172-174,196): (L, B, L) att2 alphas for the MELD/
    DialogueRNN family, empty for GAN_FFN, vids captured; train epochs stay
    attention-free."""
    from gan_ffn_tpu.data.loaders import Batch
    from gan_ffn_tpu.models.baselines import MELDLSTMModel
    from gan_ffn_tpu.train.loop import run_epoch

    Lm, Bm, Dm = 7, 3, 12
    rng = np.random.default_rng(4)
    batch = Batch(
        text=rng.normal(size=(Lm, Bm, Dm)).astype(np.float32),
        audio=rng.normal(size=(Lm, Bm, Dm)).astype(np.float32),
        qmask=np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(Lm, Bm))],
        umask=np.ones((Bm, Lm), dtype=np.float32),
        label=rng.integers(0, 7, size=(Bm, Lm)),
        vids=["dia0", "dia1", "dia2"],
        visual=None,
        n_real=Bm,
    )
    model = MELDLSTMModel(D_m=Dm, D_e=8, D_h=8, n_classes=7)
    arrays = batch_to_arrays(batch, with_visual=False)
    params = model.init(
        jax.random.PRNGKey(0), arrays["text"], arrays["qmask"], arrays["umask"]
    )["params"]

    def apply_eval(p, b):
        out = model.apply(
            {"params": p}, b["text"], b["qmask"], b["umask"], deterministic=True
        )
        return out[0], {"alpha": out[1], "alpha_f": out[2], "alpha_b": out[3]}

    def apply_train(p, r, b):
        return model.apply(
            {"params": p}, b["text"], b["qmask"], b["umask"],
            deterministic=False, rngs={"dropout": r},
        )[0]

    opt = torch_adam(1e-3)
    train_step, eval_step = make_classifier_steps(
        apply_train, apply_eval, opt, 7, eval_attentions=True
    )
    res = run_epoch(
        [batch], params, eval_step=eval_step, with_visual=False, eval_attentions=True
    )
    assert res.attentions is not None
    assert len(res.attentions["alpha"]) == 1
    assert res.attentions["alpha"][0].shape == (Lm, Bm, Lm)
    assert res.attentions["alpha_f"] == []  # MELD model has no directional alphas
    assert res.attentions["vids"] == [["dia0", "dia1", "dia2"]]
    # attention rows are softmax distributions over the sequence
    np.testing.assert_allclose(
        res.attentions["alpha"][0].sum(-1), np.ones((Lm, Bm)), rtol=1e-5
    )

    # a partially-padded bucket batch: attention columns are sliced to n_real
    # so alpha[:, j] pairs 1:1 with vids[j] (no padding columns surface)
    padded = dataclasses.replace(batch, vids=["dia0", "dia1"], n_real=2)
    pres = run_epoch(
        [padded], params, eval_step=eval_step, with_visual=False, eval_attentions=True
    )
    assert pres.attentions["alpha"][0].shape == (Lm, 2, Lm)
    assert pres.attentions["vids"] == [["dia0", "dia1"]]
    np.testing.assert_allclose(
        pres.attentions["alpha"][0], res.attentions["alpha"][0][:, :2], rtol=1e-6
    )

    # train epochs carry no attentions (no extra outputs/syncs)
    state = init_classifier_state(params, opt)
    state, tr = run_epoch(
        [batch], state, train_step=train_step, rng=jax.random.PRNGKey(1),
        with_visual=False,
    )
    assert tr.attentions is None

    # GAN_FFN: alphas are empty, the dict still carries vids
    from gan_ffn_tpu.cli.common import make_gan_ffn_apply_fns

    gbatch = Batch(
        text=rng.normal(size=(Lm, Bm, 100)).astype(np.float32),
        audio=rng.normal(size=(Lm, Bm, 100)).astype(np.float32),
        qmask=np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(Lm, Bm))],
        umask=np.ones((Bm, Lm), dtype=np.float32),
        label=rng.integers(0, 6, size=(Bm, Lm)),
        vids=["g0", "g1", "g2"],
        visual=rng.normal(size=(Lm, Bm, 512)).astype(np.float32),
        n_real=Bm,
    )
    gmodel = GAN_FFN(n_classes=6, gen_num_layers=1)
    garrays = batch_to_arrays(gbatch)
    gparams = gmodel.init(
        jax.random.PRNGKey(2), garrays["audio"], garrays["visual"], garrays["text"]
    )["params"]
    gtrain, geval = make_gan_ffn_apply_fns(gmodel, eval_attentions=True)
    _, geval_step = make_classifier_steps(gtrain, geval, opt, 6, eval_attentions=True)
    gres = run_epoch([gbatch], gparams, eval_step=geval_step, eval_attentions=True)
    assert gres.attentions["alpha"] == []
    assert gres.attentions["vids"] == [["g0", "g1", "g2"]]


def test_lambdalr_quirk_effective_lr_is_base_lr_torch_oracle():
    """Torch oracle pinning the reference's per-batch LambdaLR re-creation
    quirk (train_IEMOCAP.py:129-133,170): a FRESH ``LambdaLR(0.98**epoch)``
    constructed inside the batch loop resets the group lr to
    ``initial_lr * lambda(0) = lr0`` before ``optimizer.step`` runs, so every
    applied step uses the BASE lr — constant, not lr0*0.98 and not a decay.
    Our default ``lr_scale=1.0`` (train/classifier.py) matches this exactly;
    SURVEY.md §2.8's earlier "effectively lr0*0.98" reading was wrong.
    """
    import torch

    lr0 = 0.1
    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=lr0)  # SGD: applied step == group lr * grad
    seen_lrs, deltas = [], []
    for _epoch in range(3):
        for _batch in range(2):
            # the reference's exact per-batch sequence (train_IEMOCAP.py:
            # 129-133 construct, 165-170 backward/step/scheduler.step)
            scheduler = torch.optim.lr_scheduler.LambdaLR(
                opt, lr_lambda=lambda epoch: 0.98**epoch
            )
            opt.zero_grad()
            loss = w.sum()  # grad == 1
            loss.backward()
            seen_lrs.append(opt.param_groups[0]["lr"])
            before = float(w.detach())
            opt.step()
            deltas.append(before - float(w.detach()))
            scheduler.step()
    # the lr actually applied by optimizer.step is the base lr every batch
    assert seen_lrs == pytest.approx([lr0] * 6)
    assert deltas == pytest.approx([lr0] * 6)  # NOT lr0*0.98, NOT decaying


@pytest.mark.slow
def test_mini_end_to_end_iemocap_slice(iemocap_pickle):
    """GAN pre-train (1 epoch) -> graft -> classifier train (2 epochs) -> eval.

    On class-separable synthetic features the train loss must drop.
    """
    train_loader, valid_loader, test_loader = get_iemocap_loaders(
        iemocap_pickle, batch_size=8, valid=0.1, buckets=(48,)
    )
    cfg = GANConfig(num_layers=1)
    gan_state = init_gan_state(cfg, jax.random.PRNGKey(0))
    gan_step = make_gan_train_step(cfg)
    rng = jax.random.PRNGKey(1)
    for batch in train_loader:
        arrays = batch_to_arrays(batch)
        gan_batch = {
            "text": arrays["text"], "visual": arrays["visual"], "audio": arrays["audio"],
            "valid_len": arrays["valid_len"], "n_real": arrays["n_real"],
        }
        rng, sub = jax.random.split(rng)
        gan_state, losses = gan_step(gan_state, gan_batch, sub)
    assert np.isfinite(float(losses["acoustic_G_loss"]))

    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    sample = batch_to_arrays(next(iter(train_loader)))
    params = model.init(
        jax.random.PRNGKey(2), sample["audio"], sample["visual"], sample["text"]
    )["params"]
    params = graft_generator_params(params, gan_state["params"])
    train_step, eval_step, opt = _make_gan_ffn_steps(model, lr=1e-3)
    state = init_classifier_state(params, opt)

    losses = []
    for epoch in range(3):
        state, res = run_epoch(
            train_loader, state, train_step=train_step, rng=jax.random.PRNGKey(10 + epoch)
        )
        losses.append(res.avg_loss)
    assert losses[-1] < losses[0], losses

    test_res = run_epoch(test_loader, state["params"], eval_step=eval_step)
    assert np.isfinite(test_res.avg_loss)
    assert 0 <= test_res.avg_fscore <= 100
    assert len(test_res.labels) == len(test_res.preds) == len(test_res.masks)


@pytest.mark.slow
def test_training_determinism():
    """Same seeds => bit-identical losses and params across two fresh runs
    (the reference pins seed 3407 + cudnn-deterministic for the same purpose,
    train_IEMOCAP.py:46-53)."""

    def one_run():
        state = init_gan_state(CFG, jax.random.PRNGKey(7))
        step = make_gan_train_step(CFG)
        s, losses = step(state, _gan_batch(3), jax.random.PRNGKey(8))
        model = GAN_FFN(n_classes=6, gen_num_layers=1)
        batch = _gan_batch(3)
        batch["label"] = jnp.asarray(np.random.default_rng(9).integers(0, 6, size=(B, L)))
        batch["umask"] = jnp.asarray(np.ones((B, L), dtype=np.float32))
        params = model.init(jax.random.PRNGKey(10), batch["audio"], batch["visual"], batch["text"])["params"]
        params = graft_generator_params(params, s["params"])
        train_step, eval_step, opt = _make_gan_ffn_steps(model)
        cs = init_classifier_state(params, opt)
        cs, loss, preds = train_step(cs, jax.random.PRNGKey(11), batch)
        return float(losses["acoustic_G_loss"]), float(loss), np.asarray(preds)

    g1, l1, p1 = one_run()
    g2, l2, p2 = one_run()
    assert g1 == g2
    assert l1 == l2
    np.testing.assert_array_equal(p1, p2)


@pytest.mark.slow
def test_gan_step_golden_values():
    """Golden regression pin: exact first-step duel losses on CPU f32 for a
    fixed seed/batch. Catches unintended semantic drift in the adversarial
    engine across refactors (recorded 2026-08-16)."""
    import jax.numpy as jnp2

    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "valid_len": jnp.asarray(L, dtype=jnp.int32),
        "n_real": jnp.asarray(B, dtype=jnp.int32),
    }
    state = init_gan_state(CFG, jax.random.PRNGKey(7))
    step = make_gan_train_step(CFG)
    _, losses = step(state, batch, jax.random.PRNGKey(8))
    golden = {
        "acoustic_G_loss": 0.767894,
        "visual_G_loss": 0.618192,
        "text_G_loss": 0.616881,
        "visual_D_loss": 0.713854,
        "text_D_loss": 0.678498,
        "acoustic_D_loss": 0.700438,
    }
    for k, v in golden.items():
        assert float(losses[k]) == pytest.approx(v, abs=2e-4), k


@pytest.mark.slow
def test_stage_a_loss_trajectory_band(iemocap_pickle):
    """Tolerance-banded training-dynamics regression for stage A: 15 epochs
    of the fused 12-duel schedule (1-layer nets) on the session fixture must
    reproduce the recorded loss trajectory within ±0.05. Complements the
    single-step golden test (test_gan_step_golden_values) at depth — a
    semantic change to the duel ordering, detach semantics, optimizer
    threading, or loss masking moves these numbers far beyond the band.
    (The deep 8-layer head-to-head against the reference's own train_GAN —
    scripts/ab_gan_fingerprint.py — is committed in VALIDATION.md.)"""
    from gan_ffn_tpu.cli.common import train_gan
    from gan_ffn_tpu.data import get_iemocap_loaders

    train_loader, _, _ = get_iemocap_loaders(iemocap_pickle, batch_size=32, valid=0.1)
    cfg = GANConfig(num_layers=1, aot_cache=False)
    state, history = train_gan(
        cfg, train_loader, 15, log_every_batch=False, log=lambda s: None
    )
    # recorded from this exact configuration (threefry PRNG, CPU f32)
    expected = {
        5: {"acoustic_G_loss": 0.6322, "visual_G_loss": 0.5936, "text_G_loss": 0.6046,
            "visual_D_loss": 0.6895, "text_D_loss": 0.7056, "acoustic_D_loss": 0.7093},
        10: {"acoustic_G_loss": 0.6305, "visual_G_loss": 0.5857, "text_G_loss": 0.6132,
             "visual_D_loss": 0.6815, "text_D_loss": 0.7137, "acoustic_D_loss": 0.7144},
        15: {"acoustic_G_loss": 0.6201, "visual_G_loss": 0.5830, "text_G_loss": 0.6142,
             "visual_D_loss": 0.6751, "text_D_loss": 0.7142, "acoustic_D_loss": 0.7162},
    }
    for epoch, row in expected.items():
        got = history[epoch - 1]
        for key, want in row.items():
            assert abs(got[key] - want) < 0.05, (
                f"epoch {epoch} {key}: {got[key]:.4f} drifted from {want:.4f}"
            )


@pytest.mark.slow
def test_full_pipeline_f1_band(tmp_path, monkeypatch):
    """Banded quality regression for the COMPLETE pipeline (stage A -> graft
    -> stage B -> best-by-min-test-loss F1) on the label-noised fixture the
    torch-vs-jax full-pipeline A/B ran on (scripts/ab_full_pipeline.py,
    PARITY.md "Full-pipeline quality A/B": torch 8-layer vs jax 8-layer both
    converge to the ~79% accuracy ceiling; committed band there).

    The CPU-affordable rendition trains depth-1 encoders at lr 3e-4 for 30
    epochs on the same 120-dialogue fixture (round 5 shortened it from 60:
    the min-loss epoch falls before 30, so the 30-epoch snapshot lands the
    SAME weighted F1 = 76.61 the 60-epoch run did — measured, band
    tightness unchanged — at ~half the suite cost). The run is fully
    deterministic at a fixed jax version (seed 3407, CPU f32; NOTE the CLI
    runtime switches the PRNG impl to rbg before any training key is drawn,
    so the recorded values are RBG-stream products — an XLA/jax upgrade may
    redraw dropout masks like a new seed). Observed at round-5 HEAD:
    weighted F1 = 76.61 and best test loss = 0.9419, bands drawn tight
    around them (F1 +/- 4.6, loss +/- 0.10) — a real dynamics regression of
    a few F1 points anywhere in the pipeline (loaders, duels, graft, masked
    loss, best-epoch selection) fails the suite, while platform-level
    float wiggle stays well inside."""
    fixture = str(tmp_path / "IEMOCAP_features.pkl")
    from gan_ffn_tpu.data.synthetic import write_synthetic_iemocap

    write_synthetic_iemocap(
        fixture, n_train=120, n_test=31, min_len=6, max_len=24,
        class_spread=2.0, label_noise=0.25, seed=3407,
    )
    monkeypatch.chdir(tmp_path)  # the CLI writes output/, GAN_save/ to cwd
    from gan_ffn_tpu.cli.train_iemocap import main

    try:
        res = main([
            "--data-path", fixture, "--epochs", "30", "--GAN-epochs", "2",
            "--continue-train-GAN-step", "0", "--num-layers", "1",
            "--gan-schedule", "stepwise", "--batch-size", "32",
            "--lr", "0.0003",
        ])
    finally:
        import jax

        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert 72.0 <= res["f1"] <= 81.2, res
    assert 0.84 <= float(res["best_loss"]) <= 1.04, res


@pytest.mark.slow
def test_meld_pipeline_f1_band(tmp_path, monkeypatch):
    """Banded quality regression for the COMPLETE MELD entry on the
    label-noised fixture the torch-vs-jax MELD A/B ran on
    (scripts/ab_meld_pipeline.py, PARITY.md "MELD full-pipeline quality
    A/B": the reference's own train_MELD.py --no-cuda and this CLI both
    landed final weighted F1 = 75.77, |delta| = 0.00). This is the jax
    side of that A/B shortened to 25 epochs (round 5; best-by-max-test-F1
    reaches the SAME F1 = 75.77 by epoch 25 — measured, band tightness
    unchanged — at half the suite cost; seed 3407, 7-class, ~78.6% accuracy
    ceiling at 25% label noise); the F1 band is drawn around
    the observed values (75.77 in the A/B process, 75.97 under the 8-device
    test harness) so a real dynamics regression in the MELDLSTMModel path,
    loaders, masked loss, or best-epoch selection fails the suite. The loss
    is only sanity-bounded: best-by-max-test-F1 selection records the loss
    at whatever epoch F1 peaked, and past convergence the NLL grows
    overconfident on the noisy labels while F1 holds the ceiling, so tiny
    numeric perturbations legitimately move the recorded loss by ~0.7
    (observed 1.13 vs 1.84 across environments at F1 75.8-76.0)."""
    fixture = str(tmp_path / "MELD_features_raw.pkl")
    from gan_ffn_tpu.data.synthetic import write_synthetic_meld

    write_synthetic_meld(
        fixture, n_train=120, n_test=40, min_len=3, max_len=24,
        class_spread=2.0, label_noise=0.25, seed=3407,
    )
    monkeypatch.chdir(tmp_path)  # the CLI writes output/ to cwd
    from gan_ffn_tpu.cli.train_meld import main

    try:
        res = main(["--data-path", fixture, "--epochs", "25"])
    finally:
        # the CLI runtime switches the session-global PRNG impl to rbg;
        # restore the conftest's threefry so later tests' streams are stable
        import jax

        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert 70.5 <= res["f1"] <= 79.5, res
    assert 0.9 <= float(res["best_loss"]) <= 2.2, res


@pytest.mark.slow
def test_dialoguernn_pipeline_f1_band(tmp_path, monkeypatch):
    """Banded quality regression for the COMPLETE DialogueRNN entry (stage A
    -> graft -> GAN_FFN_DialogueRNN -> best-by-min-test-loss F1) on the
    label-noised fixture the torch-vs-jax DialogueRNN A/B ran on
    (scripts/ab_dialoguernn_pipeline.py, PARITY.md "DialogueRNN full-pipeline
    quality A/B": per-epoch trajectory lockstep at reference scale).

    The CPU-affordable rendition: depth-1 encoders, stage A 2 epochs
    (stepwise), stage B 60 epochs at lr 3e-4 on the exact A/B fixture
    (120+31 dialogues, lengths 6-24, 25% label noise, seed 3407). The
    calibration run of this exact configuration (2026-08-18, CPU f32; the
    CLI runtime switches the PRNG impl to rbg, so the recorded values are
    RBG-stream products at the pinned jax version) landed best test loss
    1.437 / weighted F1 30.20 at the
    min-loss snapshot (epoch 56) — mid-convergence on the BiModel's slow
    climb, so the F1 band is wider than the flagship's: the min-loss epoch
    can shift a few epochs across environments and nearby snapshots span F1
    ~25-31. A real dynamics regression anywhere in the recurrent path
    (scan history buffer, party select, masked reversal, graft, loss
    masking, best-epoch selection) lands far outside both bands."""
    fixture = str(tmp_path / "IEMOCAP_features.pkl")
    from gan_ffn_tpu.data.synthetic import write_synthetic_iemocap

    write_synthetic_iemocap(
        fixture, n_train=120, n_test=31, min_len=6, max_len=24,
        class_spread=2.0, label_noise=0.25, seed=3407,
    )
    monkeypatch.chdir(tmp_path)  # the CLI writes output/, GAN_save/ to cwd
    from gan_ffn_tpu.cli.train_iemocap_dialoguernn import main

    try:
        res = main([
            "--data-path", fixture, "--epochs", "60", "--GAN-epochs", "2",
            "--num-layers", "1", "--gan-schedule", "stepwise", "--fresh-GAN",
            "--lr", "0.0003",
        ])
    finally:
        import jax

        jax.config.update("jax_default_prng_impl", "threefry2x32")
    assert 24.0 <= res["f1"] <= 36.5, res
    assert 1.36 <= float(res["best_loss"]) <= 1.51, res



@pytest.mark.slow
def test_gan_step_survives_discriminator_saturation():
    """Integration guard for the stage-A NaN blow-up (PARITY.md round 3):
    drive one duel's discriminator toward saturation by scaling its output
    head so sigmoid outputs hit exactly 0/1 in float32, then run the full
    12-duel step — every loss and every updated parameter must stay finite
    (the reference's torch training survives this; pre-fix our backward
    NaN'd and Adam never recovered)."""
    state = init_gan_state(CFG, jax.random.PRNGKey(0))
    # push visual_disc's final layer to huge logits -> sigmoid saturates
    head = state["params"]["visual_disc"]["net"]["fc3"]
    head["kernel"] = head["kernel"] * 1e4
    head["bias"] = head["bias"] + 1e4

    step = make_gan_train_step(CFG)
    state2, losses = step(state, _gan_batch(5), jax.random.PRNGKey(9))
    for k in LOGGED_LOSS_KEYS:
        assert np.isfinite(float(losses[k])), (k, float(losses[k]))
    for leaf in jax.tree.leaves(state2["params"]):
        assert np.isfinite(np.asarray(leaf)).all()
