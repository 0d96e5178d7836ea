"""Epoch-fused stage B: lax.scan of the classifier step over an epoch.

``make_classifier_epoch_steps`` / ``run_epoch_fused`` exist because the
classifier train steps thread state sequentially, so their per-batch
dispatches cannot overlap over the hosted tunnel — stage B is
dispatch-bound exactly like stage A was (PERF.md "stage-A dispatch" /
"stage-B dispatch"; the reference's loop additionally forces a host sync
per batch, train_IEMOCAP.py:159-162).

Contracts pinned here:
- a single-group scanned train epoch computes EXACTLY the per-batch loop's
  math, each batch under the same PRNG key the loop would have split
  (loader order), including the optional ``lr_scale``;
- a fused eval epoch reproduces the per-batch eval losses/preds AND the
  ``EpochResult.attentions`` surface (n_real-sliced, vids-aligned);
- ``run_epoch_fused`` reproduces ``run_epoch``'s EpochResult bit-for-bit
  on a single-bucket loader and handles multi-bucket epochs by shape
  grouping (metrics assembled in ORIGINAL loader order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS, make_gan_ffn_apply_fns
from gan_ffn_tpu.models import GAN_FFN
from gan_ffn_tpu.train.classifier import (
    init_classifier_state,
    make_classifier_epoch_steps,
    make_classifier_steps,
)
from gan_ffn_tpu.train.loop import run_epoch, run_epoch_fused
from gan_ffn_tpu.train.optim import torch_adam


def _batches(rng, n, L, B):
    out = []
    for _ in range(n):
        lengths = rng.integers(max(2, L // 2), L + 1, size=B)
        umask = np.zeros((B, L), dtype=np.float32)
        for b, ln in enumerate(lengths):
            umask[b, :ln] = 1.0
        out.append({
            "text": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
            "visual": jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32)),
            "audio": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
            "umask": jnp.asarray(umask),
            "label": jnp.asarray(rng.integers(0, 6, size=(B, L))),
            "valid_len": jnp.asarray(L, dtype=jnp.int32),
            "n_real": jnp.asarray(B, dtype=jnp.int32),
        })
    return out


def _tree_allclose(a, b, atol=1e-5):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=0
        ),
        a, b,
    )


@pytest.mark.parametrize("lr_scale", [None, 0.98])
def test_epoch_steps_match_per_batch_steps(lr_scale):
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    rng = np.random.default_rng(5)
    batches = _batches(rng, 3, 8, 4)
    params = model.init(
        jax.random.PRNGKey(0), batches[0]["audio"], batches[0]["visual"],
        batches[0]["text"],
    )["params"]

    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    opt = torch_adam(1e-3, weight_decay=0.008)
    train_step, eval_step = make_classifier_steps(
        apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )
    state = init_classifier_state(params, opt)
    state_copy = jax.tree.map(lambda x: jnp.array(np.asarray(x)), state)

    key = jax.random.PRNGKey(9)
    keys = []
    for _ in batches:  # the exact chain run_epoch splits
        key, sub = jax.random.split(key)
        keys.append(sub)

    loop_losses, loop_preds = [], []
    for b, k in zip(batches, keys):
        args = (state, k, b) if lr_scale is None else (state, k, b, lr_scale)
        state, loss, preds = train_step(*args)
        loop_losses.append(float(loss))
        loop_preds.append(np.asarray(preds))

    train_epoch, eval_epoch = make_classifier_epoch_steps(
        apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )
    stacked = {k2: jnp.stack([b[k2] for b in batches]) for k2 in batches[0]}
    eargs = (
        (state_copy, stacked, jnp.stack(keys))
        if lr_scale is None
        else (state_copy, stacked, jnp.stack(keys), lr_scale)
    )
    state2, (losses2, preds2) = train_epoch(*eargs)

    np.testing.assert_allclose(
        np.asarray(losses2), np.array(loop_losses), atol=1e-5, rtol=0
    )
    np.testing.assert_array_equal(np.asarray(preds2), np.stack(loop_preds))
    _tree_allclose(state["params"], state2["params"])

    # fused eval reproduces the per-batch eval outputs at the final params
    ev_losses, ev_preds = [], []
    for b in batches:
        loss, preds = eval_step(state["params"], b)
        ev_losses.append(float(loss))
        ev_preds.append(np.asarray(preds))
    losses3, preds3 = eval_epoch(state2["params"], stacked)
    np.testing.assert_allclose(
        np.asarray(losses3), np.array(ev_losses), atol=1e-5, rtol=0
    )
    np.testing.assert_array_equal(np.asarray(preds3), np.stack(ev_preds))


@pytest.mark.slow
def test_run_epoch_fused_matches_run_epoch_single_bucket(tmp_path):
    """End-to-end through the loop layer: same loader sequence, same rng —
    run_epoch vs run_epoch_fused must produce the identical EpochResult and
    final params on a single-bucket loader (all lengths < 32)."""
    from gan_ffn_tpu.data import get_iemocap_loaders, write_synthetic_iemocap

    pkl = str(tmp_path / "iemocap.pkl")
    write_synthetic_iemocap(pkl, n_train=12, n_test=4, min_len=18, max_len=28,
                            seed=21)
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    apply_train, apply_eval = make_gan_ffn_apply_fns(model, eval_attentions=True)
    opt = torch_adam(1e-3, weight_decay=0.008)
    weights = jnp.asarray(IEMOCAP_LOSS_WEIGHTS)

    def init_state(loader):
        from gan_ffn_tpu.train.loop import batch_to_arrays

        sample = batch_to_arrays(next(iter(loader)))
        params = model.init(
            jax.random.PRNGKey(0), sample["audio"], sample["visual"],
            sample["text"],
        )["params"]
        return init_classifier_state(params, opt)

    def run(fused):
        train_loader, _, test_loader = get_iemocap_loaders(
            pkl, batch_size=4, valid=0.1, seed=21
        )
        state = init_state(train_loader)
        rng = jax.random.PRNGKey(3)
        if fused:
            train_epoch, eval_epoch = make_classifier_epoch_steps(
                apply_train, apply_eval, opt, 6, weights, eval_attentions=True
            )
            state, train_res = run_epoch_fused(
                train_loader, state, train_epoch_step=train_epoch, rng=rng
            )
            test_res = run_epoch_fused(
                test_loader, state["params"], eval_epoch_step=eval_epoch,
                eval_attentions=True,
            )
        else:
            train_step, eval_step = make_classifier_steps(
                apply_train, apply_eval, opt, 6, weights, eval_attentions=True
            )
            state, train_res = run_epoch(
                train_loader, state, train_step=train_step, rng=rng
            )
            test_res = run_epoch(
                test_loader, state["params"], eval_step=eval_step,
                eval_attentions=True,
            )
        return state, train_res, test_res

    state_a, train_a, test_a = run(False)
    state_b, train_b, test_b = run(True)

    for ra, rb in ((train_a, train_b), (test_a, test_b)):
        assert ra.avg_loss == rb.avg_loss
        assert ra.avg_accuracy == rb.avg_accuracy
        assert ra.avg_fscore == rb.avg_fscore
        np.testing.assert_array_equal(ra.preds, rb.preds)
        np.testing.assert_array_equal(ra.labels, rb.labels)
        np.testing.assert_array_equal(ra.masks, rb.masks)
    _tree_allclose(state_a["params"], state_b["params"])

    # attentions surface: same keys, vids, and per-batch n_real-sliced arrays
    # (GAN_FFN's alphas are empty, matching the reference's empty
    # accumulation — both sides must agree on the emptiness too)
    assert (test_a.attentions is None) == (test_b.attentions is None)
    if test_a.attentions is not None:
        assert set(test_a.attentions) == set(test_b.attentions)
        assert test_a.attentions["vids"] == test_b.attentions["vids"]
        for k in test_a.attentions:
            if k == "vids":
                continue
            arrs_a, arrs_b = test_a.attentions[k], test_b.attentions[k]
            assert len(arrs_a) == len(arrs_b)
            for x, y in zip(arrs_a, arrs_b):
                np.testing.assert_allclose(x, y, atol=1e-6, rtol=0)


@pytest.mark.slow
def test_run_epoch_fused_eval_attentions_meld(tmp_path):
    """Nonempty attention surface: MELDLSTMModel's att2 alpha through the
    fused eval epoch matches the per-batch eval epoch (n_real slicing and
    vids alignment included)."""
    from gan_ffn_tpu.data import get_meld_loaders, write_synthetic_meld
    from gan_ffn_tpu.models import MELDLSTMModel
    from gan_ffn_tpu.train.loop import batch_to_arrays

    pkl = str(tmp_path / "meld.pkl")
    write_synthetic_meld(pkl, n_train=10, n_test=7, seed=13)
    model = MELDLSTMModel(D_m=600, D_e=16, D_h=24, n_classes=7, dropout=0.1)

    def apply_train(p, rng, batch):
        return model.apply(
            {"params": p}, batch["text"], batch["qmask"], batch["umask"],
            deterministic=False, rngs={"dropout": rng},
        )[0]

    def apply_eval(p, batch):
        out = model.apply(
            {"params": p}, batch["text"], batch["qmask"], batch["umask"],
            deterministic=True,
        )
        return out[0], {"alpha": out[1]}

    _, _, test_loader = get_meld_loaders(pkl, batch_size=3, valid=0.0, seed=13)
    sample = batch_to_arrays(next(iter(test_loader)), with_visual=False)
    params = model.init(
        jax.random.PRNGKey(0), sample["text"], sample["qmask"], sample["umask"]
    )["params"]
    opt = torch_adam(1e-3)

    _, eval_step = make_classifier_steps(
        apply_train, apply_eval, opt, 7, eval_attentions=True
    )
    _, eval_epoch = make_classifier_epoch_steps(
        apply_train, apply_eval, opt, 7, eval_attentions=True
    )
    res_a = run_epoch(
        test_loader, params, eval_step=eval_step, with_visual=False,
        eval_attentions=True,
    )
    res_b = run_epoch_fused(
        test_loader, params, eval_epoch_step=eval_epoch, with_visual=False,
        eval_attentions=True,
    )
    assert res_a.avg_loss == res_b.avg_loss
    assert res_a.avg_fscore == res_b.avg_fscore
    np.testing.assert_array_equal(res_a.preds, res_b.preds)
    assert res_a.attentions is not None and res_b.attentions is not None
    assert res_a.attentions["vids"] == res_b.attentions["vids"]
    assert len(res_a.attentions["alpha"]) == len(res_b.attentions["alpha"])
    for x, y in zip(res_a.attentions["alpha"], res_b.attentions["alpha"]):
        # n_real slicing must agree (the last batch has 7 % 3 = 1 real row)
        assert x.shape == y.shape
        np.testing.assert_allclose(x, y, atol=1e-6, rtol=0)


@pytest.mark.slow
def test_run_epoch_fused_multi_bucket(tmp_path):
    """An epoch spanning two bucket shapes runs group-by-group: metrics are
    finite, preds/labels/masks are assembled in ORIGINAL loader order (same
    labels/masks vectors as the per-batch loop sees)."""
    from gan_ffn_tpu.data import get_iemocap_loaders, write_synthetic_iemocap

    pkl = str(tmp_path / "iemocap2.pkl")
    # lengths straddle the 32-bucket boundary -> two shape groups per epoch
    write_synthetic_iemocap(pkl, n_train=12, n_test=4, min_len=20, max_len=60,
                            seed=22)
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    opt = torch_adam(1e-3)
    train_epoch, _ = make_classifier_epoch_steps(apply_train, apply_eval, opt, 6)

    def fresh():
        train_loader, _, _ = get_iemocap_loaders(pkl, batch_size=4, valid=0.1, seed=22)
        return train_loader

    from gan_ffn_tpu.train.loop import batch_to_arrays

    loader = fresh()
    sample = batch_to_arrays(next(iter(loader)))
    params = model.init(
        jax.random.PRNGKey(0), sample["audio"], sample["visual"], sample["text"]
    )["params"]
    state = init_classifier_state(params, opt)

    state, res = run_epoch_fused(
        fresh(), state, train_epoch_step=train_epoch, rng=jax.random.PRNGKey(4)
    )
    assert np.isfinite(res.avg_loss) and np.isfinite(res.avg_fscore)

    # loader-order assembly: labels/masks match what the per-batch loop sees
    ref_labels = np.concatenate(
        [b.label.reshape(-1) for b in fresh()]
    )
    np.testing.assert_array_equal(res.labels, ref_labels)
    assert res.preds.shape == ref_labels.shape
