"""Shared wiring for the CLI entry points.

Implements the reference's two-stage pipeline (adversarial GAN pre-training,
then downstream classifier) as reusable functions so the IEMOCAP, DialogueRNN
and bench entry points share one code path.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import BucketedLoader
from ..train.gan import (
    GANConfig,
    GANState,
    LOGGED_LOSS_KEYS,
    init_gan_state,
    make_gan_train_step,
)
from ..train.loop import prefetch_to_device
from ..utils.artifacts import LossHistory, append_loss_row

# IEMOCAP class weights (train_IEMOCAP.py:653)
IEMOCAP_LOSS_WEIGHTS = np.array(
    [1.2, 0.60072, 0.38066, 0.94019, 0.67924, 0.34332], dtype=np.float32
)


def itr_merge(*itrs):
    """Chain iterators (reference train_IEMOCAP.py:57-60; unused there too —
    kept for API completeness)."""
    for itr in itrs:
        yield from itr


def gan_batch_from(arrays: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {
        "text": arrays["text"],
        "visual": arrays["visual"],
        "audio": arrays["audio"],
        "valid_len": arrays["valid_len"],
        "n_real": arrays["n_real"],
    }


def resolve_epoch_fused_auto(loader: BucketedLoader) -> bool:
    """AUTO policy for ``--epoch-fused`` (the sweep's default, cli/sweep.py).

    Fuse exactly when fusion is numerically IDENTICAL to the per-batch
    loop: every dialogue's length maps to the SAME bucket, so every batch
    of every epoch pads to one shape and the scanned epoch is one group
    (the case pinned by tests/test_epoch_fused.py) — then the 4.4x
    stage-A dispatch win (PERF.md "stage-A dispatch") costs nothing in
    parity. When lengths span several buckets, an epoch's shape groups
    depend on the shuffle and fused updates REORDER across groups relative
    to loader order — a training-dynamics deviation from the reference
    cadence (train_IEMOCAP.py:355-393) the quality A/Bs do not cover — so
    AUTO keeps the per-batch loop and users opt in with ``--epoch-fused``.

    Decidable without simulating epochs: batches pad to the smallest
    bucket >= the batch max length, so "one bucket for every dialogue"
    implies one shape for every possible batch composition.
    """
    buckets = loader.buckets

    def bucket_of(n: int) -> int:
        return next((b for b in buckets if n <= b), buckets[-1])

    dialogue_buckets = {
        bucket_of(loader.dataset[int(i)].length) for i in loader.indices
    }
    fused = len(dialogue_buckets) <= 1
    print(
        f"--epoch-fused AUTO: dialogue lengths span bucket(s) "
        f"{sorted(dialogue_buckets)} -> "
        + ("FUSED (single shape group: numerically identical to the "
           "per-batch loop, one dispatch per epoch)" if fused else
           "per-batch (multi-bucket epochs would reorder updates across "
           "shape groups; pass --epoch-fused to force fusion)")
    )
    return fused


def train_gan(
    cfg: GANConfig,
    train_loader: BucketedLoader,
    epochs: int,
    state: Optional[GANState] = None,
    history: Optional[LossHistory] = None,
    start_epoch: int = 0,
    rng: Optional[jax.Array] = None,
    log: Callable[[str], None] = print,
    log_every_batch: bool = True,
    mesh=None,
    step: Optional[Callable] = None,
    epoch_fused: bool = False,
) -> Tuple[GANState, LossHistory]:
    """Adversarial pre-training stage (reference train_GAN,
    train_IEMOCAP.py:255-393).

    Appends one loss row per epoch (the last batch's losses) to ``history``,
    replicating the reference CSV cadence. With ``mesh``, the 12-duel step
    runs data-parallel over it (the stage the reference data-parallelizes
    with nn.DataParallel, train_IEMOCAP.py:588-593).

    Callers that train in SEGMENTS (the sweep's snapshot-per-point loop,
    resume-and-extend) must build the step once with
    ``make_gan_train_step`` and pass it via ``step`` — a fresh step per
    segment re-lowers and re-loads the cached multi-hundred-MB executables
    on every call (~59 s/segment measured over the hosted tunnel).

    ``epoch_fused`` (opt-in, ``--epoch-fused``) dispatches ONE
    ``make_gan_epoch_step`` program per same-shape batch group per epoch
    instead of one program per batch — the hosted stage-A step is
    dispatch-bound, not compute-bound (PERF.md "stage-A dispatch"). Every
    batch gets the exact PRNG key the per-batch loop would have split
    (loader order), so a single-group epoch is numerically identical; when
    an epoch spans several bucket shapes the groups run sequentially, so
    parameter updates REORDER across groups relative to loader order (the
    CSV row still reports the last batch in loader order). ``step`` must
    then be a ``make_gan_epoch_step`` product if given.
    """
    if state is None:
        state = init_gan_state(cfg, jax.random.PRNGKey(cfg.seed))
    if history is None:
        history = []
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed + 1)
    if step is None:
        if epoch_fused:
            from ..train.gan import make_gan_epoch_step

            step = make_gan_epoch_step(cfg, mesh=mesh)
        else:
            step = make_gan_train_step(cfg, mesh=mesh)
    if mesh is not None:
        from ..parallel.mesh import replicate

        state = replicate(state, mesh)

    log("=" * 15 + " start training GAN " + "=" * 15)
    for epoch in range(start_epoch, start_epoch + epochs):
        t0 = time.time()
        utterances = 0
        # dispatch all batches asynchronously; fetch losses once per epoch.
        # prefetch overlaps the next batch's H2D copy with the current step
        # (same pipeline the classifier's run_epoch uses)
        epoch_losses = []
        if epoch_fused:
            items = [
                (batch, gan_batch_from(arrays))
                for batch, arrays in prefetch_to_device(train_loader)
            ]
            if not items:
                continue
            # the per-batch loop's exact key chain, in loader order
            keys = []
            for _ in items:
                rng, sub = jax.random.split(rng)
                keys.append(sub)
            # group same-shape batches (stable order within a group)
            groups: Dict[tuple, list] = {}
            for idx, (_, gb) in enumerate(items):
                sig = tuple((k, tuple(gb[k].shape)) for k in sorted(gb))
                groups.setdefault(sig, []).append(idx)
            rows = [None] * len(items)
            for idxs in groups.values():
                stacked = {
                    k: jnp.stack([items[i][1][k] for i in idxs])
                    for k in items[idxs[0]][1]
                }
                kstack = jnp.stack([keys[i] for i in idxs])
                state, group_losses = step(state, stacked, kstack)
                # ONE transfer per group (6 small arrays) — per-scalar
                # indexing would pay 6N of the dispatch round-trips this
                # path exists to remove
                fetched_group = jax.device_get(
                    {k: group_losses[k] for k in LOGGED_LOSS_KEYS}
                )
                for j, i in enumerate(idxs):
                    rows[i] = {k: fetched_group[k][j] for k in LOGGED_LOSS_KEYS}
            utterances = sum(b.n_utterances for b, _ in items)
            epoch_losses = rows
        else:
            for batch, arrays in prefetch_to_device(train_loader):
                rng, sub = jax.random.split(rng)
                gan_batch = gan_batch_from(arrays)
                if mesh is not None:
                    from ..parallel.mesh import shard_batch

                    gan_batch = shard_batch(gan_batch, mesh)
                state, losses = step(state, gan_batch, sub)
                utterances += batch.n_utterances
                epoch_losses.append({k: losses[k] for k in LOGGED_LOSS_KEYS})
        if not epoch_losses:
            continue
        fetched = jax.device_get(epoch_losses)
        dt = time.time() - t0
        if log_every_batch:
            for row in fetched:
                vals = " ".join(f"{k}={float(row[k]):.4f}" for k in LOGGED_LOSS_KEYS)
                log(f"GAN epoch {epoch} {vals}")
        append_loss_row(history, epoch, {k: float(fetched[-1][k]) for k in LOGGED_LOSS_KEYS})
        log(
            f"GAN epoch {epoch} done in {dt:.2f}s "
            f"({12 * utterances / max(dt, 1e-9):.1f} duel-utterances/sec)"
        )
    return state, history


def make_gan_ffn_apply_fns(model, eval_attentions: bool = False):
    """(apply_train, apply_eval) for the GAN_FFN flagship classifier.

    With ``eval_attentions``, ``apply_eval`` returns ``(log_prob, attn)``
    for ``make_classifier_steps(..., eval_attentions=True)`` — GAN_FFN's
    alphas are empty (model.py:1458-1461), so the dict mirrors the
    reference's empty accumulation on this model."""

    def apply_train(params, rng, batch):
        return model.apply(
            {"params": params},
            batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=False,
            rngs={"dropout": rng},
        )[0]

    def apply_eval(params, batch):
        out = model.apply(
            {"params": params},
            batch["audio"], batch["visual"], batch["text"],
            valid_len=batch["valid_len"], deterministic=True,
        )
        if eval_attentions:
            return out[0], {"alpha": out[1], "alpha_f": out[2], "alpha_b": out[3]}
        return out[0]

    return apply_train, apply_eval


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
