"""Epoch loops: device feeding, metric accumulation (reference
train_or_eval_model, train_IEMOCAP.py:103-197).

Per-epoch outputs mirror the reference tuple: (avg_loss, avg_accuracy, labels,
preds, masks, weighted_f1). avg_loss is the reference's mask-weighted batch
average: sum_b(loss_b * mask_sum_b) / sum_b(mask_sum_b).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import Batch
from ..evaluation.metrics import accuracy_score, f1_score


def batch_to_arrays(batch: Batch, with_visual: bool = True) -> Dict[str, jnp.ndarray]:
    """Host Batch -> device array dict with static shapes + scalar metadata."""
    arrays = {
        "text": jnp.asarray(batch.text),
        "audio": jnp.asarray(batch.audio),
        "qmask": jnp.asarray(batch.qmask),
        "umask": jnp.asarray(batch.umask),
        "label": jnp.asarray(batch.label),
        "valid_len": jnp.asarray(int(batch.umask.sum(axis=1).max()), dtype=jnp.int32),
        "n_real": jnp.asarray(batch.n_real, dtype=jnp.int32),
    }
    if with_visual and batch.visual is not None:
        arrays["visual"] = jnp.asarray(batch.visual)
    return arrays


def prefetch_to_device(batches: Iterable[Batch], size: int = 2, with_visual: bool = True):
    """Async host->device prefetch: keeps ``size`` batches in flight so the
    H2D copy of batch n+1 overlaps the compute of batch n.

    (The reference's DataLoader with num_workers=0 copies synchronously per
    batch, train_IEMOCAP.py:136.)
    """
    import collections

    queue = collections.deque()
    it = iter(batches)

    def put_next():
        try:
            batch = next(it)
        except StopIteration:
            return False
        queue.append((batch, batch_to_arrays(batch, with_visual=with_visual)))
        return True

    for _ in range(size):
        if not put_next():
            break
    while queue:
        batch, arrays = queue.popleft()
        put_next()
        yield batch, arrays


@dataclasses.dataclass
class EpochResult:
    avg_loss: float
    avg_accuracy: float
    labels: np.ndarray
    preds: np.ndarray
    masks: np.ndarray
    avg_fscore: float
    # Eval-epoch attention weights, populated when the epoch ran with
    # ``eval_attentions=True`` (the reference's 7th return,
    # ``attentions = [alphas, alphas_f, alphas_b, vids]``,
    # train_IEMOCAP.py:120,172-174,196): a dict mapping each attention key
    # (e.g. "alpha" (L, B, L) for DialogueRNN/MELD att2; empty for GAN_FFN)
    # to a list of per-batch arrays, plus "vids" — the dialogue ids, batch
    # order. The batch axis (axis 1) of each array is sliced to that batch's
    # ``n_real`` real dialogues, so ``attentions[key][i][:, j]`` always pairs
    # with ``attentions["vids"][i][j]`` — fixed-bucket padding columns never
    # appear here. None on train epochs and attention-less eval steps.
    attentions: Optional[Dict[str, list]] = None


def run_epoch(
    loader: Iterable[Batch],
    state,
    train_step: Optional[Callable] = None,
    eval_step: Optional[Callable] = None,
    rng: Optional[jax.Array] = None,
    with_visual: bool = True,
    lr_scale: Optional[float] = None,
    on_batch: Optional[Callable] = None,
    eval_attentions: bool = False,
    train_grads: bool = False,
):
    """Run one epoch. With ``train_step`` set, trains (threading state through
    steps) and returns (state, EpochResult); otherwise evaluates with
    ``eval_step`` and returns EpochResult.

    ``eval_attentions`` declares the eval step's return protocol explicitly
    (mirroring ``make_classifier_steps``): True means ``eval_step`` returns
    ``(loss, preds, attn)`` and the attention pytree is surfaced in
    ``EpochResult.attentions``; False means ``(loss, preds)``.

    ``on_batch(batch_index, state, arrays)`` is invoked after every train
    step — the hook behind per-batch observability (the reference's
    ``--tensorboard`` per-batch grad histograms, train_IEMOCAP.py:166-168).
    A hook that fetches device values forces a per-batch sync, giving up this
    loop's async dispatch; that is the documented cost of per-batch cadence.

    ``train_grads`` declares the train step's return protocol explicitly
    (mirroring ``make_classifier_steps``): True means ``train_step`` returns
    ``(state, loss, preds, grads)`` where ``grads`` are the gradients that
    step APPLIED, and the hook is called as
    ``on_batch(batch_index, state, arrays, grads)`` — the reference's
    ``param.grad`` semantics for per-batch histograms.
    """
    # Device values are accumulated WITHOUT per-batch host syncs (the
    # reference forces a device->host transfer after every batch,
    # train_IEMOCAP.py:159-162); everything is fetched in one transfer at
    # epoch end, so step dispatch stays fully asynchronous.
    dev_losses: List = []
    dev_preds: List = []
    dev_attns: List = []  # per-batch attention pytrees (eval only)
    all_vids: List = []
    batch_mask_sums: List[float] = []
    all_labels: List[np.ndarray] = []
    all_masks: List[np.ndarray] = []

    n_batches = 0
    for batch, arrays in prefetch_to_device(loader, with_visual=with_visual):
        if train_step is not None:
            rng, sub = jax.random.split(rng)
            step_args = (state, sub, arrays) if lr_scale is None else (
                state, sub, arrays, lr_scale
            )
            if train_grads:
                state, loss, preds, grads = train_step(*step_args)
                if on_batch is not None:
                    on_batch(n_batches, state, arrays, grads)
            else:
                state, loss, preds = train_step(*step_args)
                if on_batch is not None:
                    on_batch(n_batches, state, arrays)
        else:
            if eval_attentions:
                loss, preds, attn = eval_step(state, arrays)
                dev_attns.append((attn, batch.n_real))
                all_vids.append(list(batch.vids))
            else:
                loss, preds = eval_step(state, arrays)
        mask_flat = batch.umask.reshape(-1)
        dev_losses.append(loss)
        dev_preds.append(preds)
        batch_mask_sums.append(mask_flat.sum())
        all_labels.append(batch.label.reshape(-1))
        all_masks.append(mask_flat)
        n_batches += 1

    if n_batches == 0:
        empty = EpochResult(float("nan"), float("nan"), np.array([]), np.array([]), np.array([]), float("nan"))
        return (state, empty) if train_step is not None else empty

    # one host transfer for the whole epoch (attentions included)
    fetched = jax.device_get((dev_losses, dev_preds, dev_attns))
    losses = [
        float(l) * s for l, s in zip(fetched[0], batch_mask_sums)
    ]
    preds = np.concatenate([np.asarray(p) for p in fetched[1]])
    labels = np.concatenate(all_labels)
    masks = np.concatenate(all_masks)
    attentions = None
    if fetched[2]:
        attentions = {"vids": all_vids}
        for key in fetched[2][0][0]:
            # slice the batch axis (axis 1) down to n_real so columns align
            # 1:1 with the vids list (trailing columns are bucket padding)
            per_batch = [
                np.asarray(a[key])[:, :n_real]
                for a, n_real in fetched[2]
                if a[key] is not None and np.size(a[key])
            ]
            attentions[key] = per_batch
    avg_loss = round(float(np.sum(losses) / np.sum(masks)), 4)
    avg_acc = round(accuracy_score(labels, preds, sample_weight=masks) * 100, 2)
    avg_f1 = round(f1_score(labels, preds, sample_weight=masks, average="weighted") * 100, 2)
    result = EpochResult(avg_loss, avg_acc, labels, preds, masks, avg_f1, attentions)
    return (state, result) if train_step is not None else result


def run_epoch_fused(
    loader: Iterable[Batch],
    state,
    train_epoch_step: Optional[Callable] = None,
    eval_epoch_step: Optional[Callable] = None,
    rng: Optional[jax.Array] = None,
    with_visual: bool = True,
    lr_scale: Optional[float] = None,
    eval_attentions: bool = False,
):
    """Epoch-fused counterpart of :func:`run_epoch`: ONE scanned-program
    dispatch per same-shape batch group instead of one dispatch per batch
    (steps from ``make_classifier_epoch_steps``).

    Built on the hypothesis that stage B is dispatch-bound like stage A
    (state threads sequentially, so per-batch dispatches cannot overlap);
    the interleaved A/B measured it as a WASH — the 19/33 ms classifier
    steps hide the tunnel round-trip (PERF.md "stage-B dispatch"). Kept
    because ``--epoch-fused`` fuses both stages and the stage-B leg has no
    steady-state throughput cost (first-process compile pays ~20 s extra on
    the flagship: fused-epoch 88.9 s vs per-step 68.8 s, PERF.md).

    Semantics match :func:`run_epoch` bit-for-bit on a single-bucket epoch:
    every batch gets the exact PRNG key the per-batch loop would have split
    (loader order), and losses/preds/labels/masks are re-assembled in loader
    order before the metric computation (pinned by
    tests/test_epoch_fused_classifier.py). When an epoch spans several
    bucket shapes, the groups run sequentially, so TRAIN parameter updates
    reorder across groups relative to loader order (the documented
    ``--epoch-fused`` trade, same as stage A's). Eval epochs have no state,
    so grouping never changes their results.

    Per-batch observability (``on_batch``/``train_grads``) is not supported
    — a per-batch host hook is the dispatch pattern this path removes.
    """
    items = list(prefetch_to_device(loader, with_visual=with_visual))
    training = train_epoch_step is not None
    if not items:
        empty = EpochResult(float("nan"), float("nan"), np.array([]), np.array([]), np.array([]), float("nan"))
        return (state, empty) if training else empty

    keys = []
    if training:
        # the per-batch loop's exact key chain, in loader order
        for _ in items:
            rng, sub = jax.random.split(rng)
            keys.append(sub)

    # group same-shape batches (stable order within a group)
    groups: Dict[tuple, list] = {}
    for idx, (_, arrays) in enumerate(items):
        sig = tuple((k, tuple(arrays[k].shape)) for k in sorted(arrays))
        groups.setdefault(sig, []).append(idx)

    n = len(items)
    row_loss: List = [None] * n
    row_preds: List = [None] * n
    row_attn: List = [None] * n
    for idxs in groups.values():
        stacked = {
            k: jnp.stack([items[i][1][k] for i in idxs])
            for k in items[idxs[0]][1]
        }
        if training:
            kstack = jnp.stack([keys[i] for i in idxs])
            step_args = (state, stacked, kstack) if lr_scale is None else (
                state, stacked, kstack, lr_scale
            )
            state, (losses, preds) = train_epoch_step(*step_args)
            attn = None
        else:
            out = eval_epoch_step(state, stacked)
            if eval_attentions:
                losses, preds, attn = out
            else:
                losses, preds = out
                attn = None
        # device-side row slices stay lazy; ONE device_get fetches the epoch
        for j, i in enumerate(idxs):
            row_loss[i] = losses[j]
            row_preds[i] = preds[j]
            if attn is not None:
                row_attn[i] = jax.tree.map(lambda a: a[j], attn)

    all_labels = [b.label.reshape(-1) for b, _ in items]
    all_masks = [b.umask.reshape(-1) for b, _ in items]
    batch_mask_sums = [m.sum() for m in all_masks]

    fetched = jax.device_get((row_loss, row_preds,
                              row_attn if not training and eval_attentions else []))
    losses = [float(l) * s for l, s in zip(fetched[0], batch_mask_sums)]
    preds = np.concatenate([np.asarray(p) for p in fetched[1]])
    labels = np.concatenate(all_labels)
    masks = np.concatenate(all_masks)
    attentions = None
    if not training and eval_attentions and fetched[2] and fetched[2][0] is not None:
        attentions = {"vids": [list(b.vids) for b, _ in items]}
        for key in fetched[2][0]:
            per_batch = [
                np.asarray(a[key])[:, : items[i][0].n_real]
                for i, a in enumerate(fetched[2])
                if a[key] is not None and np.size(a[key])
            ]
            attentions[key] = per_batch
    avg_loss = round(float(np.sum(losses) / np.sum(masks)), 4)
    avg_acc = round(accuracy_score(labels, preds, sample_weight=masks) * 100, 2)
    avg_f1 = round(f1_score(labels, preds, sample_weight=masks, average="weighted") * 100, 2)
    result = EpochResult(avg_loss, avg_acc, labels, preds, masks, avg_f1, attentions)
    return (state, result) if training else result
