"""Jitted classifier train/eval steps (reference train_or_eval_model,
train_IEMOCAP.py:103-197).

One compiled step per bucket shape computes the forward pass, masked NLL, the
backward pass, the Adam update, and per-utterance argmax predictions. The
reference's per-batch device syncs (``.cpu().numpy()`` after every batch)
collapse to one small host transfer of (loss, preds).

Learning-rate quirk preserved: the reference re-creates a
``LambdaLR(0.98**epoch)`` scheduler inside the batch loop every iteration
(train_IEMOCAP.py:129-133,170). Since LambdaLR resets the group lr to
``initial_lr * 0.98^0`` on construction and ``optimizer.step`` runs before
``scheduler.step``, every optimizer step actually uses the BASE lr — i.e. the
effective schedule is constant lr. ``train_step``'s optional ``lr_scale``
argument implements both policies without recompiling: the default 1.0
replicates the reference ("reference" schedule); passing ``0.98**epoch``
applies the decay the reference's scheduler was *meant* to apply ("decay"
schedule, ``--lr-schedule decay`` in the CLIs). The scale multiplies the
final update — exactly what torch's group-lr scaling does (the L2 term is
decayed too, as in torch where weight decay is folded into the gradient).

Generator grafting: ``graft_generator_params`` moves adversarially
pre-trained generator params into a classifier param tree (the reference
passes trained generator *objects* into GAN_FFN's constructor,
train_IEMOCAP.py:629-635); the generators then fine-tune with the classifier
loss exactly as in the reference (train_IEMOCAP.py:661).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..nn.losses import masked_nll_loss

# (params, opt_state) pytree pair
ClassifierState = Dict[str, Any]

GENERATOR_KEYS = ("acoustic_generator", "visual_generator", "text_generator")
# the same subtrees under their GANState names (train/gan.py GEN_NAMES)
GENERATOR_GAN_KEYS = ("acoustic_gen", "visual_gen", "text_gen")


def graft_generator_params(classifier_params: Dict, gan_params: Dict) -> Dict:
    """Replace the classifier's generator subtrees with GAN-trained ones.

    ``gan_params`` maps {"acoustic_gen": ..., "visual_gen": ..., "text_gen": ...}
    (the GANState param dict).
    """
    out = dict(classifier_params)
    mapping = {
        "acoustic_generator": "acoustic_gen",
        "visual_generator": "visual_gen",
        "text_generator": "text_gen",
    }
    for clf_key, gan_key in mapping.items():
        out[clf_key] = gan_params[gan_key]
    return out


def init_classifier_state(
    params: Dict, optimizer: optax.GradientTransformation
) -> ClassifierState:
    return {"params": params, "opt": optimizer.init(params)}


def make_classifier_steps(
    apply_train: Callable,
    apply_eval: Callable,
    optimizer: optax.GradientTransformation,
    n_classes: int,
    loss_weights: Optional[jnp.ndarray] = None,
    aot_cache: bool = False,
    eval_attentions: bool = False,
    train_grads: bool = False,
):
    """Build (train_step, eval_step).

    ``apply_train(params, rng, batch) -> log_prob (L, B, C)`` runs the model
    with dropout active; ``apply_eval(params, batch)`` deterministic.

    Both steps return ``(loss, preds (B*L,))``; labels/masks stay on host in
    the epoch loop. Loss/pred flattening matches the reference: log-probs are
    transposed batch-first then flattened (train_IEMOCAP.py:154-158).

    ``train_grads=True`` makes the train step additionally return the
    gradients the update APPLIED — ``(state, loss, preds, grads)`` — computed
    at the pre-update params with the step's own dropout mask, i.e. exactly
    the reference's ``param.grad`` at histogram time (train_IEMOCAP.py:
    166-168). The grads are the ``value_and_grad`` result the step already
    computes, so the extra cost is only the output buffers (fetched lazily by
    whoever consumes them, e.g. the ``--tb-grad-histograms batch`` hook).

    ``eval_attentions=True`` declares that ``apply_eval`` returns
    ``(log_prob, attn)`` where ``attn`` is any pytree of attention weights
    (e.g. ``{"alpha": (L, B, L), "alpha_f": ..., "alpha_b": ...}``); the eval
    step then returns ``(loss, preds, attn)`` and the epoch loop surfaces the
    weights in ``EpochResult.attentions`` — the interpretability surface the
    reference accumulates on eval epochs (train_IEMOCAP.py:120,172-174,196).
    Train epochs are unaffected (no extra outputs or syncs).

    ``aot_cache=True`` routes both steps through the on-disk executable cache
    (utils/aot.py): fresh processes skip the compile (single-chip topologies;
    multi-device hosts fall back to plain compilation). Dispatch keys on the
    (rng, batch[, lr_scale]) signature only — the state tree's shapes are
    fixed by the model config, and hashing its ~1000 leaves per call costs
    more than the step (the stage-A lesson, PERF.md).
    """
    train_raw, eval_raw = _make_raw_steps(
        apply_train, apply_eval, optimizer, n_classes, loss_weights,
        eval_attentions=eval_attentions, train_grads=train_grads,
    )

    if aot_cache:
        from ..utils.aot import ShapeDispatchingAOT

        return (
            ShapeDispatchingAOT(
                train_raw,
                salt="clf_train_grads" if train_grads else "clf_train",
                donate_argnums=(0,),
                sig_argnums=(1, 2, 3),
            ),
            ShapeDispatchingAOT(eval_raw, salt="clf_eval", sig_argnums=(1,)),
        )
    return jax.jit(train_raw, donate_argnums=(0,)), jax.jit(eval_raw)


def _make_raw_steps(
    apply_train: Callable,
    apply_eval: Callable,
    optimizer: optax.GradientTransformation,
    n_classes: int,
    loss_weights: Optional[jnp.ndarray] = None,
    eval_attentions: bool = False,
    train_grads: bool = False,
):
    """The unjitted (train_step, eval_step) bodies shared by the per-batch
    steps (:func:`make_classifier_steps`) and the epoch-fused scans
    (:func:`make_classifier_epoch_steps`)."""

    def loss_and_preds(log_prob, batch):
        lp = log_prob.transpose(1, 0, 2).reshape(-1, n_classes)  # (B*L, C)
        labels = batch["label"].reshape(-1)
        loss = masked_nll_loss(lp, labels, batch["umask"], loss_weights)
        preds = jnp.argmax(lp, axis=1)
        return loss, preds

    def train_step(state: ClassifierState, rng, batch, lr_scale=1.0):
        def loss_fn(p):
            log_prob = apply_train(p, rng, batch)
            loss, preds = loss_and_preds(log_prob, batch)
            return loss, preds

        (loss, preds), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, opt = optimizer.update(grads, state["opt"], state["params"])
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state["params"], updates)
        if train_grads:
            return {"params": params, "opt": opt}, loss, preds, grads
        return {"params": params, "opt": opt}, loss, preds

    if eval_attentions:

        def eval_step(params, batch):
            log_prob, attn = apply_eval(params, batch)
            loss, preds = loss_and_preds(log_prob, batch)
            return loss, preds, attn

    else:

        def eval_step(params, batch):
            log_prob = apply_eval(params, batch)
            return loss_and_preds(log_prob, batch)

    return train_step, eval_step


def make_classifier_epoch_steps(
    apply_train: Callable,
    apply_eval: Callable,
    optimizer: optax.GradientTransformation,
    n_classes: int,
    loss_weights: Optional[jnp.ndarray] = None,
    aot_cache: bool = False,
    eval_attentions: bool = False,
):
    """Epoch-fused (train_epoch_step, eval_epoch_step): ONE program scanning
    the classifier step over a stacked group of same-shape batches.

    Motivation: classifier train steps thread state sequentially, so their
    tunnel dispatch round-trips cannot overlap — the stage-A fusion move
    (:func:`~gan_ffn_tpu.train.gan.make_gan_epoch_step`, 4.4×) applied to
    stage B. MEASURED (PERF.md "stage-B dispatch"): a WASH for both
    classifier families — their 19/33 ms device compute already hides the
    round-trip, unlike stage A's 5 ms step. Kept because ``--epoch-fused``
    fuses both stages and this leg has no steady-state throughput cost
    (its first-process compile is ~20 s slower on the flagship, PERF.md).

    - ``train_epoch_step(state, stacked, keys[, lr_scale]) ->
      (state, (losses (N,), preds (N, B*L)))`` where ``stacked`` carries
      each batch tensor with a leading step axis and ``keys`` is the (N, 2)
      stack of per-batch PRNG keys — the SAME keys the per-batch loop in
      train/loop.py::run_epoch would have split, so a single-group epoch is
      numerically identical to N per-batch dispatches (pinned by
      tests/test_epoch_fused_classifier.py).
    - ``eval_epoch_step(params, stacked) -> (losses, preds[, attn])`` with
      ``attn`` (when ``eval_attentions``) the attention pytree stacked on a
      leading step axis. Eval steps have no cross-batch dependency, but over
      the hosted tunnel each dispatch still pays the full round-trip, so
      they are fused the same way.

    ``train_grads``/``on_batch`` per-batch observability is deliberately NOT
    supported here — a per-batch host hook is the dispatch pattern this path
    exists to remove (the CLIs reject ``--epoch-fused`` +
    ``--tb-grad-histograms batch``).
    """
    train_raw, eval_raw = _make_raw_steps(
        apply_train, apply_eval, optimizer, n_classes, loss_weights,
        eval_attentions=eval_attentions, train_grads=False,
    )

    def train_epoch(state, stacked, keys, lr_scale=1.0):
        def body(st, xs):
            batch, key = xs
            st2, loss, preds = train_raw(st, key, batch, lr_scale)
            return st2, (loss, preds)

        return jax.lax.scan(body, state, (stacked, keys))

    def eval_epoch(params, stacked):
        def body(carry, batch):
            return carry, eval_raw(params, batch)

        _, outs = jax.lax.scan(body, 0, stacked)
        return outs

    if aot_cache:
        from ..utils.aot import ShapeDispatchingAOT

        return (
            ShapeDispatchingAOT(
                train_epoch,
                salt="clf_train_epoch",
                donate_argnums=(0,),
                sig_argnums=(1, 2, 3),
            ),
            ShapeDispatchingAOT(
                eval_epoch,
                salt="clf_eval_epoch_attn" if eval_attentions else "clf_eval_epoch",
                sig_argnums=(1,),
            ),
        )
    return jax.jit(train_epoch, donate_argnums=(0,)), jax.jit(eval_epoch)


def make_grad_fn(
    apply_train: Callable,
    n_classes: int,
    loss_weights: Optional[jnp.ndarray] = None,
):
    """Jitted per-parameter gradient extractor for observability.

    Backs the ``--tensorboard`` per-parameter gradient histograms (the
    reference logs ``writer.add_histogram(name, param.grad)`` for every
    parameter every batch, train_IEMOCAP.py:166-168; here the CLI samples one
    batch per epoch so no per-step host sync is forced).
    """

    def grad_fn(params, rng, batch):
        def loss_fn(p):
            log_prob = apply_train(p, rng, batch)
            lp = log_prob.transpose(1, 0, 2).reshape(-1, n_classes)
            labels = batch["label"].reshape(-1)
            return masked_nll_loss(lp, labels, batch["umask"], loss_weights)

        return jax.grad(loss_fn)(params)

    return jax.jit(grad_fn)
