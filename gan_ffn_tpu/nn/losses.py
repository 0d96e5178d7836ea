"""Masked loss functions (reference model.py:40-114 + the BCE adversarial
loss, train_IEMOCAP.py:300).

All losses take explicit masks so fixed-shape bucket padding contributes
exactly zero, reproducing the reference's dynamic-padding numerics:

- ``masked_nll_loss`` replicates MaskedNLLLoss (model.py:62-81) including its
  quirks: log-probs are multiplied by the mask BEFORE the NLL gather, and the
  weighted variant normalizes by sum(weight[target] * mask).
- ``bce_loss`` replicates ``nn.BCELoss`` (mean reduction, log clamp at -100)
  but takes a mask marking the positions the reference's dynamically-shaped
  target tensors would have covered (t < batch max length, real dialogue
  columns).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def masked_nll_loss(
    log_probs: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MaskedNLLLoss.

    log_probs (N, C); target (N,) int; mask any shape reshaping to (N,);
    weight optional (C,).
    """
    mask_flat = mask.reshape(-1).astype(log_probs.dtype)
    picked = jnp.take_along_axis(log_probs, target[:, None].astype(jnp.int32), axis=1)[:, 0]
    # reference computes NLL over (pred * mask): picked log-prob scaled by mask
    picked = picked * mask_flat
    if weight is None:
        loss_sum = -jnp.sum(picked)
        return loss_sum / jnp.sum(mask_flat)
    w = weight[target]
    loss_sum = -jnp.sum(w * picked)
    return loss_sum / jnp.sum(w * mask_flat)


def unmasked_weighted_nll_loss(
    log_probs: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """UnMaskedWeightedNLLLoss (model.py:99-114)."""
    picked = jnp.take_along_axis(log_probs, target[:, None].astype(jnp.int32), axis=1)[:, 0]
    if weight is None:
        return -jnp.sum(picked)
    w = weight[target]
    return -jnp.sum(w * picked) / jnp.sum(w)


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MaskedMSELoss (model.py:84-96): MSE(pred*mask, target)_sum / sum(mask).

    Note the reference does NOT mask the target — preserved.
    """
    return jnp.sum(jnp.square(pred * mask - target)) / jnp.sum(mask)


def focal_loss(
    log_probs: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    gamma: float = 0.0,
) -> jnp.ndarray:
    """FocalLoss (model.py:40-59): masked CE -> focal reweighting.

    The reference feeds *log-probabilities* into CrossEntropyLoss (which
    applies log_softmax again) — that double-log_softmax is replicated.
    """
    import jax

    mask_flat = mask.reshape(-1).astype(log_probs.dtype)
    scaled = log_probs * mask_flat[:, None]
    relogged = jax.nn.log_softmax(scaled, axis=-1)
    picked = jnp.take_along_axis(relogged, target[:, None].astype(jnp.int32), axis=1)[:, 0]
    if weight is None:
        ce = -jnp.mean(picked)  # CrossEntropyLoss reduction='mean'
        logp = ce / jnp.sum(mask_flat)
    else:
        w = weight[target]
        ce = -jnp.sum(w * picked) / jnp.sum(w)
        logp = ce / jnp.sum(w * mask_flat)
    p = jnp.exp(-logp)
    return (1.0 - p) ** gamma * logp


import jax as _jax


@_jax.custom_vjp
def _bce_elem(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-element BCE with torch's kernel semantics in BOTH directions.

    Forward: ``-(t*max(log p, -100) + (1-t)*max(log(1-p), -100))`` — exactly
    ``nn.BCELoss``'s log clamp. Backward: ``(p - t) / clamp_min(p*(1-p),
    1e-12)`` — exactly ATen's ``binary_cross_entropy_backward``. The custom
    backward is load-bearing, not a nicety: naive autodiff of the clamped
    forward yields ``0 * inf = NaN`` the moment a discriminator sigmoid
    saturates to exactly 0/1 in float32 (measured: a reference-scale stage-A
    run NaN'd at epoch 118 as visual_D pushed its loss to 0.13), while the
    reference's torch training survives the same saturation because of this
    denominator clamp.
    """
    log_p = jnp.maximum(jnp.log(pred), -100.0)
    log_1mp = jnp.maximum(jnp.log(1.0 - pred), -100.0)
    return -(target * log_p + (1.0 - target) * log_1mp)


def _bce_elem_fwd(pred, target):
    return _bce_elem(pred, target), (pred, target)


def _bce_elem_bwd(res, g):
    pred, target = res
    denom = jnp.maximum(pred * (1.0 - pred), 1e-12)  # ATen clamp_min(1e-12)
    d_pred = g * (pred - target) / denom
    # d/dt of the clamped forward (finite by construction). Targets are
    # constants at every call site, so this cotangent only flows in
    # reverse-mode grads taken w.r.t. target. Note: custom_vjp makes
    # bce_loss reverse-mode only — jvp/jacfwd through it raises.
    d_target = g * (
        jnp.maximum(jnp.log(1.0 - pred), -100.0) - jnp.maximum(jnp.log(pred), -100.0)
    )
    return d_pred, d_target


_bce_elem.defvjp(_bce_elem_fwd, _bce_elem_bwd)


def bce_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Binary cross-entropy with torch's -100 log clamp, mean reduction, and
    torch's saturation-safe backward (see :func:`_bce_elem`).

    With ``mask``, the mean runs over masked-in elements only — used to make
    fixed-bucket batches reproduce the reference's BCE over dynamically-sized
    (L, B, 1) targets (train_IEMOCAP.py:341-346).

    Reverse-mode only: the custom VJP means ``jax.jvp``/``jacfwd`` through
    this loss raise (jax.custom_vjp functions reject forward-mode AD).
    """
    elem = _bce_elem(pred, target)
    if mask is None:
        return jnp.mean(elem)
    m = jnp.broadcast_to(mask.astype(elem.dtype), elem.shape)
    return jnp.sum(elem * m) / jnp.sum(m)
