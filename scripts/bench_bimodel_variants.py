"""Prototype A/B for DialogueRNN recurrent-stack optimizations (ROADMAP item 4).

The DialogueRNN entry is the slowest hot path (~61k utt/s vs the flagship's
~160k, PERF.md) and its cost is dominated by BiModel's two sequential
112-step scans of small matmuls (29.3 ms fwd+bwd at L=112, B=30,
D_g=D_p=500) — a latency-bound regime where per-step op overheads, not MXU
FLOPs, set the floor. This script measures, on real hardware, three
semantics-preserving restructurings of the scan BEFORE any of them is
integrated (this repo's defaults are measured, not assumed):

- ``stacked``  — run the forward and reverse DialogueRNN scans as ONE scan
  over direction-stacked params/inputs: 112 sequential steps of doubled
  (batched) work instead of 224 steps. Same math per direction (weights are
  stacked, not mixed), so deterministic outputs match the module bitwise up
  to batched-matmul tiling.
- ``hoisted``  — hoist every projection of the scan-invariant input U out of
  the step body into one (L*B, D) MXU matmul: the U rows of g_cell's and
  p_cell's input projections and the attention transform xt = U @ W_t
  (reference model.py:848-852,871-874 compute these per step). Also computes
  p_cell's input projection once per dialogue row and broadcasts over the P
  identical party rows instead of projecting B*P duplicated rows. Float
  reassociation: splitting concat([U, q]) @ W into U @ W_u + q @ W_q changes
  summation order, so outputs match to tolerance, not bitwise.
- ``stacked_hoisted`` — both.

A ``proto`` variant replicates the module's math 1:1 in the same functional
harness to (a) validate the harness against the real flax module in
``--check`` mode and (b) isolate module/lifting overhead from the
restructuring wins.

Timing is interleaved (variant blocks alternate within one session) so the
hosted tunnel's drift hits all variants equally — same protocol as
scripts/ab_stage_a_attention.py. The measured object is BiModel fwd+bwd
(jax.value_and_grad of a masked-NLL loss) in TRAIN mode (dropout on, RBG-free
explicit fold_in keys) at the bench geometry: L=112, B=30, D_m=100,
D_g=D_p=500, D_e=D_h=100, context_attention="general", bf16.

Run (correctness, CPU, plugin stripped):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/bench_bimodel_variants.py --check
Run (timing, real TPU, exclusive):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_bimodel_variants.py

Decision protocol: if a variant beats the module baseline by more than the
in-session spread, it gets integrated behind a trace-time switch with
equivalence tests and the TPU default flips from data; otherwise the numbers
close ROADMAP item 4's recurrent-stack line with a documented negative.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

L_DEFAULT = 112
B_DEFAULT = 30
D_M, D_G, D_P, D_E, D_H = 100, 500, 500, 100, 100
N_CLASSES = 6
DROPOUT_REC = 0.1
DROPOUT = 0.6
NEG_INF = -1e30


# ---------------------------------------------------------------------------
# shared functional pieces (replicating models/dialogue_rnn.py and
# nn/attention.py exactly — see --check)
# ---------------------------------------------------------------------------


def _dropout(key, x, rate, train):
    import jax

    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, p=keep, shape=x.shape)
    return jax.numpy.where(mask, x / keep, 0.0).astype(x.dtype)


def _gru(p, x, h, dt):
    import jax
    import jax.numpy as jnp

    gi = jnp.dot(x, p["w_ih"].astype(dt)) + p["b_ih"].astype(dt)
    gh = jnp.dot(h.astype(dt), p["w_hh"].astype(dt)) + p["b_hh"].astype(dt)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _gru_from_gi(p, gi, h, dt):
    """GRU step where the input projection gi = x @ w_ih + b_ih is precomputed."""
    import jax
    import jax.numpy as jnp

    gh = jnp.dot(h.astype(dt), p["w_hh"].astype(dt)) + p["b_hh"].astype(dt)
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def _select_parties(q, qm_idx):
    import jax
    import jax.numpy as jnp

    onehot = jax.nn.one_hot(qm_idx, q.shape[1], dtype=q.dtype)
    return jnp.einsum("bp,bpd->bd", onehot, q)


def _head(params, emotions, umask, key, train):
    """BiModel's post-scan head: att2 (general2) + linear + dropout + smax_fc."""
    import jax
    import jax.numpy as jnp

    dt = emotions.dtype
    k = params["matchatt"]["transform"]["kernel"].astype(dt)
    b = params["matchatt"]["transform"]["bias"].astype(dt)
    xt = jnp.dot(emotions, k) + b  # (L, B, 2D_e)
    mask = umask.astype(dt)  # (B, L)
    M_masked = emotions * mask.T[:, :, None]
    scores = jnp.einsum("tbd,lbd->tbl", xt, M_masked)
    scores = jnp.tanh(scores * mask[None, :, :])
    alpha = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    alpha = alpha * mask[None, :, :]
    denom = jnp.sum(alpha, axis=-1, keepdims=True)
    alpha = (alpha / jnp.where(denom > 0, denom, 1.0)).astype(dt)
    att = jnp.einsum("tbl,lbd->tbd", alpha, emotions)
    hidden = jax.nn.relu(
        jnp.dot(att, params["linear"]["kernel"].astype(dt))
        + params["linear"]["bias"].astype(dt)
    )
    hidden = _dropout(jax.random.fold_in(key, 10), hidden, DROPOUT, train)
    logits = (
        jnp.dot(hidden, params["smax_fc"]["kernel"].astype(dt))
        + params["smax_fc"]["bias"].astype(dt)
    )
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=2)


def _cell_step(cp, g_hist, q0, e0, t, U_t, qmask_t, key, train, dt):
    """1:1 functional twin of DialogueRNNCell (context_attention='general')."""
    import jax
    import jax.numpy as jnp

    B = U_t.shape[0]
    qmask_t = qmask_t.astype(dt)
    qm_idx = jnp.argmax(qmask_t, axis=1)
    q0_sel = _select_parties(q0, qm_idx)
    g_prev = jax.lax.cond(
        t > 0,
        lambda: jnp.take(g_hist, jnp.maximum(t - 1, 0), axis=0),
        lambda: jnp.zeros((B, D_G), dtype=dt),
    )
    g_ = _gru(cp["g_cell"], jnp.concatenate([U_t, q0_sel], axis=1), g_prev, dt)
    g_ = _dropout(jax.random.fold_in(key, 0), g_, DROPOUT_REC, train)

    hist_mask = jax.lax.broadcasted_iota(jnp.int32, (B, g_hist.shape[0]), 1) < t
    xt = jnp.dot(U_t, cp["attention"]["transform"]["kernel"].astype(dt))
    scores = jnp.einsum("bd,lbd->bl", xt, g_hist)
    scores = jnp.where(hist_mask, scores.astype(jnp.float32), NEG_INF)
    alpha = jax.nn.softmax(scores, axis=-1).astype(dt)
    c_ = jnp.einsum("bl,lbd->bd", alpha, g_hist)
    c_ = jnp.where(t > 0, c_, 0.0)
    alpha = jnp.where(t > 0, alpha, 0.0)

    P = qmask_t.shape[1]
    U_c = jnp.concatenate([U_t, c_], axis=1)
    U_c_exp = jnp.broadcast_to(U_c[:, None, :], (B, P, U_c.shape[-1]))
    qs_ = _gru(
        cp["p_cell"], U_c_exp.reshape(B * P, -1), q0.reshape(B * P, D_P), dt
    ).reshape(B, P, D_P)
    qs_ = _dropout(jax.random.fold_in(key, 1), qs_, DROPOUT_REC, train)

    qmask_ = qmask_t[:, :, None]
    q_ = q0 * (1.0 - qmask_) + qs_ * qmask_

    e_ = _gru(cp["e_cell"], _select_parties(q_, qm_idx), e0, dt)
    e_ = _dropout(jax.random.fold_in(key, 2), e_, DROPOUT_REC, train)

    g_hist = jax.lax.dynamic_update_slice(g_hist, g_[None], (t, 0, 0))
    return g_hist, q_, e_, alpha


def _scan_direction(cp, U, qmask, keys, train, dt):
    import jax
    import jax.numpy as jnp

    L, B, _ = U.shape
    P = qmask.shape[-1]

    def body(carry, xs):
        g_hist, q, e, t = carry
        U_t, qmask_t, key = xs
        g_hist, q_, e_, alpha = _cell_step(
            cp, g_hist, q, e, t, U_t, qmask_t, key, train, dt
        )
        return (g_hist, q_, e_, t + 1), (e_, alpha)

    carry0 = (
        jnp.zeros((L, B, D_G), dtype=dt),
        jnp.zeros((B, P, D_P), dtype=dt),
        jnp.zeros((B, D_E), dtype=dt),
        jnp.asarray(0, dtype=jnp.int32),
    )
    _, (e, alpha) = jax.lax.scan(body, carry0, (U, qmask, keys))
    return e, alpha


# ---------------------------------------------------------------------------
# variant forward passes: params is the BiModel param tree from model.init
# ---------------------------------------------------------------------------


def fwd_proto(params, U, qmask, umask, key, train):
    """Structural twin of BiModel: two sequential scans."""
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.models.dialogue_rnn import reverse_padded

    dt = U.dtype
    L = U.shape[0]
    kf = jax.random.split(jax.random.fold_in(key, 1), L)
    kb = jax.random.split(jax.random.fold_in(key, 2), L)
    cp_f = params["dialog_rnn_f"]["dialogue_cell"]
    cp_b = params["dialog_rnn_r"]["dialogue_cell"]
    e_f, _ = _scan_direction(cp_f, U, qmask, kf, train, dt)
    e_f = _dropout(jax.random.fold_in(key, 3), e_f, DROPOUT + 0.15, train)
    rev_U = reverse_padded(U, umask)
    rev_qmask = reverse_padded(qmask, umask)
    e_b, _ = _scan_direction(cp_b, rev_U, rev_qmask, kb, train, dt)
    e_b = reverse_padded(e_b, umask)
    e_b = _dropout(jax.random.fold_in(key, 4), e_b, DROPOUT + 0.15, train)
    emotions = jnp.concatenate([e_f, e_b], axis=-1)
    return _head(params, emotions, umask, key, train)


def _stack_cells(cp_f, cp_b):
    import jax

    return jax.tree.map(lambda a, b: jax.numpy.stack([a, b]), cp_f, cp_b)


def fwd_stacked(params, U, qmask, umask, key, train):
    """Both directions in ONE scan over direction-stacked params/inputs."""
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.models.dialogue_rnn import reverse_padded

    dt = U.dtype
    L, B, _ = U.shape
    P = qmask.shape[-1]
    cp = _stack_cells(
        params["dialog_rnn_f"]["dialogue_cell"], params["dialog_rnn_r"]["dialogue_cell"]
    )
    rev_U = reverse_padded(U, umask)
    rev_qmask = reverse_padded(qmask, umask)
    Us = jnp.stack([U, rev_U], axis=1)  # (L, 2, B, D_m)
    qmasks = jnp.stack([qmask, rev_qmask], axis=1)  # (L, 2, B, P)
    keys = jax.random.split(jax.random.fold_in(key, 1), L)

    def body(carry, xs):
        g_hist, q0, e0, t = carry  # g_hist (2, L, B, D_g)
        U_t, qmask_t, k = xs  # (2, B, ...)
        qmask_t = qmask_t.astype(dt)
        qm_idx = jnp.argmax(qmask_t, axis=2)  # (2, B)
        onehot = jax.nn.one_hot(qm_idx, P, dtype=dt)
        q0_sel = jnp.einsum("xbp,xbpd->xbd", onehot, q0)
        g_prev = jax.lax.cond(
            t > 0,
            lambda: jax.lax.dynamic_slice_in_dim(
                g_hist, jnp.maximum(t - 1, 0), 1, axis=1
            )[:, 0],
            lambda: jnp.zeros((2, B, D_G), dtype=dt),
        )
        gp = cp["g_cell"]
        gi = (
            jnp.einsum("xbd,xdh->xbh", jnp.concatenate([U_t, q0_sel], -1), gp["w_ih"].astype(dt))
            + gp["b_ih"].astype(dt)[:, None]
        )
        gh = jnp.einsum("xbd,xdh->xbh", g_prev, gp["w_hh"].astype(dt)) + gp["b_hh"].astype(dt)[:, None]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        g_ = (1.0 - jax.nn.sigmoid(i_z + h_z)) * jnp.tanh(
            i_n + jax.nn.sigmoid(i_r + h_r) * h_n
        ) + jax.nn.sigmoid(i_z + h_z) * g_prev
        g_ = _dropout(jax.random.fold_in(k, 0), g_, DROPOUT_REC, train)

        hist_mask = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < t
        xt = jnp.einsum(
            "xbd,xdh->xbh", U_t, cp["attention"]["transform"]["kernel"].astype(dt)
        )
        scores = jnp.einsum("xbd,xlbd->xbl", xt, g_hist)
        scores = jnp.where(hist_mask[None], scores.astype(jnp.float32), NEG_INF)
        alpha = jax.nn.softmax(scores, axis=-1).astype(dt)
        c_ = jnp.einsum("xbl,xlbd->xbd", alpha, g_hist)
        c_ = jnp.where(t > 0, c_, 0.0)

        pp = cp["p_cell"]
        U_c = jnp.concatenate([U_t, c_], axis=-1)  # (2, B, D_m + D_g)
        pgi = (
            jnp.einsum("xbd,xdh->xbh", U_c, pp["w_ih"].astype(dt))
            + pp["b_ih"].astype(dt)[:, None]
        )  # party-invariant input rows -> project once, broadcast over P
        pgh = (
            jnp.einsum("xbpd,xdh->xbph", q0, pp["w_hh"].astype(dt))
            + pp["b_hh"].astype(dt)[:, None, None]
        )
        i_r, i_z, i_n = jnp.split(pgi[:, :, None, :], 3, axis=-1)
        h_r, h_z, h_n = jnp.split(pgh, 3, axis=-1)
        z = jax.nn.sigmoid(i_z + h_z)
        qs_ = (1.0 - z) * jnp.tanh(i_n + jax.nn.sigmoid(i_r + h_r) * h_n) + z * q0
        qs_ = _dropout(jax.random.fold_in(k, 1), qs_, DROPOUT_REC, train)

        qm_ = qmask_t[:, :, :, None]
        q_ = q0 * (1.0 - qm_) + qs_ * qm_

        ep = cp["e_cell"]
        e_in = jnp.einsum("xbp,xbpd->xbd", onehot, q_)
        egi = jnp.einsum("xbd,xdh->xbh", e_in, ep["w_ih"].astype(dt)) + ep["b_ih"].astype(dt)[:, None]
        egh = jnp.einsum("xbd,xdh->xbh", e0, ep["w_hh"].astype(dt)) + ep["b_hh"].astype(dt)[:, None]
        i_r, i_z, i_n = jnp.split(egi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(egh, 3, axis=-1)
        z = jax.nn.sigmoid(i_z + h_z)
        e_ = (1.0 - z) * jnp.tanh(i_n + jax.nn.sigmoid(i_r + h_r) * h_n) + z * e0
        e_ = _dropout(jax.random.fold_in(k, 2), e_, DROPOUT_REC, train)

        g_hist = jax.lax.dynamic_update_slice(g_hist, g_[:, None], (0, t, 0, 0))
        return (g_hist, q_, e_, t + 1), e_

    carry0 = (
        jnp.zeros((2, L, B, D_G), dtype=dt),
        jnp.zeros((2, B, P, D_P), dtype=dt),
        jnp.zeros((2, B, D_E), dtype=dt),
        jnp.asarray(0, dtype=jnp.int32),
    )
    _, e = jax.lax.scan(body, carry0, (Us, qmasks, keys))  # e (L, 2, B, D_e)
    e_f = _dropout(jax.random.fold_in(key, 3), e[:, 0], DROPOUT + 0.15, train)
    e_b = reverse_padded(e[:, 1], umask)
    e_b = _dropout(jax.random.fold_in(key, 4), e_b, DROPOUT + 0.15, train)
    emotions = jnp.concatenate([e_f, e_b], axis=-1)
    return _head(params, emotions, umask, key, train)


def _scan_direction_hoisted(cp, U, qmask, keys, train, dt):
    """Single-direction scan with all U-projections hoisted out of the body."""
    import jax
    import jax.numpy as jnp

    L, B, _ = U.shape
    P = qmask.shape[-1]
    gp, pp, ep = cp["g_cell"], cp["p_cell"], cp["e_cell"]
    # U rows of the concat([U, *]) input projections, plus the bias — one big
    # (L*B, D_m) x (D_m, 3H) MXU matmul each instead of L per-step ones.
    gU = jnp.einsum("lbd,dh->lbh", U, gp["w_ih"][:D_M].astype(dt)) + gp["b_ih"].astype(dt)
    pU = jnp.einsum("lbd,dh->lbh", U, pp["w_ih"][:D_M].astype(dt)) + pp["b_ih"].astype(dt)
    xt = jnp.einsum("lbd,dh->lbh", U, cp["attention"]["transform"]["kernel"].astype(dt))
    w_g_q = gp["w_ih"][D_M:].astype(dt)  # q0_sel rows
    w_p_c = pp["w_ih"][D_M:].astype(dt)  # c_ rows

    def body(carry, xs):
        g_hist, q0, e0, t = carry
        gU_t, pU_t, xt_t, qmask_t, key = xs
        qmask_t = qmask_t.astype(dt)
        qm_idx = jnp.argmax(qmask_t, axis=1)
        q0_sel = _select_parties(q0, qm_idx)
        g_prev = jax.lax.cond(
            t > 0,
            lambda: jnp.take(g_hist, jnp.maximum(t - 1, 0), axis=0),
            lambda: jnp.zeros((B, D_G), dtype=dt),
        )
        g_ = _gru_from_gi(gp, gU_t + jnp.dot(q0_sel, w_g_q), g_prev, dt)
        g_ = _dropout(jax.random.fold_in(key, 0), g_, DROPOUT_REC, train)

        hist_mask = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < t
        scores = jnp.einsum("bd,lbd->bl", xt_t, g_hist)
        scores = jnp.where(hist_mask, scores.astype(jnp.float32), NEG_INF)
        alpha = jax.nn.softmax(scores, axis=-1).astype(dt)
        c_ = jnp.einsum("bl,lbd->bd", alpha, g_hist)
        c_ = jnp.where(t > 0, c_, 0.0)

        # project the party-invariant input once per dialogue row, broadcast
        # over the P duplicated party rows
        pgi = (pU_t + jnp.dot(c_, w_p_c))[:, None, :]  # (B, 1, 3H)
        pgh = (
            jnp.einsum("bpd,dh->bph", q0, pp["w_hh"].astype(dt))
            + pp["b_hh"].astype(dt)
        )
        i_r, i_z, i_n = jnp.split(pgi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(pgh, 3, axis=-1)
        z = jax.nn.sigmoid(i_z + h_z)
        qs_ = (1.0 - z) * jnp.tanh(i_n + jax.nn.sigmoid(i_r + h_r) * h_n) + z * q0
        qs_ = _dropout(jax.random.fold_in(key, 1), qs_, DROPOUT_REC, train)

        qmask_ = qmask_t[:, :, None]
        q_ = q0 * (1.0 - qmask_) + qs_ * qmask_

        e_ = _gru(ep, _select_parties(q_, qm_idx), e0, dt)
        e_ = _dropout(jax.random.fold_in(key, 2), e_, DROPOUT_REC, train)

        g_hist = jax.lax.dynamic_update_slice(g_hist, g_[None], (t, 0, 0))
        return (g_hist, q_, e_, t + 1), e_

    carry0 = (
        jnp.zeros((L, B, D_G), dtype=dt),
        jnp.zeros((B, P, D_P), dtype=dt),
        jnp.zeros((B, D_E), dtype=dt),
        jnp.asarray(0, dtype=jnp.int32),
    )
    _, e = jax.lax.scan(body, carry0, (gU, pU, xt, qmask, keys))
    return e


def fwd_hoisted(params, U, qmask, umask, key, train):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.models.dialogue_rnn import reverse_padded

    dt = U.dtype
    L = U.shape[0]
    kf = jax.random.split(jax.random.fold_in(key, 1), L)
    kb = jax.random.split(jax.random.fold_in(key, 2), L)
    e_f = _scan_direction_hoisted(
        params["dialog_rnn_f"]["dialogue_cell"], U, qmask, kf, train, dt
    )
    e_f = _dropout(jax.random.fold_in(key, 3), e_f, DROPOUT + 0.15, train)
    rev_U = reverse_padded(U, umask)
    rev_qmask = reverse_padded(qmask, umask)
    e_b = _scan_direction_hoisted(
        params["dialog_rnn_r"]["dialogue_cell"], rev_U, rev_qmask, kb, train, dt
    )
    e_b = reverse_padded(e_b, umask)
    e_b = _dropout(jax.random.fold_in(key, 4), e_b, DROPOUT + 0.15, train)
    emotions = jnp.concatenate([e_f, e_b], axis=-1)
    return _head(params, emotions, umask, key, train)


def fwd_stacked_hoisted(params, U, qmask, umask, key, train):
    """One direction-stacked scan AND hoisted U-projections."""
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.models.dialogue_rnn import reverse_padded

    dt = U.dtype
    L, B, _ = U.shape
    P = qmask.shape[-1]
    cp = _stack_cells(
        params["dialog_rnn_f"]["dialogue_cell"], params["dialog_rnn_r"]["dialogue_cell"]
    )
    rev_U = reverse_padded(U, umask)
    rev_qmask = reverse_padded(qmask, umask)
    Us = jnp.stack([U, rev_U], axis=1)  # (L, 2, B, D_m)
    qmasks = jnp.stack([qmask, rev_qmask], axis=1)
    keys = jax.random.split(jax.random.fold_in(key, 1), L)
    gp, pp, ep = cp["g_cell"], cp["p_cell"], cp["e_cell"]
    gU = (
        jnp.einsum("lxbd,xdh->lxbh", Us, gp["w_ih"][:, :D_M].astype(dt))
        + gp["b_ih"].astype(dt)[:, None]
    )
    pU = (
        jnp.einsum("lxbd,xdh->lxbh", Us, pp["w_ih"][:, :D_M].astype(dt))
        + pp["b_ih"].astype(dt)[:, None]
    )
    xt = jnp.einsum(
        "lxbd,xdh->lxbh", Us, cp["attention"]["transform"]["kernel"].astype(dt)
    )
    w_g_q = gp["w_ih"][:, D_M:].astype(dt)
    w_p_c = pp["w_ih"][:, D_M:].astype(dt)

    def body(carry, xs):
        g_hist, q0, e0, t = carry  # g_hist (2, L, B, D_g)
        gU_t, pU_t, xt_t, qmask_t, k = xs
        qmask_t = qmask_t.astype(dt)
        qm_idx = jnp.argmax(qmask_t, axis=2)
        onehot = jax.nn.one_hot(qm_idx, P, dtype=dt)
        q0_sel = jnp.einsum("xbp,xbpd->xbd", onehot, q0)
        g_prev = jax.lax.cond(
            t > 0,
            lambda: jax.lax.dynamic_slice_in_dim(
                g_hist, jnp.maximum(t - 1, 0), 1, axis=1
            )[:, 0],
            lambda: jnp.zeros((2, B, D_G), dtype=dt),
        )
        gi = gU_t + jnp.einsum("xbd,xdh->xbh", q0_sel, w_g_q)
        gh = jnp.einsum("xbd,xdh->xbh", g_prev, gp["w_hh"].astype(dt)) + gp["b_hh"].astype(dt)[:, None]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        z = jax.nn.sigmoid(i_z + h_z)
        g_ = (1.0 - z) * jnp.tanh(i_n + jax.nn.sigmoid(i_r + h_r) * h_n) + z * g_prev
        g_ = _dropout(jax.random.fold_in(k, 0), g_, DROPOUT_REC, train)

        hist_mask = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) < t
        scores = jnp.einsum("xbd,xlbd->xbl", xt_t, g_hist)
        scores = jnp.where(hist_mask[None], scores.astype(jnp.float32), NEG_INF)
        alpha = jax.nn.softmax(scores, axis=-1).astype(dt)
        c_ = jnp.einsum("xbl,xlbd->xbd", alpha, g_hist)
        c_ = jnp.where(t > 0, c_, 0.0)

        pgi = (pU_t + jnp.einsum("xbd,xdh->xbh", c_, w_p_c))[:, :, None, :]
        pgh = (
            jnp.einsum("xbpd,xdh->xbph", q0, pp["w_hh"].astype(dt))
            + pp["b_hh"].astype(dt)[:, None, None]
        )
        i_r, i_z, i_n = jnp.split(pgi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(pgh, 3, axis=-1)
        z = jax.nn.sigmoid(i_z + h_z)
        qs_ = (1.0 - z) * jnp.tanh(i_n + jax.nn.sigmoid(i_r + h_r) * h_n) + z * q0
        qs_ = _dropout(jax.random.fold_in(k, 1), qs_, DROPOUT_REC, train)

        qm_ = qmask_t[:, :, :, None]
        q_ = q0 * (1.0 - qm_) + qs_ * qm_

        e_in = jnp.einsum("xbp,xbpd->xbd", onehot, q_)
        egi = jnp.einsum("xbd,xdh->xbh", e_in, ep["w_ih"].astype(dt)) + ep["b_ih"].astype(dt)[:, None]
        egh = jnp.einsum("xbd,xdh->xbh", e0, ep["w_hh"].astype(dt)) + ep["b_hh"].astype(dt)[:, None]
        i_r, i_z, i_n = jnp.split(egi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(egh, 3, axis=-1)
        z = jax.nn.sigmoid(i_z + h_z)
        e_ = (1.0 - z) * jnp.tanh(i_n + jax.nn.sigmoid(i_r + h_r) * h_n) + z * e0
        e_ = _dropout(jax.random.fold_in(k, 2), e_, DROPOUT_REC, train)

        g_hist = jax.lax.dynamic_update_slice(g_hist, g_[:, None], (0, t, 0, 0))
        return (g_hist, q_, e_, t + 1), e_

    carry0 = (
        jnp.zeros((2, L, B, D_G), dtype=dt),
        jnp.zeros((2, B, P, D_P), dtype=dt),
        jnp.zeros((2, B, D_E), dtype=dt),
        jnp.asarray(0, dtype=jnp.int32),
    )
    _, e = jax.lax.scan(body, carry0, (gU, pU, xt, qmasks, keys))
    e_f = _dropout(jax.random.fold_in(key, 3), e[:, 0], DROPOUT + 0.15, train)
    e_b = reverse_padded(e[:, 1], umask)
    e_b = _dropout(jax.random.fold_in(key, 4), e_b, DROPOUT + 0.15, train)
    emotions = jnp.concatenate([e_f, e_b], axis=-1)
    return _head(params, emotions, umask, key, train)


VARIANTS = {
    "proto": fwd_proto,
    "stacked": fwd_stacked,
    "hoisted": fwd_hoisted,
    "stacked_hoisted": fwd_stacked_hoisted,
}


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def make_inputs(L, B, dtype):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((L, B, D_M)), dtype=dtype)
    lengths = rng.integers(20, min(110, L) + 1, size=B)
    umask_np = np.zeros((B, L), np.float32)
    qmask_np = np.zeros((L, B, 2), np.float32)
    for b, n in enumerate(lengths):
        umask_np[b, :n] = 1.0
        parties = rng.integers(0, 2, size=n)
        qmask_np[np.arange(n), b, parties] = 1.0
    labels = jnp.asarray(rng.integers(0, N_CLASSES, size=(L, B)))
    return (
        U,
        jnp.asarray(qmask_np, dtype=dtype),
        jnp.asarray(umask_np, dtype=jnp.float32),
        labels,
    )


def build_module(dtype, deterministic):
    from gan_ffn_tpu.models.dialogue_rnn import BiModel

    return BiModel(
        D_m=D_M, D_g=D_G, D_p=D_P, D_e=D_E, D_h=D_H, n_classes=N_CLASSES,
        context_attention="general", D_a=100, dropout_rec=DROPOUT_REC,
        dropout=DROPOUT, att2=True, deterministic=deterministic, dtype=dtype,
    )


def masked_nll(log_prob, labels, umask):
    import jax.numpy as jnp

    lp = jnp.take_along_axis(log_prob, labels[:, :, None], axis=2)[:, :, 0]
    m = umask.T.astype(lp.dtype)
    return -jnp.sum(lp * m) / jnp.sum(m)


def run_check(args):
    """Deterministic-mode output parity of every variant vs the flax module."""
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32
    U, qmask, umask, labels = make_inputs(args.bucket_len, args.batch_size, dtype)
    module = build_module(dtype, deterministic=True)
    params = module.init(jax.random.PRNGKey(0), U, qmask, umask)["params"]
    ref_lp = module.apply({"params": params}, U, qmask, umask)[0]
    key = jax.random.PRNGKey(7)
    tol = {"proto": 1e-5, "stacked": 1e-5, "hoisted": 5e-4, "stacked_hoisted": 5e-4}
    ok = True
    for name, fn in VARIANTS.items():
        lp = fn(params, U, qmask, umask, key, train=False)
        err = float(jnp.max(jnp.abs(lp - ref_lp)))
        status = "OK " if err <= tol[name] else "FAIL"
        if err > tol[name]:
            ok = False
        print(f"[check] {name:16s} max|log_prob - module| = {err:.3e}  {status}")
    # gradient sanity on the proto twin: same loss, same grads (f32)
    def loss_mod(p):
        return masked_nll(module.apply({"params": p}, U, qmask, umask)[0], labels, umask)

    def loss_proto(p):
        return masked_nll(fwd_proto(p, U, qmask, umask, key, False), labels, umask)

    lm, gm = jax.value_and_grad(loss_mod)(params)
    lp_, gp_ = jax.value_and_grad(loss_proto)(params)
    gerr = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(gm), jax.tree.leaves(gp_))
    )
    print(f"[check] proto loss {float(lp_):.6f} vs module {float(lm):.6f}; "
          f"max grad delta {gerr:.3e}")
    if abs(float(lp_) - float(lm)) > 1e-5 or gerr > 1e-4:
        ok = False
    print("[check]", "ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


def run_bench(args):
    import jax
    import jax.numpy as jnp

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    U, qmask, umask, labels = make_inputs(args.bucket_len, args.batch_size, dtype)
    module_t = build_module(dtype, deterministic=False)
    module_e = build_module(dtype, deterministic=True)
    params = module_e.init(jax.random.PRNGKey(0), U, qmask, umask)["params"]

    steppers = {}

    def module_loss(p, key):
        lp = module_t.apply(
            {"params": p}, U, qmask, umask, rngs={"dropout": key}
        )[0]
        return masked_nll(lp, labels, umask)

    g_module = jax.jit(jax.value_and_grad(module_loss))
    steppers["module"] = lambda key: g_module(params, key)

    for name in args.variants:
        fn = VARIANTS[name]

        def vloss(p, key, _fn=fn):
            return masked_nll(_fn(p, U, qmask, umask, key, True), labels, umask)

        gv = jax.jit(jax.value_and_grad(vloss))
        steppers[name] = (lambda key, _g=gv: _g(params, key))

    names = ["module"] + list(args.variants)
    key = jax.random.PRNGKey(1)
    results = {n: [] for n in names}
    # warmup/compile
    for n in names:
        t0 = time.perf_counter()
        out = steppers[n](key)
        jax.block_until_ready(out[0])
        print(f"[compile] {n:16s} {time.perf_counter() - t0:7.1f} s", flush=True)
    # interleaved timed blocks
    for block in range(args.blocks):
        for n in names:
            k = key
            t0 = time.perf_counter()
            for i in range(args.steps):
                k = jax.random.fold_in(k, i)
                out = steppers[n](k)
            jax.block_until_ready(out[0])
            ms = (time.perf_counter() - t0) * 1e3 / args.steps
            results[n].append(ms)
            print(f"[block {block}] {n:16s} {ms:7.2f} ms/step", flush=True)
    summary = {}
    base = statistics.median(results["module"])
    for n in names:
        med = statistics.median(results[n])
        summary[n] = {
            "median_ms": round(med, 3),
            "min_ms": round(min(results[n]), 3),
            "blocks": [round(x, 3) for x in results[n]],
            "speedup_vs_module": round(base / med, 4),
        }
    print(json.dumps({
        "bench": "bimodel_fwd_bwd_variants",
        "L": args.bucket_len, "B": args.batch_size,
        "dtype": "float32" if args.fp32 else "bfloat16",
        "blocks": args.blocks, "steps_per_block": args.steps,
        "results": summary,
    }))
    return 0


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--check", action="store_true", help="CPU f32 parity check only")
    p.add_argument("--bucket-len", type=int, default=L_DEFAULT)
    p.add_argument("--batch-size", type=int, default=B_DEFAULT)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument(
        "--variants", nargs="+", default=list(VARIANTS),
        choices=list(VARIANTS),
    )
    args = p.parse_args()
    if args.check:
        sys.exit(run_check(args))
    sys.exit(run_bench(args))


if __name__ == "__main__":
    main()
