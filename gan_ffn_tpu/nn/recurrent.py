"""Recurrent cells and stacked LSTM with torch-compatible gate semantics.

- ``GRUCell``: torch gate order (r, z, n), h' = (1-z)*n + z*h
  (used by the DialogueRNN stack, reference model.py:848-852).
- ``LSTMCell`` / ``LSTM``: torch gate order (i, f, g, o), multi-layer,
  bidirectional, inter-layer dropout — replacing ``nn.LSTM`` as used by the
  reference baselines (model.py:393-562) and GAN_FFN's (unused) lstm head.

TPU-first details: the input projection for every timestep is hoisted out of
the scan into ONE large (L*B, D)x(D, 4H) matmul that XLA tiles onto the MXU;
``lax.scan`` carries only the recurrent half. The reference applies its LSTMs
to padded sequences without masking (padding flows through); that behavior is
preserved.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .core import uniform_bound_init


def _rnn_init(hidden: int):
    return uniform_bound_init(float(1.0 / (hidden**0.5)))


class GRUCell(nn.Module):
    """One GRU step. x (B, D_in), h (B, H) -> h' (B, H)."""

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h):
        H = self.hidden_size
        init = _rnn_init(H)
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H))
        w_hh = self.param("w_hh", init, (H, 3 * H))
        b_ih = self.param("b_ih", init, (3 * H,))
        b_hh = self.param("b_hh", init, (3 * H,))
        # compute in the input dtype (params stay float32 storage)
        dt = x.dtype
        gi = jnp.dot(x, w_ih.astype(dt)) + b_ih.astype(dt)
        gh = jnp.dot(h.astype(dt), w_hh.astype(dt)) + b_hh.astype(dt)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


def gru_step(params, x, h):
    """Functional GRU step over extracted params (for use inside lax.scan
    bodies where module application is awkward)."""
    gi = jnp.dot(x, params["w_ih"]) + params["b_ih"]
    gh = jnp.dot(h, params["w_hh"]) + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class GRU(nn.Module):
    """Single-layer GRU over (L, B, D) input, torch ``nn.GRU`` semantics.

    Returns (outputs (L, B, H), h_n (1, B, H)). Input projections are hoisted
    into one batched matmul as in :class:`LSTM`.
    """

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h0=None):
        L, B, d_in = x.shape
        H = self.hidden_size
        init = _rnn_init(H)
        w_ih = self.param("w_ih_l0", init, (d_in, 3 * H))
        w_hh = self.param("w_hh_l0", init, (H, 3 * H))
        b_ih = self.param("b_ih_l0", init, (3 * H,))
        b_hh = self.param("b_hh_l0", init, (3 * H,))
        dt = x.dtype
        gi = jnp.einsum("lbd,dh->lbh", x, w_ih.astype(dt)) + b_ih.astype(dt)

        def step(h, gi_t):
            gh = jnp.dot(h, w_hh.astype(dt)) + b_hh.astype(dt)
            i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h2 = (1.0 - z) * n + z * h
            return h2, h2

        h = jnp.zeros((B, H), dtype=x.dtype) if h0 is None else h0.reshape(B, H)
        h_n, outs = jax.lax.scan(step, h, gi)
        return outs, h_n[None]


class LSTMCell(nn.Module):
    """One LSTM step. x (B, D_in), (h, c) -> (h', c')."""

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, state: Tuple[jnp.ndarray, jnp.ndarray]):
        h, c = state
        H = self.hidden_size
        init = _rnn_init(H)
        w_ih = self.param("w_ih", init, (x.shape[-1], 4 * H))
        w_hh = self.param("w_hh", init, (H, 4 * H))
        b_ih = self.param("b_ih", init, (4 * H,))
        b_hh = self.param("b_hh", init, (4 * H,))
        dt = x.dtype
        gates = (
            jnp.dot(x, w_ih.astype(dt)) + b_ih.astype(dt)
            + jnp.dot(h.astype(dt), w_hh.astype(dt)) + b_hh.astype(dt)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c2 = f * c + i * g
        h2 = o * jnp.tanh(c2)
        return h2, c2


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM over (L, B, D) input.

    Matches ``torch.nn.LSTM(input_size, hidden_size, num_layers,
    bidirectional, dropout)``: inter-layer dropout on every layer's output
    except the last, zero initial states. Returns (outputs (L, B, dirs*H),
    (h_n, c_n)) with h_n/c_n shaped (num_layers*dirs, B, H) in torch's layer
    ordering.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        L, B, _ = x.shape
        H = self.hidden_size
        init = _rnn_init(H)
        dirs = 2 if self.bidirectional else 1

        def run_direction(inputs, layer: int, suffix: str):
            d_in = inputs.shape[-1]
            w_ih = self.param(f"w_ih_l{layer}{suffix}", init, (d_in, 4 * H))
            w_hh = self.param(f"w_hh_l{layer}{suffix}", init, (H, 4 * H))
            b_ih = self.param(f"b_ih_l{layer}{suffix}", init, (4 * H,))
            b_hh = self.param(f"b_hh_l{layer}{suffix}", init, (4 * H,))
            dt = inputs.dtype
            # Hoist the input projection out of the scan: one big MXU matmul.
            gi = jnp.einsum("lbd,dh->lbh", inputs, w_ih.astype(dt)) + b_ih.astype(dt)

            def step(carry, gi_t):
                h, c = carry
                gates = gi_t + jnp.dot(h, w_hh.astype(dt)) + b_hh.astype(dt)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
                g = jnp.tanh(g)
                c2 = f * c + i * g
                h2 = o * jnp.tanh(c2)
                return (h2, c2), h2

            zeros = jnp.zeros((B, H), dtype=inputs.dtype)
            (h_n, c_n), outs = jax.lax.scan(step, (zeros, zeros), gi)
            return outs, h_n, c_n

        h_states, c_states = [], []
        layer_in = x
        for layer in range(self.num_layers):
            fwd, h_f, c_f = run_direction(layer_in, layer, "")
            if self.bidirectional:
                rev_in = jnp.flip(layer_in, axis=0)
                bwd_r, h_b, c_b = run_direction(rev_in, layer, "_reverse")
                bwd = jnp.flip(bwd_r, axis=0)
                out = jnp.concatenate([fwd, bwd], axis=-1)
                h_states += [h_f, h_b]
                c_states += [c_f, c_b]
            else:
                out = fwd
                h_states.append(h_f)
                c_states.append(c_f)
            if layer < self.num_layers - 1 and self.dropout > 0.0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
            layer_in = out

        h_n = jnp.stack(h_states, axis=0)
        c_n = jnp.stack(c_states, axis=0)
        return layer_in, (h_n, c_n)
