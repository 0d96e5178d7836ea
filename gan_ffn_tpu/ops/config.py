"""Trace-time switches for Pallas kernels.

Every kernel has an XLA fallback; the switch is read when a module is traced,
so it composes with jit (different settings produce different compiled
programs). Defaults come from env vars, overridable lexically::

    with use_pallas_attention(True):
        loss = train_step(...)

- ``GANFFN_PALLAS`` ("1"/"0") sets the fused-ATTENTION default; unset, it
  enables on TPU backends (measured +12% on the flagship step, PERF.md).
- ``GANFFN_PALLAS_MLP`` sets the fused-MLP default; unset, it is OFF
  everywhere: the measured flagship delta is -1% (XLA already fuses the
  elementwise chains into these small matmuls well — PERF.md "Fused MLP
  kernel"). The kernel stays available for larger-d_model deployments.
- ``GANFFN_STACK_BIDIR`` sets the BiModel fused-bidirectional-scan default
  (not a Pallas kernel, but the same trace-time-switch contract); unset, it
  is ON everywhere: both DialogueRNN directions run in ONE lax.scan of
  direction-batched einsums, measured 1.39x fwd+bwd on v5e at the entry
  geometry (models/dialogue_rnn.py::_stacked_bidir_scan, PERF.md).
- ``GANFFN_STACK_UNROLL`` (int, default 1) sets that scan's ``unroll``
  factor (measured on v5e by scripts/ab_stack_unroll.py before the default
  was chosen — see the script docstring for the numbers).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

def _default_enabled(var: str = "GANFFN_PALLAS"):
    env = os.environ.get(var)
    if env is not None:
        return env == "1"
    return None  # decide from backend / measurement on first query


def _default_unroll() -> int:
    try:
        return max(1, int(os.environ.get("GANFFN_STACK_UNROLL", "1")))
    except ValueError:  # malformed override must not break `import gan_ffn_tpu`
        return 1


_STATE = {
    "attention": _default_enabled("GANFFN_PALLAS"),
    "mlp": _default_enabled("GANFFN_PALLAS_MLP"),
    "stack_bidir": _default_enabled("GANFFN_STACK_BIDIR"),
    "stack_unroll": _default_unroll(),
}


def _enabled(key: str) -> bool:
    if _STATE[key] is None:
        if key == "mlp":
            _STATE[key] = False  # measured: no win at the reference geometries
        elif key == "stack_bidir":
            _STATE[key] = True  # measured 1.39x on TPU; math-identical per direction
        else:
            import jax

            _STATE[key] = jax.default_backend() == "tpu"
    return _STATE[key]


def pallas_attention_enabled() -> bool:
    return _enabled("attention")


def pallas_mlp_enabled() -> bool:
    return _enabled("mlp")


def stacked_bidir_enabled() -> bool:
    return _enabled("stack_bidir")


def stack_bidir_unroll() -> int:
    return _STATE["stack_unroll"]


def use_stack_unroll(n: int):
    return _use("stack_unroll", n)


@contextmanager
def _use(key: str, enabled: bool):
    prev = _STATE[key]
    _STATE[key] = enabled
    try:
        yield
    finally:
        _STATE[key] = prev


def use_pallas_attention(enabled: bool = True):
    return _use("attention", enabled)


def use_pallas_mlp(enabled: bool = True):
    return _use("mlp", enabled)


def use_stacked_bidir(enabled: bool = True):
    return _use("stack_bidir", enabled)
