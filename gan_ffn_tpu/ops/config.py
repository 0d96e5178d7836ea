"""Trace-time switches for Pallas kernels.

Every kernel has an XLA fallback; the switch is read when a module is traced,
so it composes with jit (different settings produce different compiled
programs). Default comes from the ``GANFFN_PALLAS`` env var ("1" enables) and
can be overridden lexically::

    with use_pallas_attention(True):
        loss = train_step(...)
"""

from __future__ import annotations

import os
from contextlib import contextmanager

def _default_enabled() -> bool:
    env = os.environ.get("GANFFN_PALLAS")
    if env is not None:
        return env == "1"
    return None  # decide from backend on first query


_STATE = {"attention": _default_enabled()}


def pallas_attention_enabled() -> bool:
    if _STATE["attention"] is None:
        import jax

        _STATE["attention"] = jax.default_backend() == "tpu"
    return _STATE["attention"]


@contextmanager
def use_pallas_attention(enabled: bool = True):
    prev = _STATE["attention"]
    _STATE["attention"] = enabled
    try:
        yield
    finally:
        _STATE["attention"] = prev
