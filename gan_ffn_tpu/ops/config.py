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
- ``GANFFN_SCAN_LAYERS`` sets the encoder scan-over-layers default; unset,
  it is OFF. When ON, ``nn.TransformerEncoder`` runs its depth as ONE
  ``nn.scan`` over stacked layer params instead of ``num_layers`` unrolled
  blocks — same math, ~num_layers× smaller HLO, built to attack the hosted
  remote-compile cost of the 12-duel stage-A program (~7-20 min unrolled,
  PERF.md "scan-over-layers"). UNLIKE the kernel switches this one changes
  the PARAM TREE (per-layer subtrees ``layers_i`` become one ``layers``
  subtree with a stacked leading axis): init and apply must run under the
  same setting, and checkpoints convert via
  ``nn.transformer.stack_layer_params`` / ``unstack_layer_params``. Dropout
  key derivation also differs (scan splits the rng per step; unrolled folds
  per module path), so stochastic trajectories differ while deterministic
  math is identical (equivalence-tested in tests/test_scan_layers.py).
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
    "scan_layers": _default_enabled("GANFFN_SCAN_LAYERS"),
}


def _enabled(key: str) -> bool:
    if _STATE[key] is None:
        if key == "mlp":
            _STATE[key] = False  # measured: no win at the reference geometries
        elif key == "stack_bidir":
            _STATE[key] = True  # measured 1.39x on TPU; math-identical per direction
        elif key == "scan_layers":
            # structure-changing: never flips on implicitly (see module doc)
            _STATE[key] = False
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


def scan_layers_enabled() -> bool:
    return _enabled("scan_layers")


def use_scan_layers(enabled: bool = True):
    return _use("scan_layers", enabled)


def set_scan_layers(enabled: bool) -> None:
    """Process-global scan-over-layers default (what the CLI ``--scan-layers``
    flag sets, so stage A and stage B trace the same param layout);
    ``use_scan_layers`` still overrides lexically."""
    _STATE["scan_layers"] = enabled


def resolve_scan_layers(flag: bool) -> bool:
    """Reconcile a CLI ``--scan-layers`` flag with the ``GANFFN_SCAN_LAYERS``
    env default and pin the process-global to the result.

    The trainer CLIs thread the returned value into ``GANConfig.scan_layers``
    (stage A) while stage B's classifier construction reads the global — if
    the two ever disagreed, the GAN checkpoint and the classifier would
    trace different param layouts and the generator graft would fail with a
    flax scope error after the multi-minute GAN stage. This single resolution
    point makes that disagreement impossible.
    """
    enabled = bool(flag) or scan_layers_enabled()
    set_scan_layers(enabled)
    return enabled


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
