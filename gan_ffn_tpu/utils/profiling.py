"""Profiling hooks (SURVEY.md §5: the reference's only tracing is a
per-epoch wall-clock print, train_IEMOCAP.py:673,717).

``trace(logdir)`` wraps a code region in a ``jax.profiler`` trace viewable in
TensorBoard/XProf (device timelines, HLO ops, memory). The per-step
utterances/sec meter lives in the epoch loops (cli/common.py train_gan and
the CLI epoch prints).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(logdir: str | None):
    """Profile the enclosed region into ``logdir`` (no-op when logdir is None)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
