"""Shared interleaved-A/B measurement protocol for the perf-decision scripts.

One timing driver + one JSON summarizer, used by ab_dialoguernn_stacked.py,
ab_layernorm_epilogue.py and ab_matchatt_ablation.py — the scripts whose
committed numbers (PERF.md, ROADMAP.md item 4) cite "the same protocol": N
alternating timed blocks per path inside ONE process, so the hosted tunnel's
cross-process variance (PERF.md, ~±25%) hits every path equally and only the
within-session ratio is read. Keeping the loop here means a protocol fix
(timing, block structure, JSON schema) lands in every harness at once instead
of silently diverging the measurements the committed decisions rest on.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Dict, Tuple

# paths: insertion-ordered {name: (step_once, n_utt)} — step_once() runs one
# already-compiled train step and returns a device value to block on.
Paths = Dict[str, Tuple[Callable[[], object], float]]


def run_interleaved(paths: Paths, blocks: int, steps: int) -> Dict[str, list]:
    """Time ``steps`` calls per path per block, alternating paths within every
    block; returns {name: [ms_per_step per block]} and prints each block line.
    """
    import jax

    results = {n: [] for n in paths}
    for block in range(blocks):
        for name, (step_once, n_utt) in paths.items():
            t0 = time.perf_counter()
            for _ in range(steps):
                loss = step_once()
            jax.block_until_ready(loss)
            ms = (time.perf_counter() - t0) * 1e3 / steps
            results[name].append(ms)
            print(f"[block {block}] {name:9s} {ms:7.2f} ms/step "
                  f"({n_utt / (ms / 1e3):,.0f} utt/s)", flush=True)
    return results


def ab_summary(
    bench: str,
    L: int,
    B: int,
    fp32: bool,
    blocks: int,
    steps: int,
    results: Dict[str, list],
    paths: Paths,
    ratio_key: str,
    numerator: str,
    denominator: str,
) -> dict:
    """Per-path medians + block lists + the headline ratio, in the JSON shape
    every A/B script in this repo emits (per-path medians are computed over
    the block list; ``ratio_key`` = median(numerator) / median(denominator)).
    """
    out = {
        "bench": bench, "L": L, "B": B,
        "dtype": "float32" if fp32 else "bfloat16",
        "blocks": blocks, "steps_per_block": steps,
    }
    medians = {}
    for name, blocks_ms in results.items():
        m = statistics.median(blocks_ms)
        medians[name] = m
        n_utt = paths[name][1]
        out[name] = {
            "median_ms": round(m, 3),
            "blocks": [round(x, 3) for x in blocks_ms],
            "utt_per_s": round(n_utt / (m / 1e3)),
        }
    out[ratio_key] = round(medians[numerator] / medians[denominator], 4)
    return out
