"""Interleaved unroll A/B for BiModel's stacked bidirectional scan.

The stacked scan (models/dialogue_rnn.py::_stacked_bidir_scan, default ON,
PERF.md) runs 112 sequential direction-batched steps; ``lax.scan``'s
``unroll`` trades while-loop trip overhead for a bigger program. This script
measures the real module path (BiModel fwd+bwd, train mode, bf16, bench
geometry L=112 B=30, context_attention="general") at unroll factors given on
the command line, interleaved within one session so tunnel drift hits all
arms equally — the same protocol as scripts/ab_stage_a_attention.py.

The arms differ ONLY in the trace-time ``GANFFN_STACK_UNROLL`` value
(ops/config.py::use_stack_unroll), i.e. exactly what a deployment would set.

Run (real TPU, exclusive):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_stack_unroll.py

Result (hosted v5e, 2026-08-18, 4 blocks x 10 steps, BiModel fwd+bwd):
unroll=1 median 19.35 ms/step, unroll=2 23.39 (0.827x), unroll=4 22.40
(0.864x) — unrolling LOSES 14-17%: the scan is bound by its sequential data
dependency, the per-step work is already direction-batched, and the bigger
body only costs scheduling (compile 9.3 / 9.8 / 12.7 s). Default stays
``GANFFN_STACK_UNROLL=1``.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench_bimodel_variants import (  # noqa: E402
    B_DEFAULT,
    L_DEFAULT,
    build_module,
    make_inputs,
    masked_nll,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--unrolls", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--bucket-len", type=int, default=L_DEFAULT)
    p.add_argument("--batch-size", type=int, default=B_DEFAULT)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.ops.config import use_stack_unroll

    dtype = jnp.bfloat16
    U, qmask, umask, labels = make_inputs(args.bucket_len, args.batch_size, dtype)
    module_t = build_module(dtype, deterministic=False)
    module_e = build_module(dtype, deterministic=True)
    params = module_e.init(jax.random.PRNGKey(0), U, qmask, umask)["params"]

    def loss(p_, key):
        lp = module_t.apply({"params": p_}, U, qmask, umask, rngs={"dropout": key})[0]
        return masked_nll(lp, labels, umask)

    steppers = {}
    key = jax.random.PRNGKey(1)
    for n in args.unrolls:
        with use_stack_unroll(n):
            g = jax.jit(jax.value_and_grad(loss))
            t0 = time.perf_counter()
            out = g(params, key)  # traced under the lexical unroll setting
            jax.block_until_ready(out[0])
        print(f"[compile] unroll={n:<3d} {time.perf_counter() - t0:7.1f} s", flush=True)
        steppers[n] = (lambda k, _g=g: _g(params, k))

    results = {n: [] for n in args.unrolls}
    for block in range(args.blocks):
        for n in args.unrolls:
            k = key
            t0 = time.perf_counter()
            for i in range(args.steps):
                k = jax.random.fold_in(k, i)
                out = steppers[n](k)
            jax.block_until_ready(out[0])
            ms = (time.perf_counter() - t0) * 1e3 / args.steps
            results[n].append(ms)
            print(f"[block {block}] unroll={n:<3d} {ms:7.2f} ms/step", flush=True)

    base = statistics.median(results[args.unrolls[0]])
    summary = {
        "bench": "stacked_bidir_unroll_ab",
        "L": args.bucket_len,
        "B": args.batch_size,
        "dtype": "bfloat16",
        "blocks": args.blocks,
        "steps_per_block": args.steps,
        "arms": {
            str(n): {
                "median_ms": round(statistics.median(results[n]), 3),
                "blocks": [round(x, 3) for x in results[n]],
                "speedup_vs_first": round(base / statistics.median(results[n]), 4),
            }
            for n in args.unrolls
        },
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
