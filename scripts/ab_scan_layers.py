"""Unrolled-vs-scanned encoder A/B for the fused 12-duel stage-A program:
compile cost AND steady-state step time, at HEAD, in ONE session.

Motivation: the hosted remote-compile path charges ~7-20 min to build the
unrolled 8-layer 12-duel program (PERF.md "Adversarial stage A"; the AOT
disk cache in utils/aot.py only helps processes AFTER the first). The
``GANConfig.scan_layers`` rendition runs each encoder's depth as one
``nn.scan`` over stacked layer params, shrinking the traced program
~num_layers× — this harness measures what that buys on the real program:

- per-path LOWER and COMPILE wall time (the quantity the scan path exists
  to attack) plus the lowered StableHLO text size,
- steady-state ms/step in INTERLEAVED timed blocks (unrolled, scanned,
  unrolled, ...), the round-4 protocol that cancels tunnel drift.

Both programs are real `make_gan_train_step` products at the bench stage-A
geometry (8-layer encoders, bf16, B=32, bucket 112, realistic 20-110
lengths), `aot_cache=False` so the disk cache cannot hide the compile. The
scanned path's params come from `stack_layer_params` over the SAME init as
the unrolled path, so any loss printed by either program is the same
trajectory modulo dropout-key derivation (tests/test_scan_layers.py pins
dropout-0 equivalence).

Run (real TPU, exclusive — no other jax process while this is active):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_scan_layers.py \
        --out docs/ab_runs/round4/ab_scan_layers.json

Decision protocol (committed either way): scan_layers stays opt-in (it
changes the checkpoint layout and dropout streams); what this harness
decides is the RECOMMENDATION — if compile drops by >=3x at <=5% step-time
regression, PERF.md/README advertise it for iterative stage-A work
(sweeps at fresh geometries, the first process on a new machine); if the
step-time cost exceeds that, it is documented as a compile-time/throughput
trade the user picks explicitly.

OUTCOME (2026-08-19, hosted v5e, both runs committed in
docs/ab_runs/round4/ab_scan_layers{,_aot}.json): lower+compile
99.3+978.4 s unrolled vs 28.4+178.8 s scanned — **5.5x faster compile**
(HLO text 16.1 -> 8.5 MB); steady-state 218.2 vs 258.3 ms per 12-duel
step — **scanned is 18% slower** (ratio 1.184, identical under direct
and --aot dispatch). That exceeds the 5% auto-advertise bar, so the
committed recommendation is the TRADE: at the reference's stage-A scale
(150 epochs x 4 batches = 600 steps) a FIRST process finishes ~3.3x
sooner scanned (~362 s vs ~1208 s); warm-cache processes train 18%
faster unrolled. PERF.md "scan-over-layers" documents both.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from bench import realistic_batch  # noqa: E402


def build(scan: bool, L: int, B: int, fp32: bool, base_params=None, aot: bool = False):
    """Lower + compile one path; returns (step_once, utts, timings, params).

    ``aot=True`` builds the production dispatch path instead
    (ShapeDispatchingAOT, the wrapper bench.py and the CLIs use): no
    explicit lower/compile timing, but steady-state ms/step reflects what
    the CLIs pay. Measured 2026-08-19: both dispatch modes agree within
    noise (unrolled 218.8 vs 218.2 ms, scanned 258.5 vs 258.3), so either
    mode's ratio is trustworthy; the --aot run doubles as the confirmation
    that dispatch overhead is NOT a confound."""
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.nn.transformer import stack_layer_params
    from gan_ffn_tpu.train.gan import GANConfig, init_gan_state, make_gan_train_step

    cfg = GANConfig(
        num_layers=8,
        dtype=None if fp32 else jnp.bfloat16,
        aot_cache=aot,  # False: measure the compile; True: production dispatch
        scan_layers=scan,
    )
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B)
    gan_batch = {k: batch[k] for k in ("text", "visual", "audio", "valid_len", "n_real")}

    if base_params is None:
        base_params = init_gan_state(
            GANConfig(num_layers=8, aot_cache=False), jax.random.PRNGKey(0)
        )["params"]
    params = stack_layer_params(base_params) if scan else base_params
    # private copy: the step donates its state, and stack_layer_params
    # passes non-layer leaves through by reference
    params = jax.tree.map(lambda x: jnp.array(np.asarray(x)), params)
    from gan_ffn_tpu.train.gan import create_gan_optimizers

    opts = create_gan_optimizers(cfg)
    state = {"params": params, "opt": {n: opts[n].init(params[n]) for n in params}}

    step = make_gan_train_step(cfg)
    timings = {}
    if aot:
        timings["mode"] = "aot-dispatch"
        compiled = step  # ShapeDispatchingAOT: builds/loads on first call
    else:
        # jax.jit(run_schedule, donate_argnums=(0,)): explicit lower/compile
        t0 = time.perf_counter()
        lowered = step.lower(state, gan_batch, jax.random.PRNGKey(1))
        timings["lower_s"] = round(time.perf_counter() - t0, 1)
        hlo_mb = len(lowered.as_text()) / 1e6
        timings["stablehlo_text_mb"] = round(hlo_mb, 1)
        t0 = time.perf_counter()
        compiled = lowered.compile()
        timings["compile_s"] = round(time.perf_counter() - t0, 1)

    holder = {"state": state, "key": jax.random.PRNGKey(2)}

    def step_once():
        holder["key"], sub = jax.random.split(holder["key"])
        holder["state"], losses = compiled(holder["state"], gan_batch, sub)
        return losses

    return step_once, float(umask.sum()), timings, base_params


def timed_block(step_once, steps: int) -> float:
    import jax

    t0 = time.perf_counter()
    out = None
    for _ in range(steps):
        out = step_once()
    jax.block_until_ready(out["duel_11"])
    return time.perf_counter() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bucket-len", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--fp32", action="store_true", default=False)
    p.add_argument("--steps", type=int, default=10, help="steps per timed block")
    p.add_argument("--rounds", type=int, default=6, help="interleaved rounds")
    p.add_argument("--paths", default="scanned,unrolled",
                   help="comma list (scanned first by default: its compile is "
                        "minutes, so a tunnel outage mid-run still yields the "
                        "new number); a path whose BUILD fails is recorded as "
                        "build_error instead of aborting")
    p.add_argument("--aot", action="store_true", default=False,
                   help="time the production dispatch path "
                        "(ShapeDispatchingAOT) instead of explicit "
                        "lower/compile — honest steady-state ms/step")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    path_names = [n.strip() for n in args.paths.split(",") if n.strip()]
    paths, build_errors = {}, {}
    base_params = None
    for name in path_names:
        t0 = time.perf_counter()
        try:
            step_once, utts, timings, base_params = build(
                name == "scanned", args.bucket_len, args.batch_size, args.fp32,
                base_params, aot=args.aot,
            )
            warm = timed_block(step_once, 1)
        except Exception as e:  # noqa: BLE001 — remote-compile failures surface
            build_errors[name] = f"{type(e).__name__}: {e}"
            print(f"[{name}] BUILD FAILED after "
                  f"{time.perf_counter() - t0:.0f}s: {build_errors[name]}")
            continue
        paths[name] = {
            "step_once": step_once,
            "utts": utts,
            "timings": timings,
            "first_step_s": round(warm, 1),
            "blocks": [],
        }
        if args.aot:
            print(f"[{name}] aot dispatch; first step (build/load + run) {warm:.1f}s")
        else:
            print(f"[{name}] lower {timings['lower_s']}s, "
                  f"hlo {timings['stablehlo_text_mb']} MB, "
                  f"compile {timings['compile_s']}s, first step {warm:.1f}s")
        timed_block(step_once, 3)  # warm steady state

    for r in range(args.rounds):
        for name in paths:  # interleave: same tunnel minutes
            dt = timed_block(paths[name]["step_once"], args.steps)
            paths[name]["blocks"].append(dt)
            print(f"round {r} [{name}] {1000 * dt / args.steps:.2f} ms/step")

    report = {"config": {k: v for k, v in vars(args).items() if k != "out"}}
    if build_errors:
        report["build_errors"] = build_errors
    for name in paths:
        per_step = sorted(1000 * t / args.steps for t in paths[name]["blocks"])
        report[name] = {
            **paths[name]["timings"],
            "first_step_s": paths[name]["first_step_s"],
            "ms_per_step_median": round(statistics.median(per_step), 2),
            "ms_per_step_best": round(per_step[0], 2),
            "ms_per_step_all": [round(v, 2) for v in per_step],
            "utt_per_sec_median": round(
                paths[name]["utts"] * 1000 / statistics.median(per_step), 1
            ),
        }
    if "unrolled" in report and "scanned" in report and "scanned" in paths:
        if not args.aot:
            report["compile_speedup"] = round(
                report["unrolled"]["compile_s"]
                / max(report["scanned"]["compile_s"], 1e-9), 2
            )
        report["scanned_over_unrolled_ms_ratio"] = round(
            report["scanned"]["ms_per_step_median"]
            / report["unrolled"]["ms_per_step_median"],
            3,
        )
    print(json.dumps({k: v for k, v in report.items() if k != "config"}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
