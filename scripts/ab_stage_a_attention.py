"""Interleaved XLA-vs-Pallas attention A/B for the fused 12-duel stage-A
program, at HEAD, in ONE session.

Settles ROADMAP item 2 / VERDICT r3 item 7 with same-session numbers: the
round-2 measurement (PERF.md "Adversarial stage A": XLA 16.6 ms vs Pallas
26.5 ms steady-state) was taken across separate sessions, where the hosted
tunnel's ~±25% cross-process variance could in principle mask a real win.
Here both configurations are built in one process and their timed blocks are
INTERLEAVED (XLA, Pallas, XLA, Pallas, ...) so tunnel drift hits both paths
equally; the reported per-path statistics come from the same minutes of the
same session.

The two programs are the real `make_gan_train_step` products at the bench's
stage-A geometry (8-layer encoders, bf16, B=32, bucket 112 with realistic
20-110 lengths — bench.py --stage-a); the only difference is
``GANConfig.pallas_attention``, the trace-time switch stage A actually uses
(train/gan.py:290-294).

Run (real TPU, exclusive — no other jax process while this is active):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_stage_a_attention.py
Decision protocol (committed either way): if XLA still wins steady-state
ms/step, ROADMAP item 2 closes with these numbers; if Pallas wins,
`GANConfig.pallas_attention` flips to True from data.

OUTCOME (2026-08-17, this harness on the hosted v5e): the A/B could not be
completed because the Pallas variant of the fused 12-duel program does not
COMPILE on the hosted remote-compile path — the server-side
`tpu_compile_helper` subprocess is SIGKILL'd (HTTP 500, exit signal 9,
/tmp/ab_attn.log), i.e. the compile itself is OOM-killed, a harder form of
the >40-min compile that round 2 abandoned. The XLA variant compiles in
~20 min cold / loads from the AOT disk cache warm and its steady-state is
captured by `--paths xla` below. Decision recorded in ROADMAP.md item 2:
stage A keeps XLA attention; the per-path build guard and `--paths` flag
keep this harness re-runnable if the hosted compiler gains headroom.
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


def build(path_name: str, L: int, B: int, fp32: bool):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.train.gan import GANConfig, init_gan_state, make_gan_train_step

    cfg = GANConfig(
        num_layers=8,
        dtype=None if fp32 else jnp.bfloat16,
        pallas_attention=(path_name == "pallas"),
    )
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B)
    gan_batch = {k: batch[k] for k in ("text", "visual", "audio", "valid_len", "n_real")}
    state = init_gan_state(cfg, jax.random.PRNGKey(0))
    step = make_gan_train_step(cfg)
    holder = {"state": state, "key": jax.random.PRNGKey(1)}

    def step_once():
        holder["key"], sub = jax.random.split(holder["key"])
        holder["state"], losses = step(holder["state"], gan_batch, sub)
        return losses

    return step_once, float(umask.sum())


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
    p.add_argument("--paths", default="xla,pallas",
                   help="comma list of attention paths to build/time; a path "
                        "whose BUILD fails (e.g. the hosted compile helper "
                        "SIGKILLs on the fused Pallas program) is recorded as "
                        "build_error instead of aborting the run")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    path_names = [n.strip() for n in args.paths.split(",") if n.strip()]
    paths, build_errors = {}, {}
    for name in path_names:
        t0 = time.perf_counter()
        try:
            step_once, utts = build(name, args.bucket_len, args.batch_size, args.fp32)
            warm = timed_block(step_once, 1)  # compile (or AOT-cache load) + 1 step
        except Exception as e:  # noqa: BLE001 — remote-compile failures surface
            build_errors[name] = f"{type(e).__name__}: {e}"
            print(f"[{name}] BUILD FAILED after "
                  f"{time.perf_counter() - t0:.0f}s: {build_errors[name]}")
            continue
        paths[name] = {
            "step_once": step_once,
            "utts": utts,
            "build_plus_first_step_s": round(time.perf_counter() - t0, 1),
            "first_block_s": round(warm, 1),
            "blocks": [],
        }
        print(f"[{name}] built; first step (compile/load + run) "
              f"{paths[name]['build_plus_first_step_s']}s")
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
            "ms_per_step_median": round(statistics.median(per_step), 2),
            "ms_per_step_best": round(per_step[0], 2),
            "ms_per_step_all": [round(v, 2) for v in per_step],
            "utt_per_sec_median": round(
                paths[name]["utts"] * 1000 / statistics.median(per_step), 1
            ),
            "build_plus_first_step_s": paths[name]["build_plus_first_step_s"],
        }
    if "xla" in report and "pallas" in report and "pallas" in paths:
        ratio = (
            report["pallas"]["ms_per_step_median"] / report["xla"]["ms_per_step_median"]
        )
        report["pallas_over_xla_ms_ratio"] = round(ratio, 3)
        report["winner"] = "xla" if ratio > 1.0 else "pallas"
    elif "pallas" in build_errors:
        report["winner"] = "xla"  # pallas variant does not even compile
    print(json.dumps({k: v for k, v in report.items() if k != "config"}, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
