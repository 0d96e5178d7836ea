"""Interleaved A/B: per-batch stage-A dispatch vs the epoch-fused scan.

The fused 12-duel program spends ~6.6 ms on device but 22-37 ms wall per
dispatch over the hosted tunnel, and bench.py's pipelined timing loop shows
those round-trips do NOT overlap — stage A (train_IEMOCAP.py:255-393) and
the sweep built on it are dispatch-bound on this deployment.
``make_gan_epoch_step`` (train/gan.py) scans the schedule over a whole
epoch's batches so ONE dispatch covers N steps; this script measures both
arms on identical work, interleaved within one session so tunnel drift hits
both equally (the protocol of scripts/ab_stage_a_attention.py).

Arms (same state init, same batches, same per-batch keys):
- per-step: N sequential ``make_gan_train_step`` dispatches, one final sync
  (exactly bench.py --stage-a's loop);
- epoch-fused: one ``make_gan_epoch_step`` dispatch over the N stacked
  batches.

Equivalence of the two arms' math is pinned by tests/test_epoch_fused.py;
this script only times them.

Run (real TPU, exclusive):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_stage_a_dispatch.py
The first run pays one compile for the epoch program (the per-step program
loads from the AOT disk cache if bench.py has run); both land in the cache
for later sessions.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from bench import realistic_batch  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4,
                   help="batches per epoch (reference stage A: 120 train "
                        "dialogues / batch 32 = 4)")
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--bucket-len", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--layers", type=int, default=8)
    args = p.parse_args()

    from gan_ffn_tpu.utils.runtime import configure_tpu_runtime, wait_for_device

    # Deployment runtime config (RBG PRNG) + the hosted-tunnel hang watchdog.
    # NOTE: the recorded 2026-08-19 run (PERF.md "stage-A dispatch") predates
    # this wiring and ran with the threefry default; the PRNG impl hits both
    # arms equally so the recorded 4.37x ratio stands, but absolute ms/step
    # from newer runs are not directly comparable with that table.
    configure_tpu_runtime()
    wait_for_device()

    import jax
    import jax.numpy as jnp

    print(f"[init] platform={jax.devices()[0].platform}", flush=True)

    from gan_ffn_tpu.train.gan import (
        GANConfig,
        init_gan_state,
        make_gan_epoch_step,
        make_gan_train_step,
    )

    L, B, N = args.bucket_len, args.batch_size, args.steps
    cfg = GANConfig(num_layers=args.layers, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batches, real_utt = [], 0.0
    for _ in range(N):
        batch, umask = realistic_batch(rng, L, B)
        real_utt += float(umask.sum())
        batches.append({
            k: batch[k] for k in ("text", "visual", "audio", "valid_len", "n_real")
        })
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

    key = jax.random.PRNGKey(1)
    keys = []
    for _ in range(N):
        key, sub = jax.random.split(key)
        keys.append(sub)
    kstack = jnp.stack(keys)

    state_a = init_gan_state(cfg, jax.random.PRNGKey(0))
    state_b = jax.tree.map(lambda x: jnp.array(np.asarray(x)), state_a)

    step = make_gan_train_step(cfg)
    t0 = time.perf_counter()
    for b, k in zip(batches, keys):
        state_a, losses = step(state_a, b, k)
    jax.block_until_ready(losses["duel_11"])
    print(f"[compile] per-step first epoch {time.perf_counter() - t0:.1f} s",
          flush=True)

    epoch_step = make_gan_epoch_step(cfg)
    t0 = time.perf_counter()
    state_b, sl = epoch_step(state_b, stacked, kstack)
    jax.block_until_ready(sl["duel_11"])
    print(f"[compile] epoch-fused first epoch {time.perf_counter() - t0:.1f} s",
          flush=True)

    res = {"per_step": [], "epoch_fused": []}
    for block in range(args.blocks):
        t0 = time.perf_counter()
        for b, k in zip(batches, keys):
            state_a, losses = step(state_a, b, k)
        jax.block_until_ready(losses["duel_11"])
        ms = (time.perf_counter() - t0) * 1e3 / N
        res["per_step"].append(ms)
        print(f"[block {block}] per-step    {ms:7.2f} ms/step", flush=True)

        t0 = time.perf_counter()
        state_b, sl = epoch_step(state_b, stacked, kstack)
        jax.block_until_ready(sl["duel_11"])
        ms = (time.perf_counter() - t0) * 1e3 / N
        res["epoch_fused"].append(ms)
        print(f"[block {block}] epoch-fused {ms:7.2f} ms/step", flush=True)

    med_a = statistics.median(res["per_step"])
    med_b = statistics.median(res["epoch_fused"])
    print(json.dumps({
        "bench": "stage_a_dispatch_ab",
        "platform": jax.devices()[0].platform,
        "L": L, "B": B, "layers": args.layers, "steps_per_epoch": N,
        "blocks": args.blocks,
        "per_step_ms": round(med_a, 2),
        "epoch_fused_ms": round(med_b, 2),
        "speedup": round(med_a / med_b, 3),
        "per_step_blocks": [round(x, 2) for x in res["per_step"]],
        "epoch_fused_blocks": [round(x, 2) for x in res["epoch_fused"]],
        # real utterances only (sum(umask)), comparable with bench.py --stage-a
        "per_step_utt_per_s": round(real_utt / N / med_a * 1000),
        "epoch_fused_utt_per_s": round(real_utt / N / med_b * 1000),
    }), flush=True)


if __name__ == "__main__":
    main()