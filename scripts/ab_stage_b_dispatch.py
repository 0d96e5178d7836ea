"""Interleaved A/B: per-batch stage-B dispatch vs the epoch-fused scan.

Classifier train steps thread state sequentially (the next step consumes
the params the previous one produced), so their tunnel dispatch
round-trips cannot overlap — the hypothesis was that stage B
(train_IEMOCAP.py:103-197's loop, run every epoch for train/valid/test)
is dispatch-bound like stage A. MEASURED ANSWER (2026-08-20, PERF.md
"stage-B dispatch"): it is NOT — both classifier families' 19/33 ms
device compute hides the round-trip; epoch-fusing stage B is a wash
(0.98×/1.02×).
``make_classifier_epoch_steps`` (train/classifier.py) scans the step over
a whole epoch's batches so ONE dispatch covers N steps; this script
measures both arms on identical work, interleaved within one session so
tunnel drift hits both equally (the protocol of
scripts/ab_stage_a_dispatch.py).

Arms (same params init, same batches, same per-batch keys):
- per-step: N sequential ``make_classifier_steps`` train dispatches, one
  final sync (exactly bench.py's flagship loop);
- epoch-fused: one ``make_classifier_epoch_steps`` dispatch over the N
  stacked batches.

Equivalence of the two arms' math is pinned by
tests/test_epoch_fused_classifier.py; this script only times them.

Runtime config matches the deployment defaults (``configure_tpu_runtime``:
RBG PRNG — the threefry default both bloats the program with dropout-mask
generation, 2.35x slower end-to-end on the classifier step per PERF.md, and
multiplies the remote compile time) and device init goes through
``wait_for_device`` so a wedged hosted tunnel prints a periodic diagnostic
instead of hanging silently.

Run (real TPU, exclusive):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_stage_b_dispatch.py
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_stage_b_dispatch.py --model dialoguernn
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


def build_flagship(args, dtype):
    import jax

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS, make_gan_ffn_apply_fns
    from gan_ffn_tpu.models import GAN_FFN
    from gan_ffn_tpu.train.optim import torch_adam

    import jax.numpy as jnp

    model = GAN_FFN(n_classes=6, gen_num_layers=args.layers, dtype=dtype)
    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    opt = torch_adam(1e-4, weight_decay=0.008)

    def init(batch):
        return model.init(
            jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
        )["params"]

    return apply_train, apply_eval, opt, jnp.asarray(IEMOCAP_LOSS_WEIGHTS), init, False


def build_dialoguernn(args, dtype):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS
    from gan_ffn_tpu.models import GAN_FFN_DialogueRNN
    from gan_ffn_tpu.train.optim import torch_adam

    kwargs = dict(
        D_m=100, D_g=500, D_p=500, D_e=100, D_h=100, D_a=100, n_classes=6,
        context_attention="general", dropout_rec=0.1, dropout=0.6,
        gen_num_layers=args.layers, dtype=dtype,
    )
    model_train = GAN_FFN_DialogueRNN(**kwargs, deterministic=False)
    model_eval = GAN_FFN_DialogueRNN(**kwargs, deterministic=True)

    def apply_train(p, rng_, b):
        return model_train.apply(
            {"params": p}, b["audio"], b["visual"], b["text"], b["qmask"],
            b["umask"], valid_len=b["valid_len"], rngs={"dropout": rng_},
        )[0]

    def apply_eval(p, b):
        return model_eval.apply(
            {"params": p}, b["audio"], b["visual"], b["text"], b["qmask"],
            b["umask"], valid_len=b["valid_len"],
        )[0]

    opt = torch_adam(1e-4, weight_decay=1e-5)

    def init(batch):
        return model_eval.init(
            jax.random.PRNGKey(0), batch["audio"], batch["visual"],
            batch["text"], batch["qmask"], batch["umask"],
        )["params"]

    return apply_train, apply_eval, opt, jnp.asarray(IEMOCAP_LOSS_WEIGHTS), init, True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("flagship", "dialoguernn"),
                   default="flagship")
    p.add_argument("--steps", type=int, default=4,
                   help="batches per epoch (reference stage B: ~108 train "
                        "dialogues / batch 32 (30) = 4)")
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--bucket-len", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = reference default (32 flagship / 30 dialoguernn)")
    p.add_argument("--layers", type=int, default=8)
    args = p.parse_args()

    from gan_ffn_tpu.utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    wait_for_device()

    import jax
    import jax.numpy as jnp

    print(f"[init] platform={jax.devices()[0].platform}", flush=True)

    from gan_ffn_tpu.train.classifier import (
        init_classifier_state,
        make_classifier_epoch_steps,
        make_classifier_steps,
    )

    dtype = jnp.bfloat16
    build = build_dialoguernn if args.model == "dialoguernn" else build_flagship
    apply_train, apply_eval, opt, weights, init, with_qmask = build(args, dtype)

    L = args.bucket_len
    B = args.batch_size or (30 if args.model == "dialoguernn" else 32)
    N = args.steps
    rng = np.random.default_rng(0)
    batches, real_utt = [], 0.0
    for _ in range(N):
        batch, umask = realistic_batch(rng, L, B, with_qmask=with_qmask)
        real_utt += float(umask.sum())
        batches.append(batch)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

    key = jax.random.PRNGKey(1)
    keys = []
    for _ in range(N):
        key, sub = jax.random.split(key)
        keys.append(sub)
    kstack = jnp.stack(keys)

    t0 = time.perf_counter()
    params = init(batches[0])
    jax.block_until_ready(params)
    print(f"[init] params initialized in {time.perf_counter() - t0:.1f} s",
          flush=True)
    state_a = init_classifier_state(params, opt)
    # Clone ON DEVICE: a host round-trip (np.asarray per leaf) costs one
    # tunnel RTT per param leaf — measured ~30 wall-minutes for
    # DialogueRNN's hundreds of small leaves (PERF.md "stage-B dispatch").
    state_b = jax.tree.map(jnp.copy, state_a)

    train_step, _ = make_classifier_steps(apply_train, apply_eval, opt, 6, weights)
    t0 = time.perf_counter()
    for b, k in zip(batches, keys):
        state_a, loss, _ = train_step(state_a, k, b)
    jax.block_until_ready(loss)
    print(f"[compile] per-step first epoch {time.perf_counter() - t0:.1f} s",
          flush=True)

    epoch_step, _ = make_classifier_epoch_steps(apply_train, apply_eval, opt, 6, weights)
    t0 = time.perf_counter()
    state_b, (losses, _) = epoch_step(state_b, stacked, kstack)
    jax.block_until_ready(losses)
    print(f"[compile] epoch-fused first epoch {time.perf_counter() - t0:.1f} s",
          flush=True)

    res = {"per_step": [], "epoch_fused": []}
    for block in range(args.blocks):
        t0 = time.perf_counter()
        for b, k in zip(batches, keys):
            state_a, loss, _ = train_step(state_a, k, b)
        jax.block_until_ready(loss)
        ms = (time.perf_counter() - t0) * 1e3 / N
        res["per_step"].append(ms)
        print(f"[block {block}] per-step    {ms:7.2f} ms/step", flush=True)

        t0 = time.perf_counter()
        state_b, (losses, _) = epoch_step(state_b, stacked, kstack)
        jax.block_until_ready(losses)
        ms = (time.perf_counter() - t0) * 1e3 / N
        res["epoch_fused"].append(ms)
        print(f"[block {block}] epoch-fused {ms:7.2f} ms/step", flush=True)

    med_a = statistics.median(res["per_step"])
    med_b = statistics.median(res["epoch_fused"])
    print(json.dumps({
        "bench": "stage_b_dispatch_ab",
        "model": args.model,
        "platform": jax.devices()[0].platform,
        "L": L, "B": B, "layers": args.layers, "steps_per_epoch": N,
        "blocks": args.blocks,
        "per_step_ms": round(med_a, 2),
        "epoch_fused_ms": round(med_b, 2),
        "speedup": round(med_a / med_b, 3),
        "per_step_blocks": [round(x, 2) for x in res["per_step"]],
        "epoch_fused_blocks": [round(x, 2) for x in res["epoch_fused"]],
        # real utterances only (sum(umask)), comparable with bench.py
        "per_step_utt_per_s": round(real_utt / N / med_a * 1000),
        "epoch_fused_utt_per_s": round(real_utt / N / med_b * 1000),
    }), flush=True)


if __name__ == "__main__":
    main()
