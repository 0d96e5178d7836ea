"""Interleaved A/B of the fused bidirectional DialogueRNN scan on the REAL
entry train step (GAN_FFN_DialogueRNN: 3x 8-layer generators + BiModel +
masked NLL + torch-Adam), at the bench geometry (L=112, B=30, bf16).

The prototype measurement (scripts/bench_bimodel_variants.py) showed the
direction-stacked scan wins 1.39x on BiModel fwd+bwd in isolation; this
script measures what that buys END TO END, with the switch integrated
(models/dialogue_rnn.py::_stacked_bidir_scan behind ops/config.py's
GANFFN_STACK_BIDIR). Both programs are built in ONE process via the
trace-time context manager and their timed blocks are interleaved, so the
hosted tunnel's cross-process variance (PERF.md, ~±25%) hits both paths
equally — same protocol as scripts/ab_stage_a_attention.py.

Run (real TPU, exclusive — no other jax process while this is active):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_dialoguernn_stacked.py

Decision protocol: if `stacked` beats `reference` by more than the block
spread, GANFFN_STACK_BIDIR stays default-ON and PERF.md records the numbers;
a regression flips the default OFF (the integration is a pure trace-time
switch either way).

Result (hosted v5e, 2026-08-18, 4 blocks x 10 steps): reference median
50.55 ms/step (40.1k utt/s) vs stacked 42.81 (47.4k) — **1.18x end-to-end**,
per-block spread < 0.3% on both paths; stacked also compiled 2.3x faster
(111.8 s vs 252.4 s). Decision: default stays ON.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from bench import realistic_batch  # noqa: E402


def build(stacked: bool, L: int, B: int, fp32: bool):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS
    from gan_ffn_tpu.models import GAN_FFN_DialogueRNN
    from gan_ffn_tpu.ops.config import use_stacked_bidir
    from gan_ffn_tpu.train.classifier import (
        init_classifier_state,
        make_classifier_steps,
    )
    from gan_ffn_tpu.train.optim import torch_adam

    dtype = jnp.float32 if fp32 else jnp.bfloat16
    kwargs = dict(
        D_m=100, D_g=500, D_p=500, D_e=100, D_h=100, D_a=100, n_classes=6,
        context_attention="general", dropout_rec=0.1, dropout=0.6,
        gen_num_layers=8, dtype=dtype,
    )
    model_train = GAN_FFN_DialogueRNN(**kwargs, deterministic=False)
    model_eval = GAN_FFN_DialogueRNN(**kwargs, deterministic=True)
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B, with_qmask=True)
    with use_stacked_bidir(False):
        params = model_eval.init(
            jax.random.PRNGKey(0), batch["audio"], batch["visual"],
            batch["text"], batch["qmask"], batch["umask"],
        )["params"]

    def apply_train(p, rng_, b):
        with use_stacked_bidir(stacked):
            return model_train.apply(
                {"params": p}, b["audio"], b["visual"], b["text"], b["qmask"],
                b["umask"], valid_len=b["valid_len"], rngs={"dropout": rng_},
            )[0]

    def apply_eval(p, b):
        with use_stacked_bidir(stacked):
            return model_eval.apply(
                {"params": p}, b["audio"], b["visual"], b["text"], b["qmask"],
                b["umask"], valid_len=b["valid_len"],
            )[0]

    opt = torch_adam(1e-4, weight_decay=1e-5)
    train_step, _ = make_classifier_steps(
        apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )
    state = init_classifier_state(params, opt)
    holder = {"state": state, "key": jax.random.PRNGKey(1)}

    def step_once():
        holder["key"], sub = jax.random.split(holder["key"])
        holder["state"], loss, preds = train_step(holder["state"], sub, batch)
        return loss

    return step_once, float(umask.sum())


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bucket-len", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=30)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--blocks", type=int, default=4)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import jax

    paths = {}
    for name, stacked in (("reference", False), ("stacked", True)):
        t0 = time.perf_counter()
        step_once, n_utt = build(stacked, args.bucket_len, args.batch_size, args.fp32)
        loss = step_once()
        jax.block_until_ready(loss)
        print(f"[compile] {name:9s} {time.perf_counter() - t0:7.1f} s", flush=True)
        paths[name] = (step_once, n_utt)

    from ab_common import ab_summary, run_interleaved

    results = run_interleaved(paths, args.blocks, args.steps)
    print(json.dumps(ab_summary(
        "dialoguernn_train_step_stacked_ab", args.bucket_len, args.batch_size,
        args.fp32, args.blocks, args.steps, results, paths,
        ratio_key="speedup", numerator="reference", denominator="stacked",
    )))


if __name__ == "__main__":
    main()
