"""Throughput benchmark: utterances/sec/chip on the framework's hot paths.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "utterances/sec/chip", "vs_baseline": N,
     "median": N, "spread": N, "n_runs": N}

``value`` is best-of-n_runs (comparable with earlier rounds' captures);
``median``/``spread`` make a single capture interpretable against the hosted
tunnel's ~±25% cross-process variance (PERF.md): spread = (max-min)/median
over the in-process repeats. Round-over-round deltas smaller than the session
variance bar are noise regardless of the in-process spread.

The protocol self-defends against tunnel noise (round 5): a capture whose
spread exceeds 0.3 auto-extends with a second set of repeats
(``"extended": true``); if the merged capture is still above the limit the
line carries ``"noisy": true`` so driver records stay interpretable without
PERF.md's variance lore. Each path also reports its hardware ceiling:
``model_flops_per_step`` (XLA cost analysis of the lowered HLO — model-FLOPs
in the MFU sense, no extra compile) and ``pct_peak_mxu`` (flops /
median-step-time / chip bf16 peak, e.g. 197 TFLOP/s for v5e).

Three hot paths, all at the reference's own shapes, all counting only REAL
utterances (sum(umask) with realistic dialogue lengths 20-110):

- flagship           — GAN_FFN classifier train step (3x 8-layer
                       encoders fwd+bwd + masked NLL + torch-Adam), batch 32.
- --stage-a          — the fused 12-duel adversarial step (train/gan.py):
                       12 sequential loss/grad/Adam updates over the six
                       8-layer GAN nets in ONE program, batch 32. Value is
                       utterances/sec THROUGH THE FULL SCHEDULE (each
                       utterance is processed by all 12 duels per step).
- --dialoguernn      — GAN_FFN_DialogueRNN train step (3 generators + BiModel
                       bidirectional lax.scan + att2), batch 30
                       (train_IEMOCAP_DialogueRNN.py:635-641).

DEFAULT (no mode flag, round 4+): benches ALL THREE paths and prints three
JSON lines in the order stage-A, DialogueRNN, flagship — the flagship line
LAST so a driver that parses the final line still records the metric
comparable with rounds 1-3 (``BENCH_r*.json``). ``--flagship`` restores the
single-line flagship-only run.

ALL three lines additionally carry ``epoch_fused_*`` fields: the same step
scanned over an N=4-batch epoch in ONE dispatch (``--epoch-fused``), which
removes the per-step tunnel round-trip the headline loop pays — the hosted
steps are dispatch-bound, not compute-bound (PERF.md "stage-A dispatch" /
"stage-B dispatch"). The headline ``value`` stays the per-step loop so it
remains comparable with rounds 1-3.

Baselines: the reference publishes no throughput numbers (BASELINE.md), so
each mode carries an estimate of the reference's V100 rate, anchored by
measurements of the reference's OWN torch code on this host's CPU (PERF.md):

- stage B eager GAN_FFN measured 147 utt/s on host CPU; V100 estimate 1000.
- stage A runs 12 eager duels/batch with a host sync after each duel
  (train_IEMOCAP.py:224,249); per-duel cost is comparable to a stage-B step
  of one net (~1/3 the three-encoder flagship), so the schedule-level rate is
  estimated at 1000 * 3 / 12 / 2 = 125 utt/s... conservatively rounded UP to
  250 utt/s to avoid flattering vs_baseline.
- DialogueRNN adds Python per-timestep loops over ~110 steps (three of them:
  fwd scan, rev scan, att2) on top of the three encoders; its V100 rate is
  estimated at 300 utt/s (the loops dominate; README gives no numbers).

vs_baseline = measured / estimate; the north-star target is >= 10x.

Compute dtype: bfloat16 on the MXU with float32 parameters/softmax/loss — the
TPU-native configuration. Pass --fp32 to measure in float32.
"""

import argparse
import json
import time

import numpy as np

REFERENCE_V100_UPS = 1000.0
REFERENCE_V100_STAGE_A_UPS = 250.0
REFERENCE_V100_DIALOGUERNN_UPS = 300.0


def realistic_batch(rng, L, B, with_qmask=False):
    import jax.numpy as jnp

    lengths = rng.integers(20, min(111, L + 1), size=B)
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
    if with_qmask:
        qmask = np.eye(2, dtype=np.float32)[rng.integers(0, 2, size=(L, B))]
        for b, n in enumerate(lengths):
            qmask[n:, b] = 0.0
        batch["qmask"] = jnp.asarray(qmask)
    return batch, umask


def timed_loop(step_once, loss_ref, steps, reps=5):
    """Wall times (seconds, one per rep) for `steps` dispatches each.

    The caller reports best-of-reps as the headline (comparable with earlier
    rounds) plus median/spread so single-shot captures are interpretable
    against the hosted tunnel's ~±25% cross-process variance (PERF.md)."""
    import jax

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(steps):
            out = step_once()
        jax.block_until_ready(loss_ref(out))
        times.append(time.perf_counter() - t0)
    return times


def throughput_stats(utt_per_run: float, times, baseline: float) -> dict:
    """In-process repeat statistics for the JSON line: value (best), median,
    spread (max-min over median, a dimensionless noise indicator), n_runs."""
    rates = sorted(utt_per_run / t for t in times)
    best = rates[-1]
    median = rates[len(rates) // 2]
    return {
        "value": round(best, 1),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(best / baseline, 2),
        "median": round(median, 1),
        "spread": round((rates[-1] - rates[0]) / median, 3),
        "n_runs": len(rates),
    }


# A capture whose in-process spread exceeds this is tunnel noise, not signal
# (BENCH_r04's flagship line committed a 0.547-spread capture; rounds 2-3
# medians showed no regression — the protocol now defends itself instead of
# relying on PERF.md's variance lore).
SPREAD_LIMIT = 0.3


def robust_stats(step_once, loss_ref, steps, utt_per_step, baseline, reps=5):
    """timed_loop + throughput_stats with noise self-defense: when the
    spread over the repeats exceeds SPREAD_LIMIT, the measurement
    auto-extends with another `reps` repeats (doubling the sample) and
    recomputes; if the merged capture is STILL above the limit the line is
    marked ``"noisy": true`` so the driver's record carries its own health
    flag. Returns (stats, times)."""
    times = timed_loop(step_once, loss_ref, steps, reps)
    stats = throughput_stats(utt_per_step * steps, times, baseline)
    if stats["spread"] > SPREAD_LIMIT:
        times = times + timed_loop(step_once, loss_ref, steps, reps)
        stats = throughput_stats(utt_per_step * steps, times, baseline)
        stats["extended"] = True
        if stats["spread"] > SPREAD_LIMIT:
            stats["noisy"] = True
    return stats, times


# Per-chip dense peak (FLOP/s) at the MXU's native bf16 precision, by
# jax device_kind. Sources: Google Cloud TPU public specs (v4 275 TF,
# v5e 197 TF, v5p 459 TF, v6e/Trillium 918 TF bf16 per chip).
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def mxu_fields(lowerable, args, times, steps) -> dict:
    """``model_flops_per_step`` + ``pct_peak_mxu`` for a bench line.

    FLOPs come from XLA's cost analysis of the LOWERED (pre-optimization)
    HLO — no extra backend compile — so each throughput number carries its
    hardware ceiling: pct_peak_mxu = flops / median_step_time / peak(chip).
    This is model-FLOPs utilization (MFU) in the scaling-book sense; fusion
    or remat changes executed FLOPs but not this numerator, which is the
    convention that makes runs comparable.

    ``lowerable`` is anything with ``.lower`` (a ``jax.jit`` object); the
    lowering runs on CPU over abstract avals of ``args`` — model FLOPs are
    backend-independent, and the hosted TPU backend returns None from
    ``Lowered.cost_analysis`` (measured 2026-08-20) while XLA:CPU fills it.
    Guarded: any failure just omits the fields."""
    import sys

    try:
        import jax

        from gan_ffn_tpu.ops.config import use_pallas_attention, use_pallas_mlp

        avals = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            args,
        )
        # trace the XLA (non-Pallas) path: Mosaic kernels don't lower for
        # XLA:CPU, and the kernels compute the same model FLOPs anyway
        with jax.default_device(jax.devices("cpu")[0]), \
                use_pallas_attention(False), use_pallas_mlp(False):
            lowered = lowerable.lower(*avals)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returned [dict]
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", 0.0) or 0.0)
        if flops <= 0:
            return {}
        med_step = sorted(times)[len(times) // 2] / steps
        fields = {"model_flops_per_step": float(f"{flops:.4g}")}
        peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
        if peak:
            pct = round(100.0 * flops / med_step / peak, 2)
            fields["pct_peak_mxu"] = pct
            if pct > 100.0:
                # Unoptimized-HLO FLOPs at the measured step time exceed the
                # chip's NOMINAL peak — measured for the 12-duel program on
                # the hosted v5e (PERF.md "round-5 MFU fields"): either XLA
                # eliminates a large fraction of the as-written FLOPs for
                # this program, or the tunneled backend is faster than its
                # reported device_kind (its memory is demonstrably
                # virtualized). Flag rather than hide.
                fields["pct_peak_mxu_suspect"] = True
        return fields
    except Exception as e:  # pragma: no cover - defensive driver guard
        print(f"mxu fields skipped: {e!r}", file=sys.stderr)
        return {}


def bench_classifier(args):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS, make_gan_ffn_apply_fns
    from gan_ffn_tpu.models import GAN_FFN
    from gan_ffn_tpu.train.classifier import (
        init_classifier_state,
        make_classifier_epoch_steps,
        make_classifier_steps,
    )
    from gan_ffn_tpu.train.optim import torch_adam

    L, B = args.bucket_len, args.batch_size
    dtype = None if args.fp32 else jnp.bfloat16
    model = GAN_FFN(n_classes=6, gen_num_layers=args.num_layers, dtype=dtype)
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B)
    params = model.init(
        jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
    )["params"]

    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    opt = torch_adam(1e-4, weight_decay=0.008)
    train_step, _ = make_classifier_steps(
        apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )
    state = init_classifier_state(params, opt)
    # pristine params copy for the epoch-fused leg: the per-batch loop
    # donates `state` (and with it the original init buffers) every step
    params_f = jax.tree.map(jnp.copy, params)

    key = jax.random.PRNGKey(1)
    holder = {"state": state, "key": key}

    def step_once():
        holder["key"], sub = jax.random.split(holder["key"])
        holder["state"], loss, preds = train_step(holder["state"], sub, batch)
        return loss

    for _ in range(args.warmup):
        loss = step_once()
    jax.block_until_ready(loss)
    tstats, times = robust_stats(
        step_once, lambda loss: loss, args.steps, float(umask.sum()),
        REFERENCE_V100_UPS,
    )
    stats = {
        "metric": "utterances/sec/chip (GAN_FFN train step, IEMOCAP flagship)",
        **tstats,
    }
    stats.update(mxu_fields(
        train_step, (holder["state"], key, batch), times, args.steps
    ))
    stats.update(_epoch_fused_leg(
        make_classifier_epoch_steps(
            apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
        )[0],
        init_classifier_state(params_f, opt), batch, umask, args,
        REFERENCE_V100_UPS,
    ))
    return stats


def _epoch_fused_leg(train_epoch_step, state, batch, umask, args, baseline):
    """Extra ``epoch_fused_*`` fields for a classifier bench line: the
    ``make_classifier_epoch_steps`` scan dispatches ONE program per N-batch
    epoch, removing the per-step tunnel round-trip the per-batch loop pays
    (the same dispatch-bound finding as stage A, PERF.md "stage-B
    dispatch"). Guarded so a compile failure cannot take down the driver's
    bench capture."""
    import sys

    import jax
    import jax.numpy as jnp

    try:
        N = 4  # reference stage B: ~108 train dialogues / batch 32 (30)
        stacked = {k: jnp.stack([batch[k]] * N) for k in batch}
        holder = {"state": state, "key": jax.random.PRNGKey(2)}

        def epoch_once():
            keys = jax.random.split(holder["key"], N + 1)
            holder["key"] = keys[0]
            holder["state"], (losses, _) = train_epoch_step(
                holder["state"], stacked, keys[1:]
            )
            return losses

        jax.block_until_ready(epoch_once())
        n_epochs = max(1, args.steps // N)
        fused, _ = robust_stats(
            epoch_once, lambda l: l, n_epochs, float(umask.sum()) * N, baseline
        )
        out = {
            "epoch_fused_value": fused["value"],
            "epoch_fused_median": fused["median"],
            "epoch_fused_spread": fused["spread"],
            "epoch_fused_vs_baseline": fused["vs_baseline"],
        }
        if fused.get("noisy"):
            out["epoch_fused_noisy"] = True
        return out
    except Exception as e:  # pragma: no cover - defensive driver guard
        print(f"epoch-fused leg skipped: {e!r}", file=sys.stderr)
        return {}


def bench_stage_a(args):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.train.gan import GANConfig, init_gan_state, make_gan_train_step

    L, B = args.bucket_len, args.batch_size
    dtype = None if args.fp32 else jnp.bfloat16
    cfg = GANConfig(num_layers=args.num_layers, dtype=dtype)
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B)
    gan_batch = {
        k: batch[k] for k in ("text", "visual", "audio", "valid_len", "n_real")
    }
    state = init_gan_state(cfg, jax.random.PRNGKey(0))
    step = make_gan_train_step(cfg)
    key = jax.random.PRNGKey(1)
    holder = {"state": state, "key": key}

    def step_once():
        holder["key"], sub = jax.random.split(holder["key"])
        holder["state"], losses = step(holder["state"], gan_batch, sub)
        return losses

    for _ in range(args.warmup):
        losses = step_once()
    jax.block_until_ready(losses["duel_11"])
    tstats, times = robust_stats(
        step_once, lambda l: l["duel_11"], args.steps, float(umask.sum()),
        REFERENCE_V100_STAGE_A_UPS,
    )
    stats = {
        "metric": "utterances/sec/chip (fused 12-duel stage-A GAN step)",
        **tstats,
    }
    # the AOT wrapper exposes its traced schedule fn; re-lowering is pure
    # tracing (no backend compile), cheap next to the bench itself
    stats.update(mxu_fields(
        jax.jit(step.fn), (holder["state"], gan_batch, key), times, args.steps
    ))

    # epoch-fused variant (--epoch-fused / make_gan_epoch_step): one dispatch
    # per 4-batch epoch removes the per-step tunnel round-trip the line above
    # pays (measured 4.37x, PERF.md "stage-A dispatch"). Reported as extra
    # fields on the same JSON line; guarded so a cold-cache compile failure
    # cannot take down the driver's bench capture.
    try:
        import sys

        from gan_ffn_tpu.train.gan import make_gan_epoch_step

        N = 4  # reference stage A: 120 train dialogues / batch 32
        stacked = {k: jnp.stack([gan_batch[k]] * N) for k in gan_batch}
        epoch_step = make_gan_epoch_step(cfg)
        fholder = {"state": init_gan_state(cfg, jax.random.PRNGKey(0)),
                   "key": jax.random.PRNGKey(2)}

        def epoch_once():
            keys = jax.random.split(fholder["key"], N + 1)
            fholder["key"] = keys[0]
            fholder["state"], l = epoch_step(fholder["state"], stacked, keys[1:])
            return l

        jax.block_until_ready(epoch_once()["duel_11"])
        n_epochs = max(1, args.steps // N)
        fused, _ = robust_stats(
            epoch_once, lambda l: l["duel_11"], n_epochs,
            float(umask.sum()) * N, REFERENCE_V100_STAGE_A_UPS,
        )
        stats.update({
            "epoch_fused_value": fused["value"],
            "epoch_fused_median": fused["median"],
            "epoch_fused_spread": fused["spread"],
            "epoch_fused_vs_baseline": fused["vs_baseline"],
        })
        if fused.get("noisy"):
            stats["epoch_fused_noisy"] = True
    except Exception as e:  # pragma: no cover - defensive driver guard
        print(f"stage-a epoch-fused leg skipped: {e!r}", file=sys.stderr)

    return stats


def bench_dialoguernn(args):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS
    from gan_ffn_tpu.models import GAN_FFN_DialogueRNN
    from gan_ffn_tpu.train.classifier import (
        init_classifier_state,
        make_classifier_epoch_steps,
        make_classifier_steps,
    )
    from gan_ffn_tpu.train.optim import torch_adam

    L = args.bucket_len
    B = 30 if args.batch_size == 32 else args.batch_size  # reference batch 30
    dtype = None if args.fp32 else jnp.bfloat16
    kwargs = dict(
        D_m=100, D_g=500, D_p=500, D_e=100, D_h=100, D_a=100, n_classes=6,
        context_attention="general", dropout_rec=0.1, dropout=0.6,
        gen_num_layers=args.num_layers, dtype=dtype,
    )
    model_train = GAN_FFN_DialogueRNN(**kwargs, deterministic=False)
    model_eval = GAN_FFN_DialogueRNN(**kwargs, deterministic=True)
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B, with_qmask=True)
    params = model_eval.init(
        jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"],
        batch["qmask"], batch["umask"],
    )["params"]

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
    train_step, _ = make_classifier_steps(
        apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )
    state = init_classifier_state(params, opt)
    # pristine params copy for the epoch-fused leg (the per-batch loop
    # donates the original init buffers)
    params_f = jax.tree.map(jnp.copy, params)
    key = jax.random.PRNGKey(1)
    holder = {"state": state, "key": key}

    def step_once():
        holder["key"], sub = jax.random.split(holder["key"])
        holder["state"], loss, preds = train_step(holder["state"], sub, batch)
        return loss

    for _ in range(args.warmup):
        loss = step_once()
    jax.block_until_ready(loss)
    tstats, times = robust_stats(
        step_once, lambda loss: loss, args.steps, float(umask.sum()),
        REFERENCE_V100_DIALOGUERNN_UPS,
    )
    stats = {
        "metric": "utterances/sec/chip (GAN_FFN_DialogueRNN train step)",
        **tstats,
    }
    stats.update(mxu_fields(
        train_step, (holder["state"], key, batch), times, args.steps
    ))
    stats.update(_epoch_fused_leg(
        make_classifier_epoch_steps(
            apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
        )[0],
        init_classifier_state(params_f, opt), batch, umask, args,
        REFERENCE_V100_DIALOGUERNN_UPS,
    ))
    return stats


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fp32", action="store_true", default=False)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--bucket-len", type=int, default=112)
    parser.add_argument("--num-layers", type=int, default=8,
                        help="encoder depth; 8 is the reference/headline "
                             "geometry — lower ONLY for smoke-testing the "
                             "bench paths on CPU (numbers are not "
                             "round-comparable)")
    mode = parser.add_mutually_exclusive_group()
    mode.add_argument("--stage-a", action="store_true", default=False,
                      help="bench ONLY the fused 12-duel adversarial step")
    mode.add_argument("--dialoguernn", action="store_true", default=False,
                      help="bench ONLY the GAN_FFN_DialogueRNN train step")
    mode.add_argument("--flagship", action="store_true", default=False,
                      help="bench ONLY the flagship GAN_FFN classifier step")
    parser.add_argument("--no-pallas-attention", action="store_true", default=False,
                        help="A/B: force the XLA attention path")
    parser.add_argument("--no-pallas-mlp", action="store_true", default=False,
                        help="A/B: force the XLA MLP path")
    args = parser.parse_args()

    from gan_ffn_tpu.utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    wait_for_device()  # hosted TPU plugin registration can fail transiently

    import contextlib

    from gan_ffn_tpu.ops.config import use_pallas_attention, use_pallas_mlp

    with contextlib.ExitStack() as stack:
        if args.no_pallas_attention:
            stack.enter_context(use_pallas_attention(False))
        if args.no_pallas_mlp:
            stack.enter_context(use_pallas_mlp(False))
        if args.stage_a:
            benches = [bench_stage_a]
        elif args.dialoguernn:
            benches = [bench_dialoguernn]
        elif args.flagship:
            benches = [bench_classifier]
        else:
            # all three hot paths; flagship LAST so the driver's final-line
            # parse stays the round-comparable flagship metric
            benches = [bench_stage_a, bench_dialoguernn, bench_classifier]
        for bench in benches:
            print(json.dumps(bench(args)), flush=True)


if __name__ == "__main__":
    main()
