"""GAN-epoch sweep driver (reference run.sh:7-21 + output/history artifacts).

The reference sweeps ``--GAN-epochs`` by re-running the whole entry script per
value (sequential full restarts; the commented run.sh loop resumes from
checkpoints in +5-epoch steps). TPU-native redesign: ONE incremental
adversarial run that snapshots generator params at every sweep point, then a
classifier train per snapshot — stage A work is shared across the entire
sweep instead of repeated.

Artifacts match the reference's history layout: one
``output/history/test_out_GAN-epochs={g}_F1-score={f1}.txt`` per sweep point
plus the cumulative ``GAN_loss.csv``/``GAN_loss.png``.

Run: ``python -m gan_ffn_tpu.cli.sweep --gan-epochs 85 185 5 --epochs 160``
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from ..data import get_iemocap_loaders, write_synthetic_iemocap
from ..models import GAN_FFN
from ..train.classifier import (
    graft_generator_params,
    init_classifier_state,
    make_classifier_steps,
)
from ..train.gan import GANConfig
from ..train.loop import batch_to_arrays, run_epoch
from ..train.optim import torch_adam
from ..utils.artifacts import draw_gan_loss, save_gan_loss_csv
from ..evaluation.reports import write_test_report
from .common import (
    IEMOCAP_LOSS_WEIGHTS,
    make_gan_ffn_apply_fns,
    resolve_epoch_fused_auto,
    train_gan,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GAN-epochs sweep (TPU-native)")
    p.add_argument("--gan-epochs", nargs=3, type=int, default=[85, 185, 5],
                   metavar=("START", "STOP", "STEP"),
                   help="sweep range over GAN pre-train epochs (inclusive stop)")
    p.add_argument("--epochs", type=int, default=160, help="classifier epochs per point")
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--l2", type=float, default=0.008)
    p.add_argument("--dropout", type=float, default=0.6)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--data-path", default="data/iemocap/IEMOCAP_features.pkl")
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--epoch-fused", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="BOTH stages dispatch ONE scanned program per "
                        "same-shape batch group per epoch — the sweep is "
                        "15.3x stage-A-bound and stage A's hosted step is "
                        "dispatch-bound, 4.4x fused (stage-B leg measured "
                        "neutral — PERF.md stage-A/stage-B dispatch). "
                        "Default AUTO: fused when every epoch is one shape "
                        "group (then it is numerically IDENTICAL to the "
                        "per-batch loop, tests/test_epoch_fused.py); "
                        "per-batch when the data spans several buckets "
                        "(fusion would reorder updates across groups vs "
                        "the reference cadence). --epoch-fused / "
                        "--no-epoch-fused force either way.")
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--synthetic-train", type=int, default=120)
    p.add_argument("--synthetic-test", type=int, default=31)
    p.add_argument("--synthetic-max-len", type=int, default=110)
    p.add_argument("--synthetic-class-spread", type=float, default=2.0)
    p.add_argument("--synthetic-noise", type=float, default=1.0)
    p.add_argument("--synthetic-label-noise", type=float, default=0.0)
    p.add_argument("--synthetic-confusable-pairs", type=int, default=0,
                   help="collapse N class-mean pairs per modality (rotated) so "
                        "classes separate only through cross-modal fusion — the "
                        "fixture regime where the GAN-epochs budget can move "
                        "final F1 (data/synthetic.py::_collapse_confusable_pairs)")
    p.add_argument("--synthetic-nonuniform-priors", action="store_true", default=False,
                   help="skew class priors (geometric 0.75 decay) so the class "
                        "modes differ in mass and the unsupervised 12-duel mode "
                        "correspondence is identifiable")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    print(args)
    from ..utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    wait_for_device()

    if args.synthetic and os.path.exists(args.data_path):
        # the fixture-generation params describe a pickle we will NOT write —
        # a stale file from a different regime (e.g. non-confusable) would
        # otherwise silently produce the flat F1 column the regime flags
        # exist to avoid
        print(
            f"WARNING: {args.data_path} already exists; --synthetic-* "
            "fixture parameters are IGNORED (delete the file or point "
            "--data-path elsewhere to regenerate)"
        )
    if args.synthetic and not os.path.exists(args.data_path):
        priors = None
        if args.synthetic_nonuniform_priors:
            priors = [0.75 ** i for i in range(6)]
        write_synthetic_iemocap(
            args.data_path, n_train=args.synthetic_train, n_test=args.synthetic_test,
            max_len=args.synthetic_max_len, seed=args.seed,
            class_spread=args.synthetic_class_spread, noise=args.synthetic_noise,
            label_noise=args.synthetic_label_noise,
            confusable_pairs=args.synthetic_confusable_pairs,
            class_priors=priors,
        )

    start, stop, step = args.gan_epochs
    points = list(range(start, stop + 1, step))
    dtype = jnp.bfloat16 if args.bf16 else None
    gan_cfg = GANConfig(
        num_layers=args.num_layers, lr=0.0001, b1=0.5, b2=0.6, dtype=dtype,
        seed=args.seed,
    )
    gan_train_loader, _, _ = get_iemocap_loaders(
        args.data_path, batch_size=32, valid=0.1, seed=args.seed
    )

    # Stage A once, snapshotting generators at each sweep point. The copy is
    # ONE jitted program: an eager per-leaf .copy() dispatches hundreds of
    # tiny ops at one tunnel RTT each (~52 s/snapshot measured on the hosted
    # chip vs ~1 s for a whole 4-bucket GAN epoch); only the generator
    # subtrees are kept — stage B grafts generators, never discriminators
    # (train/classifier.py::graft_generator_params).
    from ..train.classifier import GENERATOR_GAN_KEYS

    if args.epoch_fused is None:
        args.epoch_fused = resolve_epoch_fused_auto(gan_train_loader)

    snapshot_gens = jax.jit(
        lambda p: jax.tree.map(jnp.copy, {k: p[k] for k in GENERATOR_GAN_KEYS})
    )
    from ..train.gan import make_gan_epoch_step, make_gan_train_step

    # built ONCE across all segments (a fresh step per segment re-loads the
    # cached multi-hundred-MB executables, ~59 s/segment); --epoch-fused
    # dispatches one scanned program per epoch instead of one per batch —
    # the sweep's cost model is 15.3x stage-A-bound and the hosted 12-duel
    # step is dispatch-bound (PERF.md "stage-A dispatch")
    gan_step = (
        make_gan_epoch_step(gan_cfg) if args.epoch_fused
        else make_gan_train_step(gan_cfg)
    )
    snapshots = {}
    state, history = None, []
    prev = 0
    for g in points:
        state, history = train_gan(
            gan_cfg, gan_train_loader, g - prev, state=state, history=history,
            start_epoch=prev, log_every_batch=False, step=gan_step,
            epoch_fused=args.epoch_fused,
        )
        prev = g
        snapshots[g] = snapshot_gens(state["params"])
        print(f"snapshotted generators at GAN epoch {g}")
    save_gan_loss_csv(history, os.path.join(args.output_dir, "GAN_loss.csv"))
    draw_gan_loss(history, os.path.join(args.output_dir, "GAN_loss.png"))

    # Stage B per snapshot.
    train_loader, valid_loader, test_loader = get_iemocap_loaders(
        args.data_path, batch_size=args.batch_size, valid=0.1, seed=args.seed
    )
    model = GAN_FFN(
        n_classes=6, dropout=args.dropout, gen_num_layers=args.num_layers, dtype=dtype
    )
    sample = batch_to_arrays(next(iter(train_loader)))
    from ..utils.aot import cached_init

    base_params = cached_init(
        model, jax.random.PRNGKey(args.seed),
        sample["audio"], sample["visual"], sample["text"], salt="init_gan_ffn",
    )
    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    optimizer = torch_adam(args.lr, weight_decay=args.l2)
    if args.epoch_fused:
        # stage-B fusion measured throughput-neutral (PERF.md "stage-B
        # dispatch"); fused here so one flag governs both stages
        from ..train.classifier import make_classifier_epoch_steps

        train_step, eval_step = make_classifier_epoch_steps(
            apply_train, apply_eval, optimizer, 6,
            jnp.asarray(IEMOCAP_LOSS_WEIGHTS), aot_cache=True,
        )
    else:
        train_step, eval_step = make_classifier_steps(
            apply_train, apply_eval, optimizer, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS),
            aot_cache=True,
        )

    history_dir = os.path.join(args.output_dir, "history")
    # Per-point state construction as ONE jitted program (fresh copy of the
    # base params + generator graft + optimizer-moment init): eager per-leaf
    # copies/zeros_like dispatch hundreds of ops at one tunnel RTT each.
    make_point_state = jax.jit(
        lambda base, gens: init_classifier_state(
            jax.tree.map(jnp.copy, graft_generator_params(base, gens)), optimizer
        )
    )
    results = {}
    for g in points:
        t0 = time.time()
        clf_state = make_point_state(base_params, snapshots[g])
        best = None
        rng = jax.random.PRNGKey(args.seed + 2)
        for e in range(args.epochs):
            rng, sub = jax.random.split(rng)
            if args.epoch_fused:
                from ..train.loop import run_epoch_fused

                clf_state, train_res = run_epoch_fused(
                    train_loader, clf_state, train_epoch_step=train_step, rng=sub
                )
                test_res = run_epoch_fused(
                    test_loader, clf_state["params"], eval_epoch_step=eval_step
                )
            else:
                clf_state, train_res = run_epoch(
                    train_loader, clf_state, train_step=train_step, rng=sub
                )
                test_res = run_epoch(test_loader, clf_state["params"], eval_step=eval_step)
            if best is None or best[0] > test_res.avg_loss:
                best = (test_res.avg_loss, test_res.labels, test_res.preds, test_res.masks)
        path = write_test_report(history_dir, g, best[0], best[1], best[2], best[3])
        from ..evaluation.metrics import f1_score

        f1 = round(
            f1_score(best[1], best[2], sample_weight=best[3], average="weighted") * 100, 2
        )
        results[g] = f1
        print(f"GAN-epochs={g}: F1={f1} ({time.time() - t0:.1f}s) -> {path}")

    best_g = max(results, key=results.get)
    print(f"best: GAN-epochs={best_g} F1={results[best_g]}")
    return results


if __name__ == "__main__":
    main()
