"""DialogueRNN-entry FULL-pipeline quality A/B: the reference's own torch
pipeline vs this framework, end to end, on one shared non-trivially-separable
fixture.

This closes the last entry-point-level parity gap that is closeable without
real data (VERDICT r3 item 2): the flagship got this treatment in round 3
(scripts/ab_full_pipeline.py, final F1 identical); the DialogueRNN entry's
evidence was piecewise — stage-A fingerprint, BiModel-head trajectory A/B
(scripts/ab_dialoguernn_torch_vs_jax.py, explicitly "stage B minus the
generators"), per-step gradient parity — but never stage A -> graft ->
``GAN_FFN_DialogueRNN`` -> final weighted F1 on both sides.

Torch side — the reference's OWN code, imported from /root/reference:
- stage A: ``train_GAN`` executed unmodified
  (train_IEMOCAP_DialogueRNN.py:257-393);
- stage B: the reference main's classifier loop
  (train_IEMOCAP_DialogueRNN.py:704-800) reproduced by driving
  ``GAN_FFN_DialogueRNN`` (model.py:1465-1528) + ``MaskedNLLLoss`` + ``Adam``
  + ``train_or_eval_model`` (train_IEMOCAP_DialogueRNN.py:104-197) directly
  with ``cuda=False`` — the reference CLI itself crashes on CPU because its
  eval calls pass ``cuda`` positionally into the ``optimizer`` slot
  (train_IEMOCAP_DialogueRNN.py:763-776: ``train_or_eval_model(model,
  loss_function, valid_loader, e, cuda)``), leaving the ``cuda`` parameter at
  its True default, so eval batches call ``.cuda()`` on a CPU-only host.

JAX side — ``gan_ffn_tpu.cli.train_iemocap_dialoguernn.main`` (the real CLI),
run in its native configuration (TPU when available; ``--jax-gan-schedule
stepwise`` for CPU-only hosts skips the one-program stage-A compile).

Reference hyperparameters throughout (train_IEMOCAP_DialogueRNN.py:555-604,
635-641): D_m=100, D_g=500, D_p=500, D_e=100, D_h=100, D_a=100,
context_attention='general', listener_state=False, rec_dropout=0.1,
dropout=0.6, MaskedNLLLoss with the IEMOCAP class weights, Adam lr=1e-4
weight_decay=1e-5, batch 30, best-by-min-test-loss.

The fixture carries ``label_noise`` (observed labels flipped with prob p) so
the achievable F1 tops out well below 100: both sides must LEARN to the same
ceiling, and a dynamics bug on either side shows up as a final-F1 gap. RNG
streams/batch composition necessarily differ between frameworks, so the
comparison is final quality within a band, not per-step numerics (those are
pinned by tests/test_reference_parity.py::test_gan_ffn_dialoguernn_* and the
BiModel gradient-parity test).

Run in two phases sharing one fixture (JAX on TPU, torch on host CPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_dialoguernn_pipeline.py \
        --skip-torch --fixture /tmp/ab_drnn_fix.pkl --out /tmp/ab_drnn_jax.json
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ab_dialoguernn_pipeline.py \
        --skip-jax --fixture /tmp/ab_drnn_fix.pkl --out /tmp/ab_drnn_torch.json
Results land in PARITY.md ("DialogueRNN full-pipeline quality A/B") and the
committed band is regression-guarded by tests/test_train.py::
test_dialoguernn_pipeline_f1_band (slow mark).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time
import types

REFERENCE = "/root/reference"

# DialogueRNN dims (train_IEMOCAP_DialogueRNN.py:635-641)
DIMS = dict(D_m=100, D_g=500, D_p=500, D_e=100, D_h=100, D_a=100)


def load_ref_trainer():
    sys.path.insert(0, REFERENCE)  # so `import dataloader` inside it resolves
    spec = importlib.util.spec_from_file_location(
        "ref_train_iemocap_dialoguernn",
        os.path.join(REFERENCE, "train_IEMOCAP_DialogueRNN.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # train_or_eval_model reads the module-global `args`
    # (train_IEMOCAP_DialogueRNN.py:167)
    mod.args = types.SimpleNamespace(tensorboard=False)
    return mod


def run_torch(
    fixture: str, gan_epochs: int, epochs: int, lr: float = 1e-4,
    train_seed: int = 3407,
) -> dict:
    ref = load_ref_trainer()
    import torch

    torch.manual_seed(train_seed)  # reference seeding block (:47-54)

    # ---- stage A: the reference's own train_GAN, unmodified ----
    D_h, gan_dropout = 100, 0.2  # train_IEMOCAP_DialogueRNN.py:655-661
    acoustic_gen = ref.AcousticGenerator(D_h, gan_dropout)
    visual_gen = ref.VisualGenerator(D_h, gan_dropout)
    text_gen = ref.TextGenerator(D_h, gan_dropout)
    acoustic_disc = ref.AcousticDiscriminator(D_h, gan_dropout)
    visual_disc = ref.VisualDiscriminator(D_h, gan_dropout)
    text_disc = ref.TextDiscriminator(D_h, gan_dropout)
    t0 = time.time()
    ref.train_GAN(
        acoustic_gen, visual_gen, text_gen,
        acoustic_disc, visual_disc, text_disc,
        epochs=gan_epochs, batch_size=32, lr=0.0001, b1=0.5, b2=0.6,
        dataset_path=fixture,
    )
    t_stage_a = time.time() - t0
    print(f"[torch stage A] {t_stage_a:.0f}s for {gan_epochs} epochs")

    # ---- stage B: reference main's classifier loop (:704-800), cuda=False ----
    model = ref.GAN_FFN_DialogueRNN(
        acoustic_gen, visual_gen, text_gen,
        DIMS["D_m"], DIMS["D_g"], DIMS["D_p"], DIMS["D_e"], DIMS["D_h"],
        DIMS["D_a"], n_classes=6,
        listener_state=False, context_attention="general",
        dropout_rec=0.1, dropout=0.6,
    )
    loss_weights = torch.FloatTensor(
        [1.2, 0.60072, 0.38066, 0.94019, 0.67924, 0.34332]  # :738
    )
    loss_function = ref.MaskedNLLLoss(loss_weights)
    optimizer = torch.optim.Adam(model.parameters(), lr=lr, weight_decay=1e-5)
    train_loader, valid_loader, test_loader = ref.get_IEMOCAP_loaders(
        fixture, batch_size=30, valid=0.1
    )

    best = None  # (loss, label, pred, mask, f1) — min-test-loss snapshot (:778-784)
    t0 = time.time()
    for e in range(epochs):
        ref.train_or_eval_model(
            model, loss_function, train_loader, e, optimizer, train=True, cuda=False
        )
        ref.train_or_eval_model(model, loss_function, valid_loader, e, cuda=False)
        test_loss, test_acc, test_label, test_pred, test_mask, test_fscore, _ = (
            ref.train_or_eval_model(model, loss_function, test_loader, e, cuda=False)
        )
        if best is None or best[0] > test_loss:
            best = (test_loss, test_label, test_pred, test_mask, test_fscore)
        print(
            f"[torch stage B] epoch {e + 1} test_loss {test_loss} "
            f"test_acc {test_acc} test_fscore {test_fscore}"
        )
    t_stage_b = time.time() - t0
    print(f"[torch stage B] {t_stage_b:.0f}s for {epochs} epochs")
    return {
        "best_loss": float(best[0]),
        "f1": float(best[4]),
        "stage_a_s": round(t_stage_a, 1),
        "stage_b_s": round(t_stage_b, 1),
    }


def run_jax(
    fixture: str, gan_epochs: int, epochs: int, num_layers: int = 8,
    gan_schedule: str = "fused", lr: float = 1e-4, train_seed: int = 3407,
) -> dict:
    from gan_ffn_tpu.cli.train_iemocap_dialoguernn import main

    cwd = os.getcwd()
    rundir = tempfile.mkdtemp(prefix="ab_drnn_jax_")
    os.chdir(rundir)  # the CLI writes output/ and GAN_save/ into cwd
    try:
        t0 = time.time()
        res = main([
            "--data-path", fixture,
            "--epochs", str(epochs),
            "--GAN-epochs", str(gan_epochs),
            "--fresh-GAN",
            "--num-layers", str(num_layers),
            "--batch-size", "30",
            "--gan-schedule", gan_schedule,
            "--lr", str(lr),
            "--seed", str(train_seed),
        ])
        res["total_s"] = round(time.time() - t0, 1)
    finally:
        os.chdir(cwd)
    return {"best_loss": res["best_loss"], "f1": res["f1"], "total_s": res["total_s"]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gan-epochs", type=int, default=10)
    p.add_argument("--epochs", type=int, default=100)  # reference default (:583)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="stage-B Adam lr, BOTH sides (reference default 1e-4; "
                        "the converged-endpoint experiment raises it to 3e-4 "
                        "so both sides reach the label-noise ceiling within "
                        "the epoch budget — the reference-default dynamics "
                        "are pinned by the matched-epoch lockstep experiment)")
    p.add_argument("--n-train", type=int, default=120)
    p.add_argument("--n-test", type=int, default=31)
    p.add_argument("--min-len", type=int, default=6)
    p.add_argument("--max-len", type=int, default=24)
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--class-spread", type=float, default=2.0)
    p.add_argument("--label-noise", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--train-seed", type=int, default=3407,
                   help="training-RNG seed on BOTH sides (the reference's "
                        "seeding block / the jax CLI --seed), decoupled from "
                        "the fixture seed: at mid-convergence budgets the "
                        "endpoint comparison needs a cross-seed spread to "
                        "size the cross-implementation gap against")
    p.add_argument("--skip-torch", action="store_true")
    p.add_argument("--skip-jax", action="store_true")
    p.add_argument("--jax-gan-schedule", choices=("fused", "stepwise"), default="fused")
    p.add_argument("--fixture", default=None,
                   help="fixture pickle path, reused if it exists (lets the "
                        "torch and jax phases run in separate processes on "
                        "the SAME data)")
    p.add_argument("--out", default=None, help="write results JSON here")
    args = p.parse_args()

    from gan_ffn_tpu.data import write_synthetic_iemocap

    fixture = args.fixture or os.path.join(
        tempfile.mkdtemp(prefix="ab_drnn_fix_"), "IEMOCAP_features.pkl"
    )
    fixture = os.path.abspath(fixture)  # run_jax chdirs into a temp run dir
    if not os.path.exists(fixture):
        write_synthetic_iemocap(
            fixture, n_train=args.n_train, n_test=args.n_test,
            min_len=args.min_len, max_len=args.max_len, seed=args.seed,
            class_spread=args.class_spread, label_noise=args.label_noise,
        )
    ceiling = round((1 - args.label_noise + args.label_noise / 6) * 100, 1)
    print(
        f"shared fixture: {args.n_train}+{args.n_test} dialogues, "
        f"label_noise={args.label_noise} (accuracy ceiling ~{ceiling}%), "
        f"stage A {args.gan_epochs} epochs, stage B {args.epochs} epochs"
    )

    results = {"config": vars(args), "accuracy_ceiling_pct": ceiling}
    if not args.skip_jax:
        results["jax"] = run_jax(
            fixture, args.gan_epochs, args.epochs, num_layers=args.num_layers,
            gan_schedule=args.jax_gan_schedule, lr=args.lr,
            train_seed=args.train_seed,
        )
        print(f"\n[jax]   best_loss {results['jax']['best_loss']} "
              f"F1 {results['jax']['f1']} ({results['jax']['total_s']}s)")
    if not args.skip_torch:
        results["torch"] = run_torch(
            fixture, args.gan_epochs, args.epochs, lr=args.lr,
            train_seed=args.train_seed,
        )
        print(f"\n[torch] best_loss {results['torch']['best_loss']} "
              f"F1 {results['torch']['f1']}")
    if "jax" in results and "torch" in results:
        delta = abs(results["jax"]["f1"] - results["torch"]["f1"])
        results["f1_delta"] = round(delta, 2)
        print(f"\nfinal weighted F1: torch {results['torch']['f1']} "
              f"vs jax {results['jax']['f1']} (|delta| {delta:.2f})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
