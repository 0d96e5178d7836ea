"""FULL-pipeline quality A/B: the reference's own torch pipeline vs this
framework, end to end, on one shared non-trivially-separable fixture.

This closes the last parity gap (VERDICT r2 item 1): earlier evidence pinned
per-step gradients (tests/test_reference_parity.py), the stage-A trajectory
fingerprint (scripts/ab_gan_fingerprint.py) and the DialogueRNN trajectory
(scripts/ab_dialoguernn_torch_vs_jax.py) — but never the COMPLETE flagship
run: stage A (adversarial pre-train) -> generator graft -> stage B (GAN_FFN
classifier, best-by-min-test-loss) -> final weighted F1.

Torch side — the reference's OWN code, imported from /root/reference:
- stage A: ``train_GAN`` executed unmodified (train_IEMOCAP.py:255-393);
- stage B: the reference main's classifier loop (train_IEMOCAP.py:628-735)
  reproduced by driving ``GAN_FFN`` + ``MaskedNLLLoss`` + ``Adam`` +
  ``train_or_eval_model`` directly with ``cuda=False`` — the reference CLI
  itself crashes on CPU because it passes ``cuda`` positionally into the
  loss-weight position (train_IEMOCAP.py:679-691, PARITY.md).

JAX side — ``gan_ffn_tpu.cli.train_iemocap.main`` (the real CLI), run in its
native configuration (TPU when available; ``--jax-gan-schedule stepwise`` for
CPU-only hosts skips the one-program stage-A compile).

The fixture carries ``label_noise`` (observed labels flipped with prob p) so
the achievable F1 tops out well below 100 (~(1-p)*100): both sides must LEARN
to the same ceiling, and a dynamics bug on either side shows up as a final-F1
gap. RNG streams/batch composition necessarily differ between frameworks, so
the comparison is final quality within a band, not per-step numerics (those
are pinned by the transplant tests). Sizing note: at lr=1e-4 the flagship
needs hundreds of optimizer steps to converge, so the defaults keep the
reference split sizes (120/31 dialogues -> 4 train batches/epoch) and the
full 150 classifier epochs; a 24-dialogue fixture at 40 epochs never leaves
the chance plateau (measured: F1 4.5 after 40 epochs vs 76.6 converged).

Run in two phases sharing one fixture (JAX on TPU, torch on host CPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_full_pipeline.py \
        --skip-torch --fixture /tmp/ab_fix.pkl --out /tmp/ab_jax.json
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ab_full_pipeline.py \
        --skip-jax --fixture /tmp/ab_fix.pkl --out /tmp/ab_torch.json
Results land in PARITY.md ("Full-pipeline quality A/B") and the committed
band is regression-guarded by tests/test_train.py::
test_full_pipeline_f1_band (slow mark).
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


def load_ref_trainer():
    sys.path.insert(0, REFERENCE)  # so `import dataloader` inside it resolves
    spec = importlib.util.spec_from_file_location(
        "ref_train_iemocap", os.path.join(REFERENCE, "train_IEMOCAP.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # train_or_eval_model reads the module-global `args` (train_IEMOCAP.py:166)
    mod.args = types.SimpleNamespace(tensorboard=False)
    return mod


def run_torch(fixture: str, gan_epochs: int, epochs: int) -> dict:
    ref = load_ref_trainer()
    import torch

    torch.manual_seed(3407)  # reference seeding block (train_IEMOCAP.py:46-53)

    # ---- stage A: the reference's own train_GAN, unmodified ----
    D_h, dropout = 100, 0.2  # train_IEMOCAP.py:520-523, 580-585
    acoustic_gen = ref.AcousticGenerator(D_h, dropout)
    visual_gen = ref.VisualGenerator(D_h, dropout)
    text_gen = ref.TextGenerator(D_h, dropout)
    acoustic_disc = ref.AcousticDiscriminator(D_h, dropout)
    visual_disc = ref.VisualDiscriminator(D_h, dropout)
    text_disc = ref.TextDiscriminator(D_h, dropout)
    t0 = time.time()
    ref.train_GAN(
        acoustic_gen, visual_gen, text_gen,
        acoustic_disc, visual_disc, text_disc,
        epochs=gan_epochs, batch_size=32, lr=0.0001, b1=0.5, b2=0.6,
        dataset_path=fixture,
    )
    t_stage_a = time.time() - t0
    print(f"[torch stage A] {t_stage_a:.0f}s for {gan_epochs} epochs")

    # ---- stage B: reference main's classifier loop (628-735), cuda=False ----
    model = ref.GAN_FFN(acoustic_gen, visual_gen, text_gen, n_classes=6, dropout=0.6)
    loss_weights = torch.FloatTensor(
        [1.2, 0.60072, 0.38066, 0.94019, 0.67924, 0.34332]  # train_IEMOCAP.py:653
    )
    loss_function = ref.MaskedNLLLoss(loss_weights)
    optimizer = torch.optim.Adam(model.parameters(), lr=0.0001, weight_decay=0.008)
    train_loader, valid_loader, test_loader = ref.get_IEMOCAP_loaders(
        fixture, batch_size=32, valid=0.1
    )

    best = None  # (loss, label, pred, mask, f1) — min-test-loss snapshot (693-700)
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
    gan_schedule: str = "fused",
) -> dict:
    from gan_ffn_tpu.cli.train_iemocap import main

    cwd = os.getcwd()
    rundir = tempfile.mkdtemp(prefix="ab_full_jax_")
    os.chdir(rundir)  # the CLI writes output/ and GAN_save/ into cwd
    try:
        t0 = time.time()
        res = main([
            "--data-path", fixture,
            "--epochs", str(epochs),
            "--GAN-epochs", str(gan_epochs),
            "--continue-train-GAN-step", "0",
            "--num-layers", str(num_layers),
            "--batch-size", "32",
            "--gan-schedule", gan_schedule,
        ])
        res["total_s"] = round(time.time() - t0, 1)
    finally:
        os.chdir(cwd)
    return {"best_loss": res["best_loss"], "f1": res["f1"], "total_s": res["total_s"]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gan-epochs", type=int, default=10)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--n-train", type=int, default=120)
    p.add_argument("--n-test", type=int, default=31)
    p.add_argument("--min-len", type=int, default=6)
    p.add_argument("--max-len", type=int, default=24)
    p.add_argument("--class-spread", type=float, default=2.0)
    p.add_argument("--label-noise", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=3407)
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
        tempfile.mkdtemp(prefix="ab_full_fix_"), "IEMOCAP_features.pkl"
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
            fixture, args.gan_epochs, args.epochs,
            gan_schedule=args.jax_gan_schedule,
        )
        print(f"\n[jax]   best_loss {results['jax']['best_loss']} "
              f"F1 {results['jax']['f1']} ({results['jax']['total_s']}s)")
    if not args.skip_torch:
        results["torch"] = run_torch(fixture, args.gan_epochs, args.epochs)
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
