"""MELD full-pipeline quality A/B: the reference's OWN ``train_MELD.py``,
run UNMODIFIED on CPU, vs this framework's ``cli/train_meld``, on one shared
label-noised synthetic MELD fixture.

MELD is the one reference entry point whose CLI runs end-to-end on CPU
without modification: ``train_MELD.py --no-cuda`` works because every
``train_or_eval_model`` call there passes ``cuda`` correctly (train_MELD.py:
110,123-124), unlike the IEMOCAP trainers' stage-B positional-``cuda``
crashes (PARITY.md "Classifier stage"). So the torch side here is a plain
subprocess: ``python /root/reference/train_MELD.py --no-cuda`` executed from
a temp cwd where ``data/meld/MELD_features_raw.pkl`` is the shared fixture
(the reference hard-codes that relative path, train_MELD.py:159), with its
stdout's final "Test performance.. / Loss X F1-score Y" block parsed for the
best-by-max-test-F1 metrics (train_MELD.py:175-177,192-194).

The JAX side is ``gan_ffn_tpu.cli.train_meld.main`` — the real CLI — on the
same pickle with the same reference hyperparameters (D_m=600/D_e=300/D_h=600,
lr=3e-4, l2=1e-4, dropout=0.6, batch 32, 50 epochs, best-by-max-test-F1,
valid=0.0 so the valid metrics are the reference's NaN quirk).

The fixture carries ``label_noise`` (observed emotion labels flipped with
prob p) so the achievable F1 ceils well below 100 and both sides must LEARN
to the same ceiling; train_MELD.py has no seeding block (unlike the IEMOCAP
trainers' seed-3407 block), so its run is not deterministic and the
comparison is final quality within a band, not per-step numerics (those are
pinned for MELDLSTMModel by the weight-transplant tests in
tests/test_reference_parity.py).

Run (both sides are CPU-friendly; strip the TPU plugin for side work):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ab_meld_pipeline.py \
        --out /tmp/ab_meld.json
Results land in PARITY.md ("MELD full-pipeline quality A/B") and the band is
regression-guarded by tests/test_train.py::test_meld_pipeline_f1_band.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REFERENCE = "/root/reference"


def run_torch(fixture: str, epochs: int) -> dict:
    """Run the reference's train_MELD.py --no-cuda unmodified, parse stdout."""
    rundir = tempfile.mkdtemp(prefix="ab_meld_torch_")
    os.makedirs(os.path.join(rundir, "data", "meld"), exist_ok=True)
    os.symlink(fixture, os.path.join(rundir, "data", "meld", "MELD_features_raw.pkl"))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "train_MELD.py"),
         "--no-cuda", "--epochs", str(epochs)],
        cwd=rundir, capture_output=True, text=True, timeout=7000,
    )
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"reference train_MELD.py failed ({proc.returncode})")
    # final block: "Test performance..\nLoss <best_loss> F1-score <f1>"
    m = re.search(
        r"Test performance\.\.\s*\nLoss ([\d.]+) F1-score ([\d.]+)", proc.stdout
    )
    if not m:
        raise RuntimeError("could not parse 'Loss .. F1-score ..' from stdout")
    return {
        "best_loss": float(m.group(1)),
        "f1": float(m.group(2)),
        "total_s": round(wall, 1),
    }


def run_jax(fixture: str, epochs: int) -> dict:
    from gan_ffn_tpu.cli.train_meld import main

    cwd = os.getcwd()
    rundir = tempfile.mkdtemp(prefix="ab_meld_jax_")
    os.chdir(rundir)  # the CLI writes output/ into cwd
    try:
        t0 = time.time()
        res = main(["--data-path", fixture, "--epochs", str(epochs)])
        wall = time.time() - t0
    finally:
        os.chdir(cwd)
    return {
        "best_loss": float(res["best_loss"]),
        "f1": float(res["f1"]),
        "total_s": round(wall, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)  # train_MELD.py default
    p.add_argument("--n-train", type=int, default=120)
    p.add_argument("--n-test", type=int, default=40)
    p.add_argument("--min-len", type=int, default=3)
    p.add_argument("--max-len", type=int, default=24)
    p.add_argument("--class-spread", type=float, default=2.0)
    p.add_argument("--label-noise", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--skip-torch", action="store_true")
    p.add_argument("--skip-jax", action="store_true")
    p.add_argument("--fixture", default=None,
                   help="fixture pickle path, reused if it exists")
    p.add_argument("--out", default=None, help="write results JSON here")
    args = p.parse_args()

    from gan_ffn_tpu.data import write_synthetic_meld

    fixture = args.fixture or os.path.join(
        tempfile.mkdtemp(prefix="ab_meld_fix_"), "MELD_features_raw.pkl"
    )
    if not os.path.exists(fixture):
        write_synthetic_meld(
            fixture, n_train=args.n_train, n_test=args.n_test,
            min_len=args.min_len, max_len=args.max_len, seed=args.seed,
            class_spread=args.class_spread, label_noise=args.label_noise,
        )
    fixture = os.path.abspath(fixture)
    ceiling = round((1 - args.label_noise + args.label_noise / 7) * 100, 1)
    print(
        f"shared MELD fixture: {args.n_train}+{args.n_test} dialogues, "
        f"label_noise={args.label_noise} (accuracy ceiling ~{ceiling}%), "
        f"{args.epochs} epochs, best-by-max-test-F1"
    )

    results = {"config": vars(args), "accuracy_ceiling_pct": ceiling}
    if not args.skip_jax:
        results["jax"] = run_jax(fixture, args.epochs)
        print(f"\n[jax]   best_loss {results['jax']['best_loss']} "
              f"F1 {results['jax']['f1']} ({results['jax']['total_s']}s)")
    if not args.skip_torch:
        results["torch"] = run_torch(fixture, args.epochs)
        print(f"\n[torch] best_loss {results['torch']['best_loss']} "
              f"F1 {results['torch']['f1']} ({results['torch']['total_s']}s)")
    if "jax" in results and "torch" in results:
        delta = abs(results["jax"]["f1"] - results["torch"]["f1"])
        results["f1_delta"] = round(delta, 2)
        print(f"\nfinal weighted F1 (best-by-max-test-F1): "
              f"torch {results['torch']['f1']} vs jax {results['jax']['f1']} "
              f"(|delta| {delta:.2f})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
