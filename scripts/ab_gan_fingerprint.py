"""Deep GAN-fingerprint head-to-head: the reference's OWN ``train_GAN``
(/root/reference/train_IEMOCAP.py:255-393, imported and executed unmodified
on CPU) vs this framework's stage A, on the SAME synthetic fixture, for tens
of epochs.

The reference's committed 150-epoch ``output/GAN_loss.csv`` has a distinctive
fingerprint: three duels collapse to ln 2 ~ 0.693 (visual_G, text_G,
acoustic_D — chance-level discrimination) while the others separate
(acoustic_G -> ~0.01, visual_D/text_D -> ~0.15). This script checks that the
same qualitative pattern emerges from both implementations on a shared
fixture — initialization RNGs and data order necessarily differ, so the
comparison is the per-duel trajectory SHAPE and the final collapse set, not
per-step values (per-step numerics are pinned separately by the
gradient-parity transplant tests).

Run (CPU, ~20-40 min for 40 epochs):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ab_gan_fingerprint.py --epochs 40
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import tempfile
import time

REFERENCE = "/root/reference"
LN2 = 0.6931471805599453
KEYS = (
    "acoustic_G_loss", "visual_G_loss", "text_G_loss",
    "visual_D_loss", "text_D_loss", "acoustic_D_loss",
)


def load_ref_trainer():
    sys.path.insert(0, REFERENCE)  # so `import dataloader` inside it resolves
    spec = importlib.util.spec_from_file_location(
        "ref_train_iemocap", os.path.join(REFERENCE, "train_IEMOCAP.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run_reference(fixture, epochs):
    ref = load_ref_trainer()
    import torch

    torch.manual_seed(3407)
    # reference main's constructions (train_IEMOCAP.py:520-523, 580-585)
    D_h, dropout = 100, 0.2
    nets = dict(
        acoustic_gen=ref.AcousticGenerator(D_h, dropout),
        visual_gen=ref.VisualGenerator(D_h, dropout),
        text_gen=ref.TextGenerator(D_h, dropout),
        acoustic_disc=ref.AcousticDiscriminator(D_h, dropout),
        visual_disc=ref.VisualDiscriminator(D_h, dropout),
        text_disc=ref.TextDiscriminator(D_h, dropout),
    )
    t0 = time.time()
    loss_df = ref.train_GAN(
        nets["acoustic_gen"], nets["visual_gen"], nets["text_gen"],
        nets["acoustic_disc"], nets["visual_disc"], nets["text_disc"],
        epochs=epochs, batch_size=32, lr=0.0001, b1=0.5, b2=0.6,
        dataset_path=fixture,
    )
    print(f"[reference stage A] {time.time() - t0:.0f}s for {epochs} epochs")
    return [
        {k: float(row[k]) for k in KEYS} for _, row in loss_df.iterrows()
    ]


def run_ours(fixture, epochs):
    from gan_ffn_tpu.cli.common import train_gan
    from gan_ffn_tpu.data import get_iemocap_loaders
    from gan_ffn_tpu.train.gan import GANConfig

    # stepwise schedule: same math as the fused program (losses/updates
    # threaded identically), 12 small compiles instead of one huge CPU compile
    cfg = GANConfig(
        num_layers=8, lr=0.0001, b1=0.5, b2=0.6,
        fused_schedule=False, aot_cache=False,
    )
    train_loader, _, _ = get_iemocap_loaders(fixture, batch_size=32, valid=0.1)
    t0 = time.time()
    _, history = train_gan(cfg, train_loader, epochs, log_every_batch=False)
    print(f"[our stage A] {time.time() - t0:.0f}s for {epochs} epochs")
    return [{k: float(row[k]) for k in KEYS} for row in history]


def collapse_set(row, tol=0.04):
    return {k for k in KEYS if abs(row[k] - LN2) < tol}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--n-train", type=int, default=24)
    p.add_argument("--max-len", type=int, default=24)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--skip-reference", action="store_true")
    args = p.parse_args()

    from gan_ffn_tpu.data import write_synthetic_iemocap

    tmp = tempfile.mkdtemp()
    fixture = os.path.join(tmp, "IEMOCAP_features.pkl")
    write_synthetic_iemocap(
        fixture, n_train=args.n_train, n_test=8, min_len=6, max_len=args.max_len,
        seed=args.seed,
    )
    print(f"shared fixture: {args.n_train} train dialogues, epochs={args.epochs}")

    ours = run_ours(fixture, args.epochs)
    ref_rows = None if args.skip_reference else run_reference(fixture, args.epochs)

    marks = sorted({0, 4, 9, 19, 29, args.epochs - 1} & set(range(args.epochs)))
    for k in KEYS:
        print(f"\n{k}:")
        hdr = "  epoch " + " ".join(f"{e + 1:>8}" for e in marks)
        print(hdr)
        print("  ours  " + " ".join(f"{ours[e][k]:>8.4f}" for e in marks))
        if ref_rows:
            print("  ref   " + " ".join(f"{ref_rows[e][k]:>8.4f}" for e in marks))

    print(f"\ncollapse set (|loss - ln2| < 0.04) at epoch {args.epochs}:")
    print(f"  ours: {sorted(collapse_set(ours[-1]))}")
    if ref_rows:
        print(f"  ref : {sorted(collapse_set(ref_rows[-1]))}")


if __name__ == "__main__":
    main()
