"""Multi-seed data-parallel sweep entry point (BASELINE.json config 5).

Trains N independent GAN_FFN classifier seeds simultaneously — one seed per
mesh device, every train step vmapped over the seed axis — from one shared
GAN checkpoint. On a v5e-8 this runs 8 seeds at the wall-clock cost of one.

The reference has no equivalent; its sweep (run.sh) re-runs the whole script
sequentially per configuration.

Run: ``python -m gan_ffn_tpu.cli.seed_sweep --seeds 0 1 2 3 --epochs 160``
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_iemocap_loaders, write_synthetic_iemocap
from ..evaluation.metrics import f1_score
from ..models import GAN_FFN
from ..parallel.sweep import init_seed_sweep, make_seed_mesh, make_sweep_train_step
from ..train.classifier import (
    graft_generator_params,
    init_classifier_state,
    make_classifier_steps,
)
from ..train.gan import GANConfig, init_gan_state
from ..train.loop import batch_to_arrays
from ..train.optim import torch_adam
from ..utils.checkpoint import load_gan_state, save_gan_state
from .common import IEMOCAP_LOSS_WEIGHTS, make_gan_ffn_apply_fns, train_gan


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Multi-seed GAN-FFN sweep over the device mesh")
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2, 3],
                   help="classifier init seeds; one mesh device per seed when available")
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--GAN-epochs", type=int, default=150)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--l2", type=float, default=0.008)
    p.add_argument("--dropout", type=float, default=0.6)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--data-path", default="data/iemocap/IEMOCAP_features.pkl")
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--model-save-path", default="./GAN_save/")
    p.add_argument("--use-trained-GAN", action="store_true", default=False)
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=3407, help="data/GAN seed")
    p.add_argument("--synthetic-train", type=int, default=120)
    p.add_argument("--synthetic-test", type=int, default=31)
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    print(args)
    from ..utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    devices = wait_for_device()

    if args.synthetic and not os.path.exists(args.data_path):
        write_synthetic_iemocap(
            args.data_path, n_train=args.synthetic_train, n_test=args.synthetic_test,
            seed=args.seed,
        )

    dtype = jnp.bfloat16 if args.bf16 else None
    gan_cfg = GANConfig(
        num_layers=args.num_layers, lr=0.0001, b1=0.5, b2=0.6, dtype=dtype,
        seed=args.seed,
    )
    if args.use_trained_GAN and os.path.exists(
        os.path.join(args.model_save_path, "acoustic_gen.msgpack")
    ):
        template = init_gan_state(gan_cfg, jax.random.PRNGKey(args.seed))
        gan_state = load_gan_state(args.model_save_path, template, reset_opt=True)
        print("loaded trained GAN from", args.model_save_path)
    else:
        gan_loader, _, _ = get_iemocap_loaders(
            args.data_path, batch_size=32, valid=0.1, seed=args.seed
        )
        gan_state, _ = train_gan(
            gan_cfg, gan_loader, args.GAN_epochs, log_every_batch=False
        )
        save_gan_state(args.model_save_path, gan_state)

    train_loader, valid_loader, test_loader = get_iemocap_loaders(
        args.data_path, batch_size=args.batch_size, valid=0.1, seed=args.seed
    )
    model = GAN_FFN(
        n_classes=6, dropout=args.dropout, gen_num_layers=args.num_layers, dtype=dtype
    )
    sample = batch_to_arrays(next(iter(train_loader)))
    apply_train, apply_eval = make_gan_ffn_apply_fns(model)
    optimizer = torch_adam(args.lr, weight_decay=args.l2)
    train_step, eval_step = make_classifier_steps(
        apply_train, apply_eval, optimizer, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
    )

    n_seeds = len(args.seeds)
    mesh = make_seed_mesh(devices[: max(1, min(n_seeds, len(devices)))])

    def init_fn(key):
        params = model.init(key, sample["audio"], sample["visual"], sample["text"])["params"]
        params = graft_generator_params(params, gan_state["params"])
        return init_classifier_state(params, optimizer)

    stacked = init_seed_sweep(init_fn, args.seeds, mesh)
    sweep_step = make_sweep_train_step(train_step, mesh)
    vmapped_eval = jax.jit(jax.vmap(eval_step, in_axes=(0, None)))

    best = [None] * n_seeds  # per-seed (loss, labels, preds, masks)
    rngs_base = [jax.random.PRNGKey(1000 + s) for s in args.seeds]
    for e in range(args.epochs):
        t0 = time.time()
        epoch_rngs = jnp.stack(
            [jax.random.fold_in(r, e) for r in rngs_base]
        )
        losses_accum = np.zeros(n_seeds)
        mask_accum = 0.0
        for batch in train_loader:
            arrays = batch_to_arrays(batch)
            stacked, losses, _ = sweep_step(stacked, epoch_rngs, arrays)
            msum = batch.umask.sum()
            losses_accum += np.asarray(losses) * msum
            mask_accum += msum
        # per-seed test evaluation
        all_preds, all_labels, all_masks, test_losses = [], [], [], np.zeros(n_seeds)
        tmask = 0.0
        for batch in test_loader:
            arrays = batch_to_arrays(batch)
            loss_v, preds_v = vmapped_eval(stacked["params"], arrays)
            msum = batch.umask.sum()
            test_losses += np.asarray(loss_v) * msum
            tmask += msum
            all_preds.append(np.asarray(preds_v))
            all_labels.append(batch.label.reshape(-1))
            all_masks.append(batch.umask.reshape(-1))
        preds = np.concatenate(all_preds, axis=1)  # (n_seeds, N)
        labels = np.concatenate(all_labels)
        masks = np.concatenate(all_masks)
        test_losses = test_losses / tmask
        for i in range(n_seeds):
            if best[i] is None or best[i][0] > test_losses[i]:
                best[i] = (test_losses[i], labels, preds[i], masks)
        f1s = [
            round(f1_score(labels, preds[i], sample_weight=masks, average="weighted") * 100, 2)
            for i in range(n_seeds)
        ]
        print(
            f"epoch {e + 1} train_loss/seed {np.round(losses_accum / mask_accum, 4).tolist()} "
            f"test_loss/seed {np.round(test_losses, 4).tolist()} test_f1/seed {f1s} "
            f"time {time.time() - t0:.2f}s"
        )

    results = {}
    for i, s in enumerate(args.seeds):
        loss_i, labels, preds_i, masks = best[i]
        results[s] = round(
            f1_score(labels, preds_i, sample_weight=masks, average="weighted") * 100, 2
        )
    print("best F1 per seed:", results)
    return results


if __name__ == "__main__":
    main()
