"""MELD entry point (reference train_MELD.py:107-197).

Plain ``MELDLSTMModel`` on text features only — the reference uses no GAN on
MELD. n_classes = 7 (emotion) or 3 (sentiment); unweighted masked NLL; best
snapshot by HIGHEST test F1 (train_MELD.py:175-177, unlike the IEMOCAP
entries' min-test-loss rule); valid split 0.0.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from ..data import get_meld_loaders, write_synthetic_meld
from ..evaluation.metrics import classification_report, confusion_matrix, f1_score
from ..models import MELDLSTMModel
from ..train.classifier import init_classifier_state, make_classifier_steps
from ..train.loop import batch_to_arrays, run_epoch
from ..train.optim import torch_adam
from .common import param_count


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MELD trainer (TPU-native)")
    p.add_argument("--no-cuda", action="store_true", default=False)
    p.add_argument("--lr", type=float, default=0.0003, metavar="LR")
    p.add_argument("--l2", type=float, default=0.0001, metavar="L2")
    p.add_argument("--dropout", type=float, default=0.6, metavar="dropout")
    p.add_argument("--batch-size", type=int, default=32, metavar="BS")
    p.add_argument("--epochs", type=int, default=50, metavar="E")
    p.add_argument("--attention", action="store_true", default=True)
    p.add_argument("--tensorboard", action="store_true", default=False)
    p.add_argument("--tb-grad-histograms", choices=("epoch", "batch"), default="epoch",
                   help="gradient-histogram cadence under --tensorboard: 'epoch' samples "
                        "one batch per epoch (a fresh-dropout-mask re-estimate at the "
                        "post-epoch params); 'batch' matches the reference's per-batch "
                        "logging (train_MELD.py:83-85) — the train step returns the "
                        "gradients it APPLIED (pre-update params, the step's own "
                        "dropout mask: the reference's param.grad exactly) at the "
                        "cost of a sync per batch")
    p.add_argument("--classify", default="emotion", help="emotion or sentiment")
    p.add_argument("--epoch-fused", action="store_true", default=False,
                   help="each epoch phase dispatches ONE scanned program per "
                        "same-shape batch group instead of one per batch "
                        "(measured throughput-neutral for classifier stages "
                        "— PERF.md stage-B dispatch). Per-batch PRNG keys "
                        "match the per-batch loop exactly")
    # framework additions
    p.add_argument("--data-path", default="data/meld/MELD_features_raw.pkl")
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--synthetic-train", type=int, default=80,
                   help="synthetic fixture train dialogues")
    p.add_argument("--synthetic-test", type=int, default=20)
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=3407)
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    print(args)
    from ..utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    if args.epoch_fused and args.tensorboard and args.tb_grad_histograms == "batch":
        build_parser().error(
            "--epoch-fused cannot honor --tb-grad-histograms batch: the "
            "per-batch grad hook is the dispatch pattern the fused epoch "
            "removes — use --tb-grad-histograms epoch, or drop --epoch-fused")
    print(f"Running on {wait_for_device()[0].platform}")

    if args.synthetic and not os.path.exists(args.data_path):
        write_synthetic_meld(
            args.data_path, n_train=args.synthetic_train,
            n_test=args.synthetic_test, seed=args.seed,
        )
        print(f"wrote synthetic features to {args.data_path}")

    n_classes = 7 if args.classify == "emotion" else 3
    D_m, D_e, D_h = 600, 300, 600  # train_MELD.py:143-145
    dtype = jnp.bfloat16 if args.bf16 else None

    model = MELDLSTMModel(
        D_m=D_m, D_e=D_e, D_h=D_h, n_classes=n_classes, dropout=args.dropout, dtype=dtype
    )
    train_loader, valid_loader, test_loader = get_meld_loaders(
        args.data_path, batch_size=args.batch_size, valid=0.0, classify=args.classify,
        seed=args.seed,
    )
    sample = batch_to_arrays(next(iter(train_loader)), with_visual=False)
    from ..utils.aot import cached_init

    params = cached_init(
        model, jax.random.PRNGKey(args.seed),
        sample["text"], sample["qmask"], sample["umask"], salt="init_meld",
    )
    print("Number of parameter: %.2fM" % (param_count(params) / 1e6))

    def apply_train(p, rng, batch):
        return model.apply(
            {"params": p}, batch["text"], batch["qmask"], batch["umask"],
            deterministic=False, rngs={"dropout": rng},
        )[0]

    def apply_eval(p, batch):
        # (log_prob, attn): MELDLSTMModel's per-timestep MatchingAttention
        # alpha (L, B, L); the reference accumulates it on eval epochs
        # (train_MELD.py:90-93)
        out = model.apply(
            {"params": p}, batch["text"], batch["qmask"], batch["umask"],
            deterministic=True,
        )
        return out[0], {"alpha": out[1]}

    optimizer = torch_adam(args.lr, weight_decay=args.l2)
    from ..utils.tensorboard import TBWriter

    writer = TBWriter("./tensorboard", enabled=args.tensorboard)
    # batch-cadence histograms consume the grads the step applied, so the
    # step must return them (train/classifier.py train_grads). Gate on
    # writer.enabled: a no-op TBWriter must not select the grads-returning
    # step (distinct AOT salt -> fresh compile) for histograms it drops.
    train_grads = writer.enabled and args.tb_grad_histograms == "batch"
    if args.epoch_fused:
        # one scanned program per same-shape batch group per phase
        # (measured throughput-neutral — PERF.md "stage-B dispatch")
        from ..train.classifier import make_classifier_epoch_steps

        train_step, eval_step = make_classifier_epoch_steps(
            apply_train, apply_eval, optimizer, n_classes, loss_weights=None,
            aot_cache=True, eval_attentions=True,
        )
    else:
        train_step, eval_step = make_classifier_steps(
            apply_train, apply_eval, optimizer, n_classes, loss_weights=None,
            aot_cache=True,
            eval_attentions=True,
            train_grads=train_grads,
        )
    state = init_classifier_state(params, optimizer)

    if writer.enabled and args.tb_grad_histograms == "epoch":
        from ..train.classifier import make_grad_fn

        grad_fn = make_grad_fn(apply_train, n_classes, None)

    best = None  # (fscore, loss, labels, preds, masks)
    rng = jax.random.PRNGKey(args.seed + 2)
    for e in range(args.epochs):
        start_time = time.time()
        rng, sub = jax.random.split(rng)
        on_batch = None
        if train_grads:
            # reference cadence: per-parameter grad histograms every batch
            # (train_MELD.py:83-85); the train step hands the hook the
            # gradients it just applied
            def on_batch(i, st, arrays, grads, _e=e):
                writer.add_param_histograms(grads, _e)

        if args.epoch_fused:
            from ..train.loop import run_epoch_fused

            state, train_res = run_epoch_fused(
                train_loader, state, train_epoch_step=train_step, rng=sub,
                with_visual=False,
            )
            valid_res = run_epoch_fused(
                valid_loader, state["params"], eval_epoch_step=eval_step,
                with_visual=False, eval_attentions=True,
            )
            test_res = run_epoch_fused(
                test_loader, state["params"], eval_epoch_step=eval_step,
                with_visual=False, eval_attentions=True,
            )
        else:
            state, train_res = run_epoch(
                train_loader, state, train_step=train_step, rng=sub, with_visual=False,
                on_batch=on_batch, train_grads=train_grads,
            )
            valid_res = run_epoch(
                valid_loader, state["params"], eval_step=eval_step, with_visual=False,
                eval_attentions=True,
            )
            test_res = run_epoch(
                test_loader, state["params"], eval_step=eval_step, with_visual=False,
                eval_attentions=True,
            )
        if writer.enabled:
            # reference scalar tags (train_MELD.py:179-181)
            writer.add_scalar("test: accuracy/loss", test_res.avg_accuracy / test_res.avg_loss, e)
            writer.add_scalar("train: accuracy/loss", train_res.avg_accuracy / train_res.avg_loss, e)
            if args.tb_grad_histograms == "epoch":
                # grad histograms (train_MELD.py:83-85), sampled per epoch
                rng, gsub = jax.random.split(rng)
                writer.add_param_histograms(grad_fn(state["params"], gsub, sample), e)
        if best is None or best[0] < test_res.avg_fscore:
            best = (
                test_res.avg_fscore, test_res.avg_loss,
                test_res.labels, test_res.preds, test_res.masks,
            )
            # best epoch's attention weights (reference best_attn, train_MELD.py:175-178)
            best_attn = test_res.attentions
            best_params = jax.tree.map(jnp.copy, state["params"])
        print(
            "epoch {} train_loss {} train_acc {} train_fscore {} valid_loss {} "
            "valid_acc {} val_fscore {} test_loss {} test_acc {} test_fscore {} time {}".format(
                e + 1,
                train_res.avg_loss, train_res.avg_accuracy, train_res.avg_fscore,
                valid_res.avg_loss, valid_res.avg_accuracy, valid_res.avg_fscore,
                test_res.avg_loss, test_res.avg_accuracy, test_res.avg_fscore,
                round(time.time() - start_time, 2),
            )
        )
        print(
            classification_report(
                test_res.labels, test_res.preds, sample_weight=test_res.masks, digits=4
            )
        )

    writer.close()
    # best-snapshot checkpoint (the reference keeps in-memory metrics only)
    from ..utils.checkpoint import save_params

    ckpt = os.path.join("./GAN_save/", "meld_classifier_best.msgpack")
    save_params(ckpt, best_params)
    print(f"saved best classifier to {ckpt}")
    best_fscore, best_loss, best_label, best_pred, best_mask = best
    print("Test performance..")
    print(
        "Loss {} F1-score {}".format(
            best_loss,
            round(
                f1_score(best_label, best_pred, sample_weight=best_mask, average="weighted")
                * 100, 2,
            ),
        )
    )
    print(classification_report(best_label, best_pred, sample_weight=best_mask, digits=4))
    print(confusion_matrix(best_label, best_pred, sample_weight=best_mask))
    return {"best_loss": best_loss, "f1": best_fscore, "attentions": best_attn}


if __name__ == "__main__":
    main()
