"""IEMOCAP GAN-FFN entry point (reference train_IEMOCAP.py:441-760).

Pipeline: adversarial GAN pre-training (or checkpoint load + optional
continued training) -> GAN_FFN classifier with grafted generators -> per-epoch
train/valid/test evaluation -> best-by-min-test-loss snapshot -> sweep report
file.

Flags mirror the reference's argparse surface; additions: ``--data-path``,
``--synthetic`` (generate a fixture pickle when the real features are
absent), ``--num-layers`` (encoder depth; 8 = reference), ``--bf16`` (bf16
compute on TPU), ``--seed``.

Run: ``python -m gan_ffn_tpu.cli.train_iemocap --epochs 2 --GAN-epochs 2 --synthetic``
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import get_iemocap_loaders, write_synthetic_iemocap
from ..evaluation.reports import format_test_report, write_test_report
from ..models import GAN_FFN
from ..train.classifier import (
    graft_generator_params,
    init_classifier_state,
    make_classifier_steps,
)
from ..train.gan import GANConfig, init_gan_state
from ..train.loop import run_epoch
from ..train.optim import torch_adam
from ..utils.artifacts import draw_gan_loss, load_gan_loss_csv, save_gan_loss_csv
from ..utils.checkpoint import load_gan_state, save_gan_state
from .common import (
    IEMOCAP_LOSS_WEIGHTS,
    make_gan_ffn_apply_fns,
    param_count,
    train_gan,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="IEMOCAP GAN-FFN trainer (TPU-native)")
    p.add_argument("--no-cuda", action="store_true", default=False,
                   help="compat flag (device selection is automatic in JAX)")
    p.add_argument("--lr", type=float, default=0.0001, metavar="LR", help="learning rate")
    p.add_argument("--l2", type=float, default=0.008, metavar="L2", help="L2 regularization weight")
    p.add_argument("--dropout", type=float, default=0.6, metavar="dropout", help="dropout rate")
    p.add_argument("--batch-size", type=int, default=32, metavar="BS", help="batch size")
    p.add_argument("--epochs", type=int, default=160, metavar="E", help="number of epochs")
    p.add_argument("--GAN-epochs", type=int, default=150, metavar="E", help="number of GAN epochs")
    p.add_argument("--class-weight", action="store_true", default=True, help="use class weight")
    p.add_argument("--attention", action="store_true", default=False,
                   help="use attention on top of lstm (compat; unused by GAN_FFN)")
    p.add_argument("--tensorboard", action="store_true", default=False, help="enables tensorboard log")
    p.add_argument("--tb-grad-histograms", choices=("epoch", "batch"), default="epoch",
                   help="gradient-histogram cadence under --tensorboard: 'epoch' samples "
                        "one batch per epoch (async-friendly; a fresh-dropout-mask "
                        "re-estimate at the post-epoch params); 'batch' logs every "
                        "parameter every batch like the reference "
                        "(train_IEMOCAP.py:166-168) — the train step returns the "
                        "gradients it APPLIED (pre-update params, the step's own "
                        "dropout mask: the reference's param.grad exactly) at the "
                        "cost of a device sync per batch")
    p.add_argument("--use-trained-GAN", action="store_true", default=False, help="use trained GAN")
    p.add_argument("--continue-train-GAN-step", type=int, default=5, metavar="E",
                   help="continue training from saved GAN models")
    # framework additions
    p.add_argument("--data-path", default="data/iemocap/IEMOCAP_features.pkl")
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="generate a synthetic feature pickle if data-path is missing")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--model-save-path", default="./GAN_save/")
    p.add_argument("--num-layers", type=int, default=8, help="transformer encoder depth")
    p.add_argument("--scan-layers", action="store_true", default=False,
                   help="run each encoder depth as ONE nn.scan over stacked "
                        "layer params: same deterministic math, minutes "
                        "instead of tens of minutes of first-process compile "
                        "(PERF.md scan-over-layers). Changes the GAN "
                        "checkpoint layout (nn/transformer.py converters "
                        "bridge) and per-layer dropout key derivation.")
    p.add_argument("--gan-schedule", choices=("fused", "stepwise"), default="fused",
                   help="stage-A compilation strategy: 'fused' compiles the whole "
                        "12-duel schedule into one program (fast steps, long first "
                        "compile); 'stepwise' jits the 12 duels separately (fast "
                        "compiles — the right choice for CPU-hosted runs)")
    p.add_argument("--epoch-fused", action="store_true", default=False,
                   help="BOTH stages dispatch ONE scanned program per same-shape "
                        "batch group per epoch instead of one per batch — the "
                        "hosted stage-A step is dispatch-bound, 4.4x fused; "
                        "the stage-B leg is measured neutral (PERF.md stage-"
                        "A/stage-B dispatch). Per-batch PRNG keys match the "
                        "per-batch loop exactly; when an epoch spans several "
                        "bucket shapes, updates reorder across groups")
    p.add_argument("--dp", action="store_true", default=False,
                   help="shard the stage-A GAN batch over all local devices (mesh "
                        "data parallelism; the TPU-native form of the reference's "
                        "nn.DataParallel over the six GAN nets, train_IEMOCAP.py:588-593)")
    p.add_argument("--lr-schedule", choices=("reference", "decay"), default="reference",
                   help="reference: constant lr (replicates the per-batch LambdaLR "
                        "re-creation quirk, train_IEMOCAP.py:129-133,170); decay: the "
                        "0.98^epoch decay that scheduler was meant to apply")
    p.add_argument("--bf16", action="store_true", default=False, help="bfloat16 compute")
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--strict-parity", action="store_true", default=False,
                   help="replicate the reference's NaN on constant-feature normalization")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="write a jax.profiler trace of one train epoch to LOGDIR")
    p.add_argument("--synthetic-train", type=int, default=120,
                   help="synthetic fixture train dialogues")
    p.add_argument("--synthetic-test", type=int, default=31)
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    print(args)
    from ..utils.runtime import configure_tpu_runtime, wait_for_device

    configure_tpu_runtime()
    from ..ops.config import resolve_scan_layers

    # one resolution point for --scan-layers + the GANFFN_SCAN_LAYERS env
    # default: pins the process-global (stage B traces the same param layout
    # stage A built) and flows into GANConfig (stage A pins it lexically)
    args.scan_layers = resolve_scan_layers(args.scan_layers)
    if args.epoch_fused and args.gan_schedule == "stepwise":
        build_parser().error(
            "--epoch-fused scans the FUSED 12-duel program (an even larger "
            "build than --gan-schedule fused); it cannot honor stepwise's "
            "fast-compile promise — drop one of the two flags")
    if args.epoch_fused and args.dp:
        build_parser().error(
            "--epoch-fused is not wired for --dp (the stacked epoch is not "
            "mesh-sharded); use per-batch --dp, or --epoch-fused single-chip")
    if args.epoch_fused and args.tensorboard and args.tb_grad_histograms == "batch":
        build_parser().error(
            "--epoch-fused cannot honor --tb-grad-histograms batch: the "
            "per-batch grad hook is the dispatch pattern the fused epoch "
            "removes — use --tb-grad-histograms epoch, or drop --epoch-fused")
    print(f"Running on {wait_for_device()[0].platform}")

    if args.synthetic and not os.path.exists(args.data_path):
        write_synthetic_iemocap(
            args.data_path, n_train=args.synthetic_train, n_test=args.synthetic_test,
            seed=args.seed,
        )
        print(f"wrote synthetic features to {args.data_path}")

    dtype = jnp.bfloat16 if args.bf16 else None
    n_classes = 6
    gan_cfg = GANConfig(
        num_layers=args.num_layers, lr=0.0001, b1=0.5, b2=0.6, dtype=dtype,
        seed=args.seed, fused_schedule=(args.gan_schedule == "fused"),
        scan_layers=args.scan_layers,
    )

    # Stage A loaders (reference train_GAN builds its own with valid=0.1,
    # train_IEMOCAP.py:303-309)
    gan_train_loader, _, _ = get_iemocap_loaders(
        args.data_path, batch_size=32, valid=0.1, seed=args.seed,
        strict_parity=args.strict_parity,
    )

    loss_csv = os.path.join(args.output_dir, "GAN_loss.csv")
    loss_png = os.path.join(args.output_dir, "GAN_loss.png")

    gan_mesh = None
    if args.dp:
        from ..parallel import make_mesh

        if jax.device_count() > 1:
            gan_mesh = make_mesh()
            print(f"stage A data parallelism over {jax.device_count()} devices")
        else:
            print("--dp requested but only one device present; running single-chip")

    if args.use_trained_GAN:
        template = init_gan_state(gan_cfg, jax.random.PRNGKey(args.seed))
        gan_state = load_gan_state(args.model_save_path, template, reset_opt=True)
        print("=" * 15, args.model_save_path + " loaded trained GAN", "=" * 15)
        history = load_gan_loss_csv(loss_csv) if os.path.exists(loss_csv) else []
        if args.continue_train_GAN_step > 0:
            print("=" * 15, "continue train GAN", "=" * 15)
            start = (history[-1]["epoch"] + 1) if history else 0
            gan_state, history = train_gan(
                gan_cfg, gan_train_loader, args.continue_train_GAN_step,
                state=gan_state, history=history, start_epoch=start, mesh=gan_mesh,
                epoch_fused=args.epoch_fused,
            )
            save_gan_loss_csv(history, loss_csv)
            draw_gan_loss(history, loss_png)
            save_gan_state(args.model_save_path, gan_state)
            print("=" * 15, "finished training GAN", "=" * 15)
    else:
        gan_state, history = train_gan(
            gan_cfg, gan_train_loader, args.GAN_epochs, mesh=gan_mesh,
            epoch_fused=args.epoch_fused,
        )
        save_gan_loss_csv(history, loss_csv)
        draw_gan_loss(history, loss_png)
        save_gan_state(args.model_save_path, gan_state)
        print("=" * 15, "finished training GAN", "=" * 15)

    # ---- Stage B: GAN_FFN classifier ----
    model = GAN_FFN(
        n_classes=n_classes, dropout=args.dropout, gen_num_layers=args.num_layers,
        dtype=dtype,
    )
    train_loader, valid_loader, test_loader = get_iemocap_loaders(
        args.data_path, batch_size=args.batch_size, valid=0.1, seed=args.seed,
        strict_parity=args.strict_parity,
    )
    from ..train.loop import batch_to_arrays

    sample = batch_to_arrays(next(iter(train_loader)))
    from ..utils.aot import cached_init

    params = cached_init(
        model, jax.random.PRNGKey(args.seed),
        sample["audio"], sample["visual"], sample["text"], salt="init_gan_ffn",
    )
    params = graft_generator_params(params, gan_state["params"])
    print("Number of parameter: %.2fM" % (param_count(params) / 1e6))

    loss_weights = jnp.asarray(IEMOCAP_LOSS_WEIGHTS) if args.class_weight else None
    optimizer = torch_adam(args.lr, weight_decay=args.l2)
    apply_train, apply_eval = make_gan_ffn_apply_fns(model, eval_attentions=True)
    from ..utils.tensorboard import TBWriter

    writer = TBWriter("./tensorboard", enabled=args.tensorboard)
    # batch-cadence histograms consume the grads the step applied, so the
    # step must return them (train/classifier.py train_grads). Gate on
    # writer.enabled, not args.tensorboard: a TBWriter whose backend failed
    # to import silently no-ops, and the grads-returning step would pay a
    # fresh compile (distinct AOT salt) + a per-batch hook for nothing.
    train_grads = writer.enabled and args.tb_grad_histograms == "batch"
    if args.epoch_fused:
        # one scanned program per same-shape batch group per epoch phase
        # replaces one dispatch per batch (measured neutral for stage B,
        # 4.4x for stage A — PERF.md "stage-B dispatch")
        from ..train.classifier import make_classifier_epoch_steps

        train_step, eval_step = make_classifier_epoch_steps(
            apply_train, apply_eval, optimizer, n_classes, loss_weights,
            aot_cache=True, eval_attentions=True,
        )
    else:
        train_step, eval_step = make_classifier_steps(
            apply_train, apply_eval, optimizer, n_classes, loss_weights,
            aot_cache=True,  # fresh processes skip the compile (utils/aot.py)
            eval_attentions=True,
            train_grads=train_grads,
        )
    state = init_classifier_state(params, optimizer)
    if writer.enabled and args.tb_grad_histograms == "epoch":
        from ..train.classifier import make_grad_fn

        grad_fn = make_grad_fn(apply_train, n_classes, loss_weights)

    print("=" * 15, "data loaded", "=" * 15)
    best = None  # (loss, labels, preds, masks)
    rng = jax.random.PRNGKey(args.seed + 2)
    for e in range(args.epochs):
        start_time = time.time()
        rng, sub = jax.random.split(rng)
        from ..utils.profiling import trace

        lr_scale = float(0.98**e) if args.lr_schedule == "decay" else None
        on_batch = None
        if train_grads:
            # reference cadence: every parameter's grad histogram EVERY batch,
            # tagged with the epoch step (train_IEMOCAP.py:166-168); the train
            # step hands the hook the gradients it just applied
            def on_batch(i, st, arrays, grads, _e=e):
                writer.add_param_histograms(grads, _e)

        with trace(args.profile if e == 1 else None):  # epoch 1: post-compile
            if args.epoch_fused:
                from ..train.loop import run_epoch_fused

                state, train_res = run_epoch_fused(
                    train_loader, state, train_epoch_step=train_step, rng=sub,
                    lr_scale=lr_scale,
                )
            else:
                state, train_res = run_epoch(
                    train_loader, state, train_step=train_step, rng=sub,
                    lr_scale=lr_scale, on_batch=on_batch, train_grads=train_grads,
                )
        if args.epoch_fused:
            valid_res = run_epoch_fused(
                valid_loader, state["params"], eval_epoch_step=eval_step,
                eval_attentions=True,
            )
            test_res = run_epoch_fused(
                test_loader, state["params"], eval_epoch_step=eval_step,
                eval_attentions=True,
            )
        else:
            valid_res = run_epoch(
                valid_loader, state["params"], eval_step=eval_step, eval_attentions=True
            )
            test_res = run_epoch(
                test_loader, state["params"], eval_step=eval_step, eval_attentions=True
            )

        if writer.enabled and args.tb_grad_histograms == "epoch":
            # per-parameter gradient histograms sampled once per epoch (the
            # async-friendly default; --tb-grad-histograms batch matches the
            # reference's per-batch cadence)
            rng, gsub = jax.random.split(rng)
            writer.add_param_histograms(grad_fn(state["params"], gsub, sample), e)

        if best is None or best[0] > test_res.avg_loss:
            best = (test_res.avg_loss, test_res.labels, test_res.preds, test_res.masks)
            # best epoch's eval attentions (reference best_attn,
            # train_IEMOCAP.py:693-700; empty alphas for GAN_FFN)
            best_attn = test_res.attentions
            # device-side copy: the live buffers get donated by the next step
            best_params = jax.tree.map(jnp.copy, state["params"])

        # reference scalar tags (train_IEMOCAP.py:702-704)
        writer.add_scalar("test: accuracy/loss", test_res.avg_accuracy / test_res.avg_loss, e)
        writer.add_scalar("train: accuracy/loss", train_res.avg_accuracy / train_res.avg_loss, e)

        elapsed = round(time.time() - start_time, 2)
        n_utt = float(np.sum(train_res.masks))
        print(
            "epoch {} train_loss {} train_acc {} train_fscore {} valid_loss {} "
            "valid_acc {} val_fscore {} test_loss {} test_acc {} test_fscore {} "
            "time {} ({:.1f} utt/s)".format(
                e + 1,
                train_res.avg_loss, train_res.avg_accuracy, train_res.avg_fscore,
                valid_res.avg_loss, valid_res.avg_accuracy, valid_res.avg_fscore,
                test_res.avg_loss, test_res.avg_accuracy, test_res.avg_fscore,
                elapsed, n_utt / max(elapsed, 1e-9),
            )
        )

    writer.close()
    # best-snapshot classifier checkpoint (absent in the reference: its best
    # model existed only as in-memory metrics, train_IEMOCAP.py:693-700)
    from ..utils.checkpoint import save_params

    ckpt = os.path.join(args.model_save_path, "classifier_best.msgpack")
    save_params(ckpt, best_params)
    print(f"saved best classifier to {ckpt}")
    best_loss, best_label, best_pred, best_mask = best
    print("Test performance..")
    path = write_test_report(
        args.output_dir, args.GAN_epochs, best_loss, best_label, best_pred, best_mask
    )
    print(f"Successfully save test_out to {path}")
    print(format_test_report(best_loss, best_label, best_pred, best_mask))
    from ..evaluation.metrics import f1_score

    return {
        "best_loss": best_loss,
        "f1": round(
            f1_score(best_label, best_pred, sample_weight=best_mask, average="weighted")
            * 100, 2,
        ),
        "report_path": path,
        "attentions": best_attn,
    }


if __name__ == "__main__":
    main()
