"""IEMOCAP GAN-FFN + DialogueRNN entry point
(reference train_IEMOCAP_DialogueRNN.py:547-837).

Same GAN pre-training stage as train_iemocap; the downstream classifier is
``GAN_FFN_DialogueRNN`` (fusion sum -> bidirectional DialogueRNN). Deltas from
the flagship entry (reference defaults): batch 30, epochs 100, l2=1e-5,
``--rec-dropout`` 0.1, ``--attention general`` (context attention type),
``--active-listener``, ``--use-trained-GAN`` defaulting True; prints metrics
only (no sweep report file).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from ..data import get_iemocap_loaders, write_synthetic_iemocap
from ..evaluation.metrics import classification_report, confusion_matrix, f1_score
from ..models import GAN_FFN_DialogueRNN
from ..train.classifier import (
    graft_generator_params,
    init_classifier_state,
    make_classifier_steps,
)
from ..train.gan import GANConfig, init_gan_state
from ..train.loop import batch_to_arrays, run_epoch
from ..train.optim import torch_adam
from ..utils.artifacts import draw_gan_loss, save_gan_loss_csv
from ..utils.checkpoint import load_gan_state, save_gan_state
from .common import IEMOCAP_LOSS_WEIGHTS, param_count, train_gan


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="IEMOCAP GAN-FFN + DialogueRNN trainer")
    p.add_argument("--no-cuda", action="store_true", default=False)
    p.add_argument("--lr", type=float, default=0.0001, metavar="LR")
    p.add_argument("--l2", type=float, default=0.00001, metavar="L2")
    p.add_argument("--rec-dropout", type=float, default=0.1, metavar="rec_dropout")
    p.add_argument("--dropout", type=float, default=0.6, metavar="dropout")
    p.add_argument("--batch-size", type=int, default=30, metavar="BS")
    p.add_argument("--epochs", type=int, default=100, metavar="E")
    p.add_argument("--attention", default="general", help="context attention type")
    p.add_argument("--GAN-epochs", type=int, default=150, metavar="E")
    p.add_argument("--class-weight", action="store_true", default=True)
    p.add_argument("--active-listener", action="store_true", default=False)
    p.add_argument("--tensorboard", action="store_true", default=False)
    p.add_argument("--tb-grad-histograms", choices=("epoch", "batch"), default="epoch",
                   help="gradient-histogram cadence under --tensorboard: 'epoch' samples "
                        "one batch per epoch (a fresh-dropout-mask re-estimate at the "
                        "post-epoch params); 'batch' matches the reference's "
                        "per-batch logging (train_IEMOCAP_DialogueRNN.py:167-169) — "
                        "the train step returns the gradients it APPLIED (pre-update "
                        "params, the step's own dropout mask: the reference's "
                        "param.grad exactly) at the cost of a sync per batch")
    p.add_argument("--use-trained-GAN", action="store_true", default=True)
    p.add_argument("--fresh-GAN", dest="use_trained_GAN", action="store_false",
                   help="train the GAN from scratch instead of loading")
    # framework additions
    p.add_argument("--data-path", default="data/iemocap/IEMOCAP_features.pkl")
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--model-save-path", default="./GAN_save/")
    p.add_argument("--num-layers", type=int, default=8)
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
    p.add_argument("--lr-schedule", choices=("reference", "decay"), default="reference",
                   help="reference: constant lr (per-batch LambdaLR quirk); decay: "
                        "honest 0.98^epoch decay")
    p.add_argument("--dp", action="store_true", default=False,
                   help="shard the stage-A GAN batch over all local devices")
    p.add_argument("--bf16", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=3407)
    p.add_argument("--strict-parity", action="store_true", default=False,
                   help="replicate the reference's NaN on constant-feature normalization")
    p.add_argument("--synthetic-train", type=int, default=120)
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
    # DialogueRNN dims (train_IEMOCAP_DialogueRNN.py:635-641)
    D_m, D_g, D_p, D_e, D_h, D_a = 100, 500, 500, 100, 100, 100

    gan_cfg = GANConfig(
        num_layers=args.num_layers, lr=0.0001, b1=0.5, b2=0.6, dtype=dtype,
        seed=args.seed, fused_schedule=(args.gan_schedule == "fused"),
        scan_layers=args.scan_layers,
    )
    gan_train_loader, _, _ = get_iemocap_loaders(
        args.data_path, batch_size=32, valid=0.1, seed=args.seed,
        strict_parity=args.strict_parity,
    )

    if args.use_trained_GAN and os.path.exists(
        os.path.join(args.model_save_path, "acoustic_gen.msgpack")
    ):
        template = init_gan_state(gan_cfg, jax.random.PRNGKey(args.seed))
        gan_state = load_gan_state(args.model_save_path, template, reset_opt=True)
        print("=" * 15, args.model_save_path + " loaded trained GAN", "=" * 15)
    else:
        gan_mesh = None
        if args.dp and jax.device_count() > 1:
            from ..parallel import make_mesh

            gan_mesh = make_mesh()
            print(f"stage A data parallelism over {jax.device_count()} devices")
        gan_state, history = train_gan(
            gan_cfg, gan_train_loader, args.GAN_epochs, mesh=gan_mesh,
            epoch_fused=args.epoch_fused,
        )
        save_gan_loss_csv(history, os.path.join(args.output_dir, "GAN_loss.csv"))
        draw_gan_loss(history, os.path.join(args.output_dir, "GAN_loss.png"))
        save_gan_state(args.model_save_path, gan_state)
        print("=" * 15, "finished training GAN", "=" * 15)

    model_kwargs = dict(
        D_m=D_m, D_g=D_g, D_p=D_p, D_e=D_e, D_h=D_h, D_a=D_a,
        n_classes=n_classes,
        listener_state=args.active_listener,
        context_attention=args.attention,
        dropout_rec=args.rec_dropout,
        dropout=args.dropout,
        gen_num_layers=args.num_layers,
        dtype=dtype,
    )
    model_train = GAN_FFN_DialogueRNN(**model_kwargs, deterministic=False)
    model_eval = GAN_FFN_DialogueRNN(**model_kwargs, deterministic=True)

    train_loader, valid_loader, test_loader = get_iemocap_loaders(
        args.data_path, batch_size=args.batch_size, valid=0.1, seed=args.seed,
        strict_parity=args.strict_parity,
    )
    sample = batch_to_arrays(next(iter(train_loader)))
    from ..utils.aot import cached_init

    params = cached_init(
        model_eval, jax.random.PRNGKey(args.seed),
        sample["audio"], sample["visual"], sample["text"],
        sample["qmask"], sample["umask"], salt="init_gan_ffn_dialoguernn",
    )
    params = graft_generator_params(params, gan_state["params"])
    print("Number of parameter: %.2fM" % (param_count(params) / 1e6))

    def apply_eval(p, batch):
        # (log_prob, attn): BiModel's att2 alpha (L, B, L) + per-direction
        # alphas — the reference's eval-epoch accumulation
        # (train_IEMOCAP_DialogueRNN.py:173-176)
        out = model_eval.apply(
            {"params": p},
            batch["audio"], batch["visual"], batch["text"],
            batch["qmask"], batch["umask"],
            valid_len=batch["valid_len"],
        )
        return out[0], {"alpha": out[1], "alpha_f": out[2], "alpha_b": out[3]}

    def apply_train(p, rng, batch):
        return model_train.apply(
            {"params": p},
            batch["audio"], batch["visual"], batch["text"],
            batch["qmask"], batch["umask"],
            valid_len=batch["valid_len"], rngs={"dropout": rng},
        )[0]

    loss_weights = jnp.asarray(IEMOCAP_LOSS_WEIGHTS) if args.class_weight else None
    optimizer = torch_adam(args.lr, weight_decay=args.l2)
    from ..utils.tensorboard import TBWriter

    writer = TBWriter("./tensorboard", enabled=args.tensorboard)
    # batch-cadence histograms consume the grads the step applied, so the
    # step must return them (train/classifier.py train_grads). Gate on
    # writer.enabled: a no-op TBWriter must not select the grads-returning
    # step (distinct AOT salt -> fresh compile) for histograms it drops.
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
            aot_cache=True,  # the deep recurrent program costs ~215 s to compile
            eval_attentions=True,
            train_grads=train_grads,
        )
    state = init_classifier_state(params, optimizer)

    if writer.enabled and args.tb_grad_histograms == "epoch":
        from ..train.classifier import make_grad_fn

        grad_fn = make_grad_fn(apply_train, n_classes, loss_weights)

    best = None
    rng = jax.random.PRNGKey(args.seed + 2)
    for e in range(args.epochs):
        start_time = time.time()
        rng, sub = jax.random.split(rng)
        lr_scale = float(0.98**e) if args.lr_schedule == "decay" else None
        on_batch = None
        if train_grads:
            # reference cadence: per-parameter grad histograms every batch
            # (train_IEMOCAP_DialogueRNN.py:167-169); the train step hands
            # the hook the gradients it just applied
            def on_batch(i, st, arrays, grads, _e=e):
                writer.add_param_histograms(grads, _e)

        if args.epoch_fused:
            from ..train.loop import run_epoch_fused

            state, train_res = run_epoch_fused(
                train_loader, state, train_epoch_step=train_step, rng=sub,
                lr_scale=lr_scale,
            )
            valid_res = run_epoch_fused(
                valid_loader, state["params"], eval_epoch_step=eval_step,
                eval_attentions=True,
            )
            test_res = run_epoch_fused(
                test_loader, state["params"], eval_epoch_step=eval_step,
                eval_attentions=True,
            )
        else:
            state, train_res = run_epoch(
                train_loader, state, train_step=train_step, rng=sub,
                lr_scale=lr_scale, on_batch=on_batch, train_grads=train_grads,
            )
            valid_res = run_epoch(
                valid_loader, state["params"], eval_step=eval_step, eval_attentions=True
            )
            test_res = run_epoch(
                test_loader, state["params"], eval_step=eval_step, eval_attentions=True
            )
        if best is None or best[0] > test_res.avg_loss:
            best = (test_res.avg_loss, test_res.labels, test_res.preds, test_res.masks)
            # best epoch's att2/directional attention weights (reference
            # best_attn, train_IEMOCAP_DialogueRNN.py:775-784)
            best_attn = test_res.attentions
            # device-side copy: live buffers get donated by the next step
            best_params = jax.tree.map(jnp.copy, state["params"])
        if writer.enabled:
            # reference scalar tags (train_IEMOCAP_DialogueRNN.py:787-789)
            writer.add_scalar("test: accuracy/loss", test_res.avg_accuracy / test_res.avg_loss, e)
            writer.add_scalar("train: accuracy/loss", train_res.avg_accuracy / train_res.avg_loss, e)
            if args.tb_grad_histograms == "epoch":
                # per-parameter grad histograms (167-169), sampled per epoch
                rng, gsub = jax.random.split(rng)
                writer.add_param_histograms(grad_fn(state["params"], gsub, sample), e)
        elapsed = round(time.time() - start_time, 2)
        print(
            "epoch {} train_loss {} train_acc {} train_fscore {} valid_loss {} "
            "valid_acc {} val_fscore {} test_loss {} test_acc {} test_fscore {} time {}".format(
                e + 1,
                train_res.avg_loss, train_res.avg_accuracy, train_res.avg_fscore,
                valid_res.avg_loss, valid_res.avg_accuracy, valid_res.avg_fscore,
                test_res.avg_loss, test_res.avg_accuracy, test_res.avg_fscore, elapsed,
            )
        )

    writer.close()
    # best-snapshot checkpoint (the reference keeps its best model as
    # in-memory metrics only, train_IEMOCAP_DialogueRNN.py:793-800)
    from ..utils.checkpoint import save_params

    ckpt = os.path.join(args.model_save_path, "dialoguernn_classifier_best.msgpack")
    save_params(ckpt, best_params)
    print(f"saved best classifier to {ckpt}")
    best_loss, best_label, best_pred, best_mask = best
    final_f1 = round(
        f1_score(best_label, best_pred, sample_weight=best_mask, average="weighted") * 100, 2
    )
    print("Test performance..")
    print("Loss {} F1-score {}".format(best_loss, final_f1))
    print(classification_report(best_label, best_pred, sample_weight=best_mask, digits=4))
    print(confusion_matrix(best_label, best_pred, sample_weight=best_mask))
    return {"best_loss": best_loss, "f1": final_f1, "attentions": best_attn}


if __name__ == "__main__":
    main()
