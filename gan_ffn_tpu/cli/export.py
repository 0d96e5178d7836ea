"""Export a trained classifier as a self-contained serving artifact.

Completes the deploy side of the pipeline the reference lacks entirely
(SURVEY.md §5: the reference never persists the classifier; its "best model"
is in-memory metrics): train with one of the three trainer CLIs (each saves
its best classifier under ``--model-save-path``), then

    python -m gan_ffn_tpu.cli.export --model gan_ffn \\
        --model-save-path ./GAN_save/ --output gan_ffn.stablehlo

produces ONE file with the deterministic forward lowered to shape-polymorphic
StableHLO for cpu+tpu, weights baked in as constants (``serving.export_*``).
``cli/serve.py`` or any jax-only process (``serving.ServingClassifier.load``)
can then serve it without this package, flax, or the checkpoint.

Families (``--model``) and the checkpoints they load:

- ``gan_ffn`` (default): ``classifier_best.msgpack`` from cli/train_iemocap
- ``dialoguernn``: ``dialoguernn_classifier_best.msgpack`` from
  cli/train_iemocap_dialoguernn (full BiModel scan stack, reference dims
  D_g=D_p=500, D_e=D_h=100 — train_IEMOCAP_DialogueRNN.py:635-641)
- ``meld``: ``meld_classifier_best.msgpack`` from cli/train_meld (reference
  dims D_m=600, D_e=300, D_h=600 — train_MELD.py:143-145; batch quantization
  only, see serving.export_meld_classifier)

``--verify`` round-trips the artifact in-process and checks it against the
live model on random batches (including a quantization-padded odd shape)
before writing.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import GAN_FFN, GAN_FFN_DialogueRNN, MELDLSTMModel
from ..serving import (
    ServingClassifier,
    bf16_variant,
    dequantize_weights,
    export_classifier,
    export_dialoguernn_classifier,
    export_meld_classifier,
    quantize_weights_int8,
)
from ..utils.checkpoint import load_params_any_layout


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export a classifier to a serving artifact")
    p.add_argument("--model", choices=["gan_ffn", "dialoguernn", "meld"],
                   default="gan_ffn")
    p.add_argument("--model-save-path", default="./GAN_save/",
                   help="directory holding the trainer's best-classifier checkpoint")
    p.add_argument("--output", default=None,
                   help="artifact path (default <model>.stablehlo)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="serve-side batch quantization target "
                        "(default: the family's trainer batch size)")
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--n-classes", type=int, default=None,
                   help="default 6 (IEMOCAP families) / 7 (meld emotion)")
    p.add_argument("--max-len", type=int, default=112)
    p.add_argument("--buckets", type=int, nargs="+", default=[32, 64, 96, 112],
                   help="serve-side length quantization grid (ignored for meld)")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                   help="compute/constant dtype baked into the artifact: bf16 "
                        "halves the weight bytes and runs the MXU's native "
                        "precision (serving.bf16_variant); log-prob outputs "
                        "are float32 either way")
    p.add_argument("--weights", choices=["native", "int8"], default="native",
                   help="constant storage: int8 bakes per-output-channel "
                        "weight-only quantized kernels + scales (~4x smaller "
                        "artifacts vs f32; serving.quantize_weights_int8), "
                        "dequantized at the top of the exported function; "
                        "composes with --dtype")
    p.add_argument("--verify", action="store_true", default=False,
                   help="check the artifact against the live model before writing")
    return p


def _random_inputs(clf: ServingClassifier, L: int, B: int, rng):
    """Random request tensors matching the artifact's input spec."""
    out = []
    for spec in clf.inputs:
        if spec["kind"] == "feat":
            out.append(rng.standard_normal((L, B, spec["dim"])).astype(np.float32))
        elif spec["kind"] == "qmask":
            q = np.zeros((L, B, spec["dim"]), np.float32)
            q[np.arange(L)[:, None], np.arange(B)[None, :],
              rng.integers(0, spec["dim"], (L, B))] = 1.0
            out.append(q)
        else:  # umask
            out.append(np.ones((B, L), np.float32))
    return out


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    if args.model == "gan_ffn":
        n_classes = 6 if args.n_classes is None else args.n_classes
        batch = 32 if args.batch_size is None else args.batch_size
        model = GAN_FFN(n_classes=n_classes, gen_num_layers=args.num_layers)
        ckpt_name = "classifier_best.msgpack"
        L0 = min(args.buckets)
        init_args = (
            jnp.zeros((L0, batch, 100), jnp.float32),
            jnp.zeros((L0, batch, 512), jnp.float32),
            jnp.zeros((L0, batch, 100), jnp.float32),
        )
        export = lambda m, p: export_classifier(
            m, p, max_len=args.max_len, batch_size=batch,
            weights_int8=(args.weights == "int8"),
            buckets=args.buckets, platforms=args.platforms,
        )
    elif args.model == "dialoguernn":
        n_classes = 6 if args.n_classes is None else args.n_classes
        batch = 30 if args.batch_size is None else args.batch_size
        model = GAN_FFN_DialogueRNN(
            n_classes=n_classes, gen_num_layers=args.num_layers
        )
        ckpt_name = "dialoguernn_classifier_best.msgpack"
        L0 = min(args.buckets)
        init_args = (
            jnp.zeros((L0, batch, 100), jnp.float32),
            jnp.zeros((L0, batch, 512), jnp.float32),
            jnp.zeros((L0, batch, 100), jnp.float32),
            jnp.zeros((L0, batch, 2), jnp.float32).at[..., 0].set(1.0),
            jnp.ones((batch, L0), jnp.float32),
        )
        export = lambda m, p: export_dialoguernn_classifier(
            m, p, max_len=args.max_len, batch_size=batch,
            weights_int8=(args.weights == "int8"),
            buckets=args.buckets, platforms=args.platforms,
        )
    else:  # meld
        n_classes = 7 if args.n_classes is None else args.n_classes
        batch = 30 if args.batch_size is None else args.batch_size
        model = MELDLSTMModel(D_m=600, D_e=300, D_h=600, n_classes=n_classes)
        ckpt_name = "meld_classifier_best.msgpack"
        L0 = 8
        init_args = (
            jnp.zeros((L0, batch, 600), jnp.float32),
            jnp.zeros((L0, batch, 9), jnp.float32).at[..., 0].set(1.0),
            jnp.ones((batch, L0), jnp.float32),
        )
        export = lambda m, p: export_meld_classifier(
            m, p, max_len=args.max_len, batch_size=batch,
            weights_int8=(args.weights == "int8"),
            platforms=args.platforms,
        )

    template = model.init({"params": jax.random.PRNGKey(0)}, *init_args)["params"]
    ckpt = os.path.join(args.model_save_path, ckpt_name)
    # bridges checkpoints written under --scan-layers (stacked encoder
    # layout) back to the unrolled template this exporter traces with
    params = load_params_any_layout(ckpt, template)
    print(f"loaded {args.model} classifier from {ckpt}")

    model_f32, params_f32 = model, params  # verify's quality baseline
    if args.dtype == "bf16":
        model, params = bf16_variant(model, params)
    params_verify = params  # what the exported program computes with
    if args.weights == "int8" and args.verify:
        # only --verify consumes this; the exporter quantizes internally
        qf, td, n_q = quantize_weights_int8(params)
        params_verify = dequantize_weights(qf, td, params)
        print(f"int8 weight quantization: {n_q} kernel tensors")

    blob = export(model, params)
    output = args.output or f"{args.model}.stablehlo"
    print(f"exported shape-polymorphic forward (L<={args.max_len}, B>=1) for "
          f"{args.platforms}: {len(blob) / 1e6:.1f} MB")

    if args.verify:
        clf = ServingClassifier.loads(blob)
        rng = np.random.default_rng(0)
        # same-dtype closeness bound: f32 programs differ only by fusion
        # order; bf16 rounding compounds through the depth, so the bound is
        # resolution-scale, and classification quality is checked separately
        # by argmax agreement against the float32 live model
        tol = 1e-4 if args.dtype == "f32" else 5e-2
        worst, agree, total = 0.0, 0, 0
        grid_L = min(args.buckets) if clf.time_quantize else 8
        for L, b in ((grid_L, batch), (7, 3)):  # grid shape + odd shape
            tensors = _random_inputs(clf, L, b, rng)
            got = clf.log_probs(*tensors)
            apply_kw = (
                {"valid_len": jnp.int32(L)} if clf.has_valid_len
                else {"deterministic": True}
            )
            # same-computation bound: params_verify is exactly what the
            # exported program computes with (incl. int8 dequantization)
            want, *_ = model.apply({"params": params_verify}, *tensors, **apply_kw)
            worst = max(worst, float(np.max(np.abs(got - np.asarray(want, np.float32)))))
            if args.dtype == "f32" and args.weights == "native":
                ref = want  # model IS model_f32: don't recompute the forward
            else:
                ref, *_ = model_f32.apply({"params": params_f32}, *tensors, **apply_kw)
            agree += int(np.sum(np.argmax(got, 2) == np.argmax(np.asarray(ref), 2)))
            total += got.shape[0] * got.shape[1]
        variant = args.dtype + ("+int8w" if args.weights == "int8" else "")
        print(f"verify: max |artifact - live {variant} model| = {worst:.3e}; "
              f"argmax agreement vs f32 live = {agree}/{total}")
        if not np.isfinite(worst) or worst > tol:
            raise SystemExit(f"artifact verification FAILED (err={worst}, tol={tol})")
        if agree < 0.98 * total:
            raise SystemExit(
                f"artifact verification FAILED (argmax agreement {agree}/{total})"
            )

    with open(output, "wb") as f:
        f.write(blob)
    print(f"wrote {output}")
    return {"output": output, "bytes": len(blob)}


if __name__ == "__main__":
    main()
