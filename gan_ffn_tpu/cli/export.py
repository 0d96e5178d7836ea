"""Export the trained fusion classifier as a self-contained serving artifact.

Completes the deploy side of the pipeline the reference lacks entirely
(SURVEY.md §5: the reference never persists the classifier; its "best model"
is in-memory metrics): train with ``cli/train_iemocap`` (saves
``classifier_best.msgpack``), then

    python -m gan_ffn_tpu.cli.export --model-save-path ./GAN_save/ \\
        --output gan_ffn.stablehlo

produces ONE file with the deterministic forward lowered to shape-polymorphic
StableHLO for cpu+tpu, weights baked in as constants
(``serving.export_classifier``). ``cli/serve.py`` or any jax-only process
(``serving.ServingClassifier.load``) can then serve it without this package,
flax, or the checkpoint.

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

from ..models import GAN_FFN
from ..serving import export_classifier, ServingClassifier
from ..utils.checkpoint import load_params


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export GAN_FFN to a serving artifact")
    p.add_argument("--model-save-path", default="./GAN_save/",
                   help="directory holding classifier_best.msgpack")
    p.add_argument("--output", default="gan_ffn.stablehlo")
    p.add_argument("--batch-size", type=int, default=32,
                   help="serve-side batch quantization target")
    p.add_argument("--num-layers", type=int, default=8)
    p.add_argument("--n-classes", type=int, default=6)
    p.add_argument("--max-len", type=int, default=112)
    p.add_argument("--buckets", type=int, nargs="+", default=[32, 64, 96, 112],
                   help="serve-side length quantization grid")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--verify", action="store_true", default=False,
                   help="check the artifact against the live model before writing")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)

    model = GAN_FFN(n_classes=args.n_classes, gen_num_layers=args.num_layers)
    L0, B = min(args.buckets), args.batch_size
    template = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((L0, B, 100), jnp.float32),
        jnp.zeros((L0, B, 512), jnp.float32),
        jnp.zeros((L0, B, 100), jnp.float32),
    )["params"]
    ckpt = os.path.join(args.model_save_path, "classifier_best.msgpack")
    params = load_params(ckpt, template)
    print(f"loaded classifier from {ckpt}")

    blob = export_classifier(
        model, params, max_len=args.max_len, batch_size=B,
        buckets=args.buckets, platforms=args.platforms,
    )
    print(f"exported shape-polymorphic forward (L<={args.max_len}, B>=1) for "
          f"{args.platforms}: {len(blob) / 1e6:.1f} MB")

    if args.verify:
        clf = ServingClassifier.loads(blob)
        rng = np.random.default_rng(0)
        worst = 0.0
        for L, b in ((min(args.buckets), B), (7, 3)):  # grid shape + odd shape
            audio = rng.standard_normal((L, b, 100)).astype(np.float32)
            visual = rng.standard_normal((L, b, 512)).astype(np.float32)
            text = rng.standard_normal((L, b, 100)).astype(np.float32)
            got = clf.log_probs(audio, visual, text)
            want, *_ = model.apply(
                {"params": params}, audio, visual, text,
                valid_len=jnp.int32(L), deterministic=True,
            )
            worst = max(worst, float(np.max(np.abs(got - np.asarray(want)))))
        print(f"verify: max |artifact - live model| = {worst:.3e}")
        if not np.isfinite(worst) or worst > 1e-4:
            raise SystemExit(f"artifact verification FAILED (err={worst})")

    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {args.output}")
    return {"output": args.output, "bytes": len(blob)}


if __name__ == "__main__":
    main()
