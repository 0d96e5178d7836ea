"""Interleaved ablation bounding the win of a fused LayerNorm+residual kernel.

ROADMAP item 4 lists "fused LayerNorm+residual epilogues" as a candidate
Pallas kernel "only if profiling justifies". This script produces that
profile the cheap, robust way — by ABLATION rather than a device trace (the
hosted tunnel's remote-run path does not expose a local profiler): it
measures the flagship GAN_FFN classifier train step (bench.py geometry —
3x 8-layer encoders fwd+bwd + masked NLL + torch-Adam, B=32, bucket 112,
bf16, Pallas attention per the shipped default) twice in ONE process,

  - ``layernorm``: the shipped step, unmodified;
  - ``identity``:  the ``LayerNorm`` name used by every encoder-layer site
    (nn/transformer.py) rebound AT TRACE TIME to a module that defines the
    same scale/bias params (identical param tree, identical Adam work) but
    returns its input unchanged — removing the LN statistics from both the
    forward and backward pass.

The wall-clock delta is an UPPER BOUND on what any fused LN+residual epilogue
kernel could save end-to-end: a fused kernel cannot beat removing the op
entirely. Timed blocks are interleaved (same protocol as
scripts/ab_stage_a_attention.py) so the hosted tunnel's cross-process
variance (PERF.md, ~±25%) hits both paths equally.

The 48 LayerNorm sites per step (2 per layer x 8 layers x 3 encoders) norm
over K in {100, 512} — small-lane reductions XLA fuses into the surrounding
elementwise work; the prior is that the delta is small, mirroring the fused
MLP result (PERF.md "Fused MLP kernel": built, measured, XLA won).

Run (real TPU, exclusive — no other jax process while this is active):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_layernorm_epilogue.py

Decision protocol: if ``speedup_bound`` (layernorm_ms / identity_ms) is
within the block spread of 1.0, LN is not hot and the ROADMAP line closes
with no kernel built; a bound comfortably above the noise would justify
prototyping the kernel (then an integrated A/B like the stacked-scan one).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from bench import realistic_batch  # noqa: E402


@contextlib.contextmanager
def identity_layernorm():
    """Rebind transformer.py's ``LayerNorm`` name to a param-preserving
    passthrough module for the duration of a trace.

    A proper ``nn.Module`` subclass (not a patched ``__call__`` — flax wraps
    methods at class creation, so assigning a raw function would bypass the
    scope machinery). Same param names/shapes as the real LayerNorm, so the
    param tree — and therefore the Adam update work — is identical; only the
    normalization statistics disappear from forward and backward.
    """
    from typing import Any

    from flax import linen as nn

    from gan_ffn_tpu.nn import transformer

    class IdentityLayerNorm(nn.Module):
        epsilon: float = 1e-5
        dtype: Any = None

        @nn.compact
        def __call__(self, x):
            features = x.shape[-1]
            self.param("scale", nn.initializers.ones, (features,))
            self.param("bias", nn.initializers.zeros, (features,))
            return x.astype(self.dtype or x.dtype)

    orig = transformer.LayerNorm
    transformer.LayerNorm = IdentityLayerNorm
    try:
        yield
    finally:
        transformer.LayerNorm = orig


def build(ablate_ln: bool, L: int, B: int, fp32: bool):
    import jax
    import jax.numpy as jnp

    from gan_ffn_tpu.cli.common import IEMOCAP_LOSS_WEIGHTS, make_gan_ffn_apply_fns
    from gan_ffn_tpu.models import GAN_FFN
    from gan_ffn_tpu.train.classifier import (
        init_classifier_state,
        make_classifier_steps,
    )
    from gan_ffn_tpu.train.optim import torch_adam

    dtype = jnp.float32 if fp32 else jnp.bfloat16
    model = GAN_FFN(n_classes=6, gen_num_layers=8, dtype=dtype)
    rng = np.random.default_rng(0)
    batch, umask = realistic_batch(rng, L, B)
    ctx = identity_layernorm() if ablate_ln else contextlib.nullcontext()
    with ctx:
        # init + the first (tracing) call both happen inside the patch so the
        # compiled program embodies the ablation; replays never retrace.
        params = model.init(
            jax.random.PRNGKey(0), batch["audio"], batch["visual"], batch["text"]
        )["params"]
        apply_train, apply_eval = make_gan_ffn_apply_fns(model)
        opt = torch_adam(1e-4, weight_decay=0.008)
        train_step, _ = make_classifier_steps(
            apply_train, apply_eval, opt, 6, jnp.asarray(IEMOCAP_LOSS_WEIGHTS)
        )
        state = init_classifier_state(params, opt)
        holder = {"state": state, "key": jax.random.PRNGKey(1)}

        def step_once():
            holder["key"], sub = jax.random.split(holder["key"])
            holder["state"], loss, preds = train_step(holder["state"], sub, batch)
            return loss

        loss = step_once()
        jax.block_until_ready(loss)
    return step_once, float(umask.sum())


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bucket-len", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    from ab_common import ab_summary, run_interleaved

    paths = {}
    for name, ablate in (("layernorm", False), ("identity", True)):
        t0 = time.perf_counter()
        step_once, n_utt = build(ablate, args.bucket_len, args.batch_size, args.fp32)
        print(f"[compile] {name:9s} {time.perf_counter() - t0:7.1f} s", flush=True)
        paths[name] = (step_once, n_utt)

    results = run_interleaved(paths, args.blocks, args.steps)
    print(json.dumps(ab_summary(
        "flagship_layernorm_ablation", args.bucket_len, args.batch_size,
        args.fp32, args.blocks, args.steps, results, paths,
        ratio_key="speedup_bound", numerator="layernorm", denominator="identity",
    )))


if __name__ == "__main__":
    main()
