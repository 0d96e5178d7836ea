"""Interleaved ablation bounding the win of a fused matching-attention kernel.

Companion to scripts/ab_layernorm_epilogue.py, closing ROADMAP item 4's other
candidate-kernel line ("a general2 matching-attention kernel for BiModel att2")
from data at the REFERENCE geometry. Measures the full GAN_FFN_DialogueRNN
train step (bench geometry: 3x 8-layer generators + stacked bidirectional
scan + att2 + torch-Adam, L=112, B=30, bf16 — built by
scripts/ab_dialoguernn_stacked.build) twice in ONE process:

  - ``matchatt``: the shipped step, unmodified;
  - ``identity``: BiModel's ``MatchingAttention`` rebound AT TRACE TIME to a
    module that returns its candidate input as the pooled value and uniform
    alpha — deleting the entire att2 chain (transform matmul, masked score
    einsum, tanh, softmax, renormalization, and the alpha@M pool einsum)
    while keeping downstream shapes and the param tree identical (the unused
    transform params get zero gradients; Adam's work is unchanged).

The delta is an UPPER BOUND on what any fused att2 kernel could save on this
step — a kernel cannot beat removing the op entirely. At this geometry the
(T, B, L) score intermediate is ~1.5 MB (112x30x112 f32), so the prior is
that XLA's schedule leaves little for a kernel to reclaim.

Run (real TPU, exclusive — no other jax process while this is active):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ab_matchatt_ablation.py

Decision protocol: speedup_bound within the block spread of 1.0 closes the
ROADMAP line with no kernel built; a bound comfortably above the noise would
justify prototyping (then an integrated A/B like the stacked-scan one).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ab_dialoguernn_stacked import build  # noqa: E402


@contextlib.contextmanager
def identity_matching_attention():
    """Rebind dialogue_rnn.py's ``MatchingAttention`` to a passthrough.

    A proper ``nn.Module`` (flax wraps methods at class creation — patching
    ``__call__`` on the real class would bypass the scope machinery). Matches
    the general2 call signature and return arity used by BiModel
    (models/dialogue_rnn.py att2 sites): pool = candidate input, alpha
    uniform at the right rank.
    """
    from typing import Any, Optional

    import jax.numpy as jnp
    from flax import linen as nn

    from gan_ffn_tpu.models import dialogue_rnn

    class IdentityMatchingAttention(nn.Module):
        """general2 (the att2 sites) -> passthrough; every other att_type
        (the in-cell context attention the recurrence depends on) keeps the
        real computation, with the ORIGINAL param names so the stacked-scan
        path's direct cell-param reads still resolve."""

        mem_dim: int
        cand_dim: int
        alpha_dim: Optional[int] = None
        att_type: str = "general2"
        dtype: Any = None

        @nn.compact
        def __call__(self, M, x, mask=None):
            import jax
            from gan_ffn_tpu.nn.attention import NEG_INF
            from gan_ffn_tpu.nn.core import (
                TorchLinear,
                normal_init,
                torch_linear_bias_init,
            )

            L, B, _ = M.shape
            single = x.ndim == 2
            if single:
                x = x[None]
            T = x.shape[0]
            if mask is None:
                mask = jnp.ones((B, L), dtype=M.dtype)

            if self.att_type == "general2":
                # identical param tree to the real general2 module (the params
                # go unused -> zero gradients, same Adam update work)
                TorchLinear(
                    self.mem_dim,
                    name="transform",
                    dtype=self.dtype,
                    kernel_init=normal_init(0.01),
                    bias_init=torch_linear_bias_init(self.cand_dim),
                )(jnp.zeros((1, self.cand_dim), M.dtype))
                alpha = jnp.full((T, B, 1, L), 1.0 / L, dtype=jnp.float32)
                if single:
                    return x[0], alpha[0]
                return x, alpha

            assert self.att_type == "general", (
                "ablation harness only mirrors the 'general' context path"
            )
            # verbatim 'general' semantics from nn/attention.py::MatchingAttention
            xt = TorchLinear(
                self.mem_dim, use_bias=False, name="transform", dtype=self.dtype
            )(x)
            scores = jnp.einsum("tbd,lbd->tbl", xt, M)
            s = jnp.where(mask[None, :, :] > 0, scores.astype(jnp.float32), NEG_INF)
            alpha = jax.nn.softmax(s, axis=-1).astype(M.dtype)
            pool = jnp.einsum("tbl,lbd->tbd", alpha, M)
            alpha = alpha[:, :, None, :]
            if single:
                return pool[0], alpha[0]
            return pool, alpha

    orig = dialogue_rnn.MatchingAttention
    dialogue_rnn.MatchingAttention = IdentityMatchingAttention
    try:
        yield
    finally:
        dialogue_rnn.MatchingAttention = orig


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bucket-len", type=int, default=112)
    p.add_argument("--batch-size", type=int, default=30)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--blocks", type=int, default=6)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import jax

    paths = {}
    for name, ablate in (("matchatt", False), ("identity", True)):
        ctx = identity_matching_attention() if ablate else contextlib.nullcontext()
        t0 = time.perf_counter()
        with ctx:
            # build + first (tracing) call inside the patch; replays never
            # retrace (fixed shapes)
            step_once, n_utt = build(
                True, args.bucket_len, args.batch_size, args.fp32
            )
            loss = step_once()
            jax.block_until_ready(loss)
        print(f"[compile] {name:9s} {time.perf_counter() - t0:7.1f} s", flush=True)
        paths[name] = (step_once, n_utt)

    from ab_common import ab_summary, run_interleaved

    results = run_interleaved(paths, args.blocks, args.steps)
    print(json.dumps(ab_summary(
        "dialoguernn_matchatt_ablation", args.bucket_len, args.batch_size,
        args.fp32, args.blocks, args.steps, results, paths,
        ratio_key="speedup_bound", numerator="matchatt", denominator="identity",
    )))


if __name__ == "__main__":
    main()
