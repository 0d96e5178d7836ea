"""Serving-path benchmark: exported StableHLO artifact vs the live model.

Measures the deployment story end to end at the production geometry
(8-layer GAN_FFN, bucket L=112, batch 32 — the flagship bench geometry):

1. export wall time + artifact size (``serving.export_classifier``),
2. steady-state batch-inference throughput of the ARTIFACT
   (``ServingClassifier``, quantized shapes) fed numpy per request — the
   production path, paying host->device transfer every call,
3. the raw exported computation on device-resident inputs (isolates
   execution from transfer),
4. the same forward through the LIVE model (``model.apply`` under jit,
   device-resident inputs) — gap vs (3) is the XLA-attention export vs
   whatever kernel config the live step uses (ops/config.py),
5. single-dialogue latency through the artifact (B=1 quantized to the
   batch target — the worst-case padding waste a server pays),
6. the same B=1 request under the ``batch_grid`` latency policy (padded to
   a B=1 program instead of the training batch),
7. with ``--bf16`` / ``--int8``: the deployment variants
   (``serving.bf16_variant`` — weights baked at half the bytes, MXU-native
   compute; ``serving.quantize_weights_int8`` — ~4x smaller artifacts,
   int8 constants dequantized in-program): size, production-path and
   device-resident request times, max |err| and argmax agreement vs the
   f32 artifact.

``--artifact PATH`` reuses a previously exported blob when the file exists
(the 8-layer multi-platform export costs ~8 min on the hosted session);
the variant legs cache at ``PATH.bf16`` / ``PATH.int8``.

Run on the real TPU (exclusive — no other jax process):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_serving.py
CPU smoke: JAX_PLATFORMS=cpu python scripts/bench_serving.py --layers 1 --len 16 --batch 4

Prints one JSON line with the numbers (not part of bench.py's driver
format — serving is a beyond-reference surface; recorded in PERF.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gan_ffn_tpu.models import GAN_FFN  # noqa: E402
from gan_ffn_tpu.serving import ServingClassifier, export_classifier  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--len", dest="length", type=int, default=112)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--artifact", default=None,
                   help="path to cache the exported blob across runs")
    p.add_argument("--bf16", action="store_true", default=False,
                   help="also export+measure the bfloat16 deployment variant")
    p.add_argument("--int8", action="store_true", default=False,
                   help="also export+measure the int8-weight deployment variant")
    args = p.parse_args(argv)
    L, B = args.length, args.batch

    model = GAN_FFN(n_classes=6, gen_num_layers=args.layers)
    rng = np.random.default_rng(0)
    a, v, t = (rng.standard_normal((L, B, d)).astype(np.float32) for d in (100, 512, 100))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(a), jnp.asarray(v), jnp.asarray(t)
    )["params"]

    if args.artifact and os.path.exists(args.artifact):
        with open(args.artifact, "rb") as f:
            blob = f.read()
        export_s = 0.0
        print(f"[export] reused {args.artifact}, {len(blob)/1e6:.1f} MB", flush=True)
    else:
        t0 = time.time()
        blob = export_classifier(
            model, params, max_len=L, batch_size=B, buckets=(L,)
        )
        export_s = time.time() - t0
        print(f"[export] {export_s:.1f} s, {len(blob)/1e6:.1f} MB", flush=True)
        if args.artifact:
            with open(args.artifact, "wb") as f:
                f.write(blob)

    clf = ServingClassifier.loads(blob)

    def timed(fn, label, utt=None):
        t0 = time.time()
        out = fn()
        first = time.time() - t0
        print(f"[{label}] first call (compile) {first:.1f} s", flush=True)
        t0 = time.time()
        for _ in range(args.iters):
            out = fn()
        ms = (time.time() - t0) / args.iters * 1000
        rate = f" ({utt / ms * 1000:,.0f} utt/s)" if utt else ""
        print(f"[{label}] {ms:.2f} ms/request{rate}", flush=True)
        return out, ms

    art_out, art_ms = timed(lambda: clf.log_probs(a, v, t), "artifact", utt=B * L)

    # device-resident inputs through the raw exported fn: isolates the
    # exported computation from per-request host->device transfer
    da, dv, dt = jnp.asarray(a), jnp.asarray(v), jnp.asarray(t)
    vl = jnp.int32(L)
    _, art_dev_ms = timed(
        lambda: jax.block_until_ready(clf._fn.call(da, dv, dt, vl)),
        "artifact (device inputs)", utt=B * L,
    )

    live = jax.jit(
        lambda a, v, t: model.apply(
            {"params": params}, a, v, t, valid_len=jnp.int32(L), deterministic=True
        )[0]
    )
    live_out, live_ms = timed(
        lambda: np.asarray(jax.block_until_ready(live(da, dv, dt))), "live model",
        utt=B * L,
    )
    err = float(np.max(np.abs(art_out - live_out)))

    # live forward with the artifact's kernel config (pure XLA attention/MLP):
    # separates baked-constant/export effects from kernel-choice effects
    from gan_ffn_tpu.ops.config import use_pallas_attention, use_pallas_mlp
    with use_pallas_attention(False), use_pallas_mlp(False):
        live_xla = jax.jit(
            lambda a, v, t: model.apply(
                {"params": params}, a, v, t, valid_len=jnp.int32(L),
                deterministic=True,
            )[0]
        )
        _, live_xla_ms = timed(
            lambda: np.asarray(jax.block_until_ready(live_xla(da, dv, dt))),
            "live model (XLA kernels)", utt=B * L,
        )

    one = tuple(x[: min(50, L), :1] for x in (a, v, t))
    _, lat_ms = timed(lambda: clf.log_probs(*one), "artifact B=1 (padded)")

    # the batch_grid latency policy: the same artifact served with small
    # batch programs — a B=1 request runs a B=1 program instead of the
    # padded training-batch one (serving.ServingClassifier batch_grid)
    clf_grid = ServingClassifier.loads(blob, batch_grid=(1, 4, 8, B))
    _, lat_grid_ms = timed(
        lambda: clf_grid.log_probs(*one), "artifact B=1 (batch_grid)"
    )

    def variant_leg(tag: str, make_blob) -> dict:
        path = f"{args.artifact}.{tag}" if args.artifact else None
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                vblob = f.read()
            vexp_s = 0.0
            print(f"[export {tag}] reused {path}, {len(vblob)/1e6:.1f} MB", flush=True)
        else:
            t0 = time.time()
            vblob = make_blob()
            vexp_s = time.time() - t0
            print(f"[export {tag}] {vexp_s:.1f} s, {len(vblob)/1e6:.1f} MB", flush=True)
            if path:
                with open(path, "wb") as f:
                    f.write(vblob)
        vclf = ServingClassifier.loads(vblob)
        v_out, v_ms = timed(
            lambda: vclf.log_probs(a, v, t), f"artifact {tag}", utt=B * L
        )
        _, v_dev_ms = timed(
            lambda: jax.block_until_ready(vclf._fn.call(da, dv, dt, vl)),
            f"artifact {tag} (device inputs)", utt=B * L,
        )
        return {
            f"{tag}_export_s": round(vexp_s, 1),
            f"{tag}_artifact_mb": round(len(vblob) / 1e6, 1),
            f"{tag}_artifact_ms": round(v_ms, 2),
            f"{tag}_device_ms": round(v_dev_ms, 2),
            f"{tag}_device_speedup_vs_f32": round(art_dev_ms / v_dev_ms, 3),
            f"{tag}_max_err_vs_f32": float(np.max(np.abs(v_out - art_out))),
            f"{tag}_argmax_agreement_vs_f32": float(
                np.mean(np.argmax(v_out, 2) == np.argmax(art_out, 2))
            ),
        }

    variant_stats = {}
    if args.bf16:
        from gan_ffn_tpu.serving import bf16_variant

        variant_stats.update(variant_leg("bf16", lambda: export_classifier(
            *bf16_variant(model, params), max_len=L, batch_size=B, buckets=(L,)
        )))
    if args.int8:
        variant_stats.update(variant_leg("int8", lambda: export_classifier(
            model, params, max_len=L, batch_size=B, buckets=(L,),
            weights_int8=True,
        )))

    print(json.dumps({
        "bench": "serving",
        "platform": jax.devices()[0].platform,
        "L": L, "B": B, "layers": args.layers,
        "export_s": round(export_s, 1),
        "artifact_mb": round(len(blob) / 1e6, 1),
        "artifact_ms": round(art_ms, 2),
        "artifact_utt_per_s": round(B * L / art_ms * 1000),
        "artifact_device_ms": round(art_dev_ms, 2),
        "artifact_device_utt_per_s": round(B * L / art_dev_ms * 1000),
        "live_ms": round(live_ms, 2),
        "live_xla_ms": round(live_xla_ms, 2),
        "overhead_vs_live": round(art_ms / live_ms, 3),
        "device_overhead_vs_live": round(art_dev_ms / live_ms, 3),
        "device_overhead_vs_live_xla": round(art_dev_ms / live_xla_ms, 3),
        "b1_latency_ms": round(lat_ms, 2),
        "b1_latency_grid_ms": round(lat_grid_ms, 2),
        "max_abs_err_vs_live": err,
        **variant_stats,
    }))


if __name__ == "__main__":
    main()
