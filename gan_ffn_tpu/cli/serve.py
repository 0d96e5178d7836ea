"""Minimal HTTP inference server over an exported serving artifact.

The deploy-side counterpart of ``cli/export.py`` — a dependency-free
(stdlib ``http.server`` + jax) reference server for the StableHLO artifact.
The reference framework has no serving story at all — its only inference is
the in-training eval pass (train_IEMOCAP.py:123-126, ``train=False`` inside
``train_or_eval_model``) and it never persists the classifier; this closes
the train -> export -> serve pipeline end to end.

    python -m gan_ffn_tpu.cli.serve --artifact gan_ffn.stablehlo --port 8000

API (JSON over HTTP):
- ``GET /healthz`` -> ``{"status": "ok", "model": ..., "family": ...,
  "inputs": [...], "buckets": [...]}``
- ``POST /predict`` with one JSON key per artifact input (the ``inputs``
  list from ``/healthz``; e.g. ``audio``/``visual``/``text`` for the
  gan_ffn family, plus ``qmask``/``umask`` for gan_ffn_dialoguernn,
  ``text``/``qmask``/``umask`` for meld_lstm) plus optional ``valid_len``
  — features/qmask nested (L, B, D) lists, umask (B, L) — returns
  ``{"classes": [[...]], "class_names": [[...]]}`` with per-dialogue
  columns (length-B lists of length-L lists).

Throughput-critical callers should batch to the exported batch size; the
server pads smaller requests (serving.ServingClassifier.log_probs).
Latency-critical deployments serving small requests should pass
``--batch-grid 1,4,8,32`` so a single-dialogue request runs a B=1 program
instead of the padded training-batch one (measured on v5e, PERF.md
"serving path: batch_grid").
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..serving import ServingClassifier


def make_handler(clf: ServingClassifier):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "model": clf.meta.get("model"),
                    "family": clf.family,
                    "inputs": list(clf.input_names),
                    "buckets": list(clf.buckets),
                    "batch_size": clf.batch_size,
                    "batch_grid": list(clf.batch_grid) if clf.batch_grid else None,
                    "label_names": list(clf.label_names),
                    "dtype": clf.dtype,
                    "weights": clf.weights,
                })
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length).decode("utf-8"))
                tensors = [
                    np.asarray(req[name], np.float32) for name in clf.input_names
                ]
                ids = clf.predict(*tensors, valid_len=req.get("valid_len"))
                self._send(200, {
                    "classes": ids.T.tolist(),  # per-dialogue rows
                    "class_names": clf.names_for(ids),
                })
            except (KeyError, TypeError, ValueError, json.JSONDecodeError) as e:
                # TypeError covers valid-JSON-wrong-shape bodies (a top-level
                # array, a dict as a tensor value) — must 400, not kill the
                # handler thread
                self._send(400, {"error": str(e)})

        def log_message(self, fmt, *a):  # quiet by default; errors still raise
            pass

    return Handler


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve a GAN_FFN artifact over HTTP")
    p.add_argument("--artifact", default="gan_ffn.stablehlo")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-grid", default=None, metavar="B1,B2,...",
                   help="latency policy: pad request batch up to the next "
                        "grid size (e.g. 1,4,8,32) instead of the training "
                        "batch size; small requests then run small programs "
                        "(serving.ServingClassifier batch_grid)")
    p.add_argument("--warmup", action="store_true", default=False,
                   help="precompile every shape on the quantization grid "
                        "before accepting connections, so no on-grid request "
                        "pays a compile (46 s/shape measured on v5e, "
                        "PERF.md); batches beyond the grid still compile on "
                        "first use")
    p.add_argument("--warmup-lengths", default=None, metavar="L1,L2,...",
                   help="explicit time lengths to warm — REQUIRED with "
                        "--warmup for artifacts that run exact request "
                        "lengths (time_quantize=False, the meld family), "
                        "which have no finite default grid")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    grid = [int(b) for b in args.batch_grid.split(",")] if args.batch_grid else None
    clf = ServingClassifier.load(args.artifact, batch_grid=grid)
    if args.warmup:
        lengths = (
            [int(x) for x in args.warmup_lengths.split(",")]
            if args.warmup_lengths else None
        )
        try:
            timings = clf.warmup(lengths=lengths)
        except ValueError as e:
            build_parser().error(f"--warmup: {e}")
        for L, B, secs in timings:
            print(f"warmup L={L} B={B}: {secs:.1f}s")
    server = ThreadingHTTPServer((args.host, args.port), make_handler(clf))
    print(f"serving {args.artifact} ({clf.meta.get('model')}, "
          f"buckets {list(clf.buckets)}) on http://{args.host}:{server.server_port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
