"""Self-contained deployment artifacts for the fusion classifier
(``jax.export`` / StableHLO).

The reference has NO deployment path at all: its entry scripts train, print
reports, and exit, keeping the "best model" only as in-memory metrics
(SURVEY.md §5; train_IEMOCAP.py saves the six GAN nets but never the
classifier). This repo's trainers persist the best classifier
(``classifier_best.msgpack``) and ``cli/predict.py`` gives offline batch
evaluation; this module adds the production-serving story the TPU rebuild
is intended for:

- :func:`export_classifier` lowers the deterministic ``GAN_FFN`` forward —
  weights BAKED IN as StableHLO constants — to ONE shape-polymorphic
  function (symbolic time and batch dims, ``1 <= L <= max_len``, ``B >= 1``)
  for multiple target platforms (default cpu + tpu), packed with metadata
  into one artifact blob. Shape polymorphism keeps the weights in the
  artifact exactly once (~20 MB/layer-config) instead of once per served
  geometry.
- :func:`export_dialoguernn_classifier` and :func:`export_meld_classifier`
  do the same for the other two entry-point models (``GAN_FFN_DialogueRNN``
  — the full BiModel scan stack exports shape-polymorphically — and
  ``MELDLSTMModel``), so every trained classifier family has the same
  deployment story. The artifact records its input signature (a "family"),
  and the loader adapts.
- :class:`ServingClassifier` loads any of those blobs and serves
  predictions with zero dependencies on this package: deserialization and
  execution need only ``jax`` (and the artifact). No flax, no model code,
  no checkpoint — the artifact is the unit you ship to the fleet.

Execution of the polymorphic function still specializes per concrete shape
(XLA compiles static programs), so the loader QUANTIZES request shapes by
default — time padded up to the training loaders' bucket grid
(data/loaders.py ``DEFAULT_BUCKETS``), batch up to a multiple of the
recommended batch size — bounding the number of compilations a server ever
pays. Attention masks keys at ``valid_len`` (nn/transformer.py:10-12,87-89),
so time padding cannot leak into real rows; batch padding is embarrassingly
parallel. For the DialogueRNN family the forward scan is causal and the
reverse scan + att2 are driven by per-dialogue ``umask`` lengths
(models/dialogue_rnn.py), so zero-masked time padding is also
output-preserving. ``MELDLSTMModel``'s backward LSTM direction READS future
timesteps regardless of mask (replicating the reference's unpacked
nn.LSTM, model.py:543), so its artifact quantizes the BATCH axis only
(``time_quantize=False`` in the metadata) — time runs at exact request
length. Quantization is a serve-side policy (``quantize=False`` runs exact
shapes), not baked into the artifact.

The export uses the pure-XLA attention path rather than the Pallas kernel so
one artifact runs on every exported platform (the +12% Pallas win is a
TRAIN-step measurement, PERF.md; inference is dominated by the same GEMMs
either way).

Two deployment-variant knobs compose with every family (``cli/export.py
--dtype bf16`` / ``--weights int8``): :func:`bf16_variant` re-bakes weights
and compute at bfloat16 (half the bytes, MXU-native), and
:func:`quantize_weights_int8` stores the matrix weights as per-output-channel
symmetric int8 + scales (~4× smaller artifacts), dequantized at the top of
the exported function. Outputs are float32 log-probs in every variant.

Example
-------
    blob = export_classifier(model, params)             # train side
    open("gan_ffn.stablehlo", "wb").write(blob)
    ...
    clf = ServingClassifier.load("gan_ffn.stablehlo")   # serve side
    classes = clf.predict(audio, visual, text)          # (L, B) int32
"""

from __future__ import annotations

import io
import json
import math
import struct
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_MAGIC = b"GANFFN_SERVING\x00"
ARTIFACT_VERSION = 1

# IEMOCAP emotion order (dataloader.py:15 via data/datasets.py label_names)
DEFAULT_LABEL_NAMES = ("happy", "sad", "neutral", "angry", "excited", "frustrated")
# MELD emotion order (data/datasets.py MELDDataset.emotion_names)
MELD_LABEL_NAMES = ("neutral", "surprise", "fear", "sadness", "joy", "disgust", "anger")

# Input kinds: "feat"/"qmask" are time-major rank-3 (L, B, dim); "umask" is
# batch-first rank-2 (B, L). Padding added by shape quantization is zeros,
# which for qmask/umask means "no party / not a real utterance".
_RANK = {"feat": 3, "qmask": 3, "umask": 2}


def _default_inputs_gan_ffn(d_audio: int, d_visual: int, d_text: int):
    return [
        {"name": "audio", "kind": "feat", "dim": d_audio},
        {"name": "visual", "kind": "feat", "dim": d_visual},
        {"name": "text", "kind": "feat", "dim": d_text},
    ]


def _pack(meta: Dict[str, Any], entries: Dict[str, bytes]) -> bytes:
    """Length-prefixed container: JSON metadata + named binary entries.

    Deliberately dependency-free (stdlib only) so the serve side needs
    nothing beyond jax: [magic][u32 json_len][json][per entry:
    u32 name_len][name][u64 payload_len][payload].
    """
    out = io.BytesIO()
    out.write(ARTIFACT_MAGIC)
    meta_b = json.dumps(meta, sort_keys=True).encode("utf-8")
    out.write(struct.pack("<I", len(meta_b)))
    out.write(meta_b)
    for name in sorted(entries):
        name_b = name.encode("utf-8")
        out.write(struct.pack("<I", len(name_b)))
        out.write(name_b)
        payload = entries[name]
        out.write(struct.pack("<Q", len(payload)))
        out.write(payload)
    return out.getvalue()


def _unpack(blob: bytes) -> Tuple[Dict[str, Any], Dict[str, bytes]]:
    """Inverse of :func:`_pack`, hardened for the load path: artifacts are
    the unit shipped to a fleet, so a truncated download or a bit-flipped
    byte must surface as a first-class ``ValueError`` naming the corruption,
    never as a raw ``struct.error``/``UnicodeDecodeError`` from offset
    arithmetic (every field read is bounds-checked against the blob)."""
    if not blob.startswith(ARTIFACT_MAGIC):
        raise ValueError("not a gan_ffn_tpu serving artifact (bad magic)")

    def take(off: int, n: int, what: str) -> int:
        end = off + n
        if n < 0 or end > len(blob):
            raise ValueError(
                f"truncated/corrupt artifact: {what} needs {n} bytes at "
                f"offset {off}, but the blob ends at {len(blob)}"
            )
        return end

    off = take(len(ARTIFACT_MAGIC), 4, "metadata length")
    (json_len,) = struct.unpack_from("<I", blob, len(ARTIFACT_MAGIC))
    end = take(off, json_len, "metadata JSON")
    try:
        meta = json.loads(blob[off:end].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"truncated/corrupt artifact: metadata is not valid JSON ({e})") from e
    if not isinstance(meta, dict):
        raise ValueError("truncated/corrupt artifact: metadata is not a JSON object")
    off = end
    entries: Dict[str, bytes] = {}
    while off < len(blob):
        end = take(off, 4, "entry name length")
        (name_len,) = struct.unpack_from("<I", blob, off)
        off, end = end, take(end, name_len, "entry name")
        try:
            name = blob[off:end].decode("utf-8")
        except UnicodeDecodeError as e:
            raise ValueError(f"truncated/corrupt artifact: entry name is not UTF-8 ({e})") from e
        off, end = end, take(end, 8, f"payload length of entry {name!r}")
        (payload_len,) = struct.unpack_from("<Q", blob, off)
        off, end = end, take(end, payload_len, f"payload of entry {name!r}")
        entries[name] = blob[off:end]
        off = end
    return meta, entries


def bf16_variant(model, params):
    """(model, f32 params) -> the bfloat16 deployment variant of both.

    Returns ``model`` re-parameterized with ``dtype=jnp.bfloat16`` and
    ``params`` with float32 leaves cast to bfloat16 — so an export bakes
    HALF the constant bytes and the MXU runs its native precision.
    GAN_FFN / GAN_FFN_DialogueRNN thread the dtype through their generators
    and encoders (models/gan_ffn.py:45/81); MELDLSTMModel casts its input
    feature tensor, which the LSTM stack then follows (the recurrent cells
    run at ``inputs.dtype``, nn/recurrent.py:164) — its mask-driven
    attention epilogue stays float32-promoted. Exporters record the dtype
    in the artifact metadata; ``fwd`` always returns float32 log-probs, so
    the serve-side API is dtype-invariant.
    """
    cast = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    return model.clone(dtype=jnp.bfloat16), cast


def _dtype_name(model) -> str:
    d = getattr(model, "dtype", None)
    return "float32" if d is None else jnp.dtype(d).name


def quantize_weights_int8(params):
    """Weight-only per-output-channel symmetric int8 quantization.

    Matrix-shaped float leaves (ndim >= 2 — the Dense/LSTM/attention
    kernels, where ~all the bytes are) become ``(int8 q, float32 scale)``
    with one scale per output channel (last axis, the torch/flax kernel
    convention): ``x ≈ q * scale``, ``q ∈ [-127, 127]``. Vectors and
    scalars (biases, LayerNorm scales — tiny and precision-sensitive) pass
    through unquantized. Returns ``(qflat, treedef, n_quantized)`` where
    ``qflat`` is a flat list of ``(q_or_passthrough, scale_or_None)``.

    An int8 export bakes the int8 tensors + scales as the program's
    constants — ~4× smaller artifacts than float32 — and dequantizes at
    the top of the exported function (one convert+multiply per weight,
    noise next to the matmuls it feeds).
    """
    flat, treedef = jax.tree.flatten(params)
    qflat, n = [], 0
    for x in flat:
        if x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating):
            xf = jnp.asarray(x, jnp.float32)
            axes = tuple(range(x.ndim - 1))
            scale = jnp.max(jnp.abs(xf), axis=axes, keepdims=True) / 127.0
            scale = jnp.where(scale == 0, jnp.float32(1.0), scale)
            q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
            qflat.append((q, scale.astype(jnp.float32)))
            n += 1
        else:
            qflat.append((x, None))
    return qflat, treedef, n


def dequantize_weights(qflat, treedef, params_template=None):
    """Materialize a params tree from :func:`quantize_weights_int8` output.

    Dequantized leaves come back at their template leaf's dtype when
    ``params_template`` is given (so a bf16 model gets bf16 weights),
    float32 otherwise.
    """
    tdtypes = (
        [t.dtype for t in jax.tree.leaves(params_template)]
        if params_template is not None else [None] * len(qflat)
    )
    leaves = [
        q if s is None
        else (q.astype(jnp.float32) * s).astype(td or jnp.float32)
        for (q, s), td in zip(qflat, tdtypes)
    ]
    return jax.tree.unflatten(treedef, leaves)


def _shape_for(kind: str, dim: Optional[int], L, B):
    if kind == "feat" or kind == "qmask":
        return (L, B, dim)
    if kind == "umask":
        return (B, L)
    raise ValueError(f"unknown input kind {kind!r}")


def _export(
    model,
    fwd,
    inputs,
    *,
    family: str,
    has_valid_len: bool,
    time_quantize: bool,
    max_len: int,
    batch_size: int,
    buckets: Sequence[int],
    platforms: Sequence[str],
    label_names: Sequence[str],
    weights: Optional[str] = None,
) -> bytes:
    """Shared exporter: lower ``fwd`` shape-polymorphically and pack it.

    ``fwd`` takes the family's tensors (plus ``valid_len`` when
    ``has_valid_len``) and returns log-probs ``(L, B, C)``. Kernels are
    pinned to the pure-XLA paths so one artifact runs on every exported
    platform.
    """
    from .ops.config import use_pallas_attention, use_pallas_mlp

    if buckets and max(buckets) > max_len:
        raise ValueError(f"buckets {tuple(buckets)} exceed max_len {max_len}")

    L, B = jax.export.symbolic_shape(
        "L, B", constraints=(f"L <= {max_len}", "L >= 1", "B >= 1")
    )
    args = [
        jax.ShapeDtypeStruct(_shape_for(s["kind"], s.get("dim"), L, B), jnp.float32)
        for s in inputs
    ]
    if has_valid_len:
        args.append(jax.ShapeDtypeStruct((), jnp.int32))
    with use_pallas_attention(False), use_pallas_mlp(False):
        exp = jax.export.export(jax.jit(fwd), platforms=list(platforms))(*args)

    meta = {
        "version": ARTIFACT_VERSION,
        "model": type(model).__name__,
        "family": family,
        "inputs": list(inputs),
        "has_valid_len": bool(has_valid_len),
        "time_quantize": bool(time_quantize),
        "max_len": int(max_len),
        "batch_size": int(batch_size),
        "buckets": sorted(int(b) for b in buckets),
        "platforms": list(platforms),
        "dims": {s["name"]: s["dim"] for s in inputs if s["kind"] == "feat"},
        "n_classes": int(getattr(model, "n_classes", len(label_names))),
        "label_names": list(label_names),
        "dtype": _dtype_name(model),  # compute dtype baked in
        "weights": weights or _dtype_name(model),  # constant storage dtype
        "jax_version": jax.__version__,
    }
    return _pack(meta, {"main": exp.serialize()})


def _params_source(params, weights_int8: bool):
    """Zero-arg params closure for an exporter: identity, or int8-weight
    dequantizing — then the int8 tensors + per-channel scales (not the
    float weights) become the exported program's constants."""
    if not weights_int8:
        return lambda: params
    qflat, treedef, _ = quantize_weights_int8(params)
    template = params  # leaf dtypes only; the float arrays are not traced
    return lambda: dequantize_weights(qflat, treedef, template)


def export_classifier(
    model,
    params,
    *,
    max_len: int = 112,
    batch_size: int = 32,
    buckets: Sequence[int] = (32, 64, 96, 112),
    platforms: Sequence[str] = ("cpu", "tpu"),
    d_audio: int = 100,
    d_visual: int = 512,
    d_text: int = 100,
    label_names: Sequence[str] = DEFAULT_LABEL_NAMES,
    weights_int8: bool = False,
) -> bytes:
    """Export ``GAN_FFN``'s deterministic forward with ``params`` baked in.

    One shape-polymorphic StableHLO function, multi-platform. The exported
    signature is ``(audio (L,B,100) f32, visual (L,B,512) f32, text
    (L,B,100) f32, valid_len () i32) -> log_prob (L,B,C) f32`` with symbolic
    ``1 <= L <= max_len`` (the positional-encoding table bound) and
    ``B >= 1``. ``batch_size``/``buckets`` are recorded as the loader's
    shape-quantization grid, not baked into the function.
    """
    params = jax.device_get(params)  # bake host copies, not device refs
    get_params = _params_source(params, weights_int8)

    def fwd(audio, visual, text, valid_len):
        log_prob, *_ = model.apply(
            {"params": get_params()},
            audio,
            visual,
            text,
            valid_len=valid_len,
            deterministic=True,
        )
        return log_prob.astype(jnp.float32)  # dtype-invariant serve API

    return _export(
        model, fwd, _default_inputs_gan_ffn(d_audio, d_visual, d_text),
        family="gan_ffn", has_valid_len=True, time_quantize=True,
        max_len=max_len, batch_size=batch_size, buckets=buckets,
        platforms=platforms, label_names=label_names,
        weights="int8" if weights_int8 else None,
    )


def export_dialoguernn_classifier(
    model,
    params,
    *,
    max_len: int = 112,
    batch_size: int = 30,
    buckets: Sequence[int] = (32, 64, 96, 112),
    platforms: Sequence[str] = ("cpu", "tpu"),
    d_audio: int = 100,
    d_visual: int = 512,
    d_text: int = 100,
    n_parties: int = 2,
    label_names: Sequence[str] = DEFAULT_LABEL_NAMES,
    weights_int8: bool = False,
) -> bytes:
    """Export ``GAN_FFN_DialogueRNN`` (generators + full BiModel scan stack).

    Signature ``(audio, visual, text, qmask (L,B,P), umask (B,L),
    valid_len) -> log_prob (L,B,C)``. The whole recurrent stack —
    forward/reverse DialogueRNN scans, masked reversal, att2 — lowers
    shape-polymorphically. Time quantization is output-preserving here
    because the forward scan is causal and the reverse scan + att2 read
    per-dialogue lengths from ``umask`` (models/dialogue_rnn.py:45-57,146);
    padded rows carry ``umask = 0``.
    """
    params = jax.device_get(params)
    if getattr(model, "deterministic", True) is not True:
        model = model.clone(deterministic=True)  # serve-side forward is eval-mode
    get_params = _params_source(params, weights_int8)

    def fwd(audio, visual, text, qmask, umask, valid_len):
        log_prob, *_ = model.apply(
            {"params": get_params()}, audio, visual, text, qmask, umask,
            valid_len=valid_len,
        )
        return log_prob.astype(jnp.float32)  # dtype-invariant serve API

    inputs = _default_inputs_gan_ffn(d_audio, d_visual, d_text) + [
        {"name": "qmask", "kind": "qmask", "dim": n_parties},
        {"name": "umask", "kind": "umask", "dim": None},
    ]
    return _export(
        model, fwd, inputs,
        family="gan_ffn_dialoguernn", has_valid_len=True, time_quantize=True,
        max_len=max_len, batch_size=batch_size, buckets=buckets,
        platforms=platforms, label_names=label_names,
        weights="int8" if weights_int8 else None,
    )


def export_meld_classifier(
    model,
    params,
    *,
    max_len: int = 512,
    batch_size: int = 30,
    platforms: Sequence[str] = ("cpu", "tpu"),
    n_parties: int = 9,
    label_names: Sequence[str] = MELD_LABEL_NAMES,
    weights_int8: bool = False,
) -> bytes:
    """Export ``MELDLSTMModel`` — ``(text (L,B,D_m), qmask (L,B,9),
    umask (B,L)) -> log_prob (L,B,C)``.

    No time-bucket grid: the model's backward LSTM direction reads future
    timesteps regardless of mask (reference model.py:543 runs an unpacked
    nn.LSTM over the padded batch), so time padding would change real rows.
    The loader therefore runs exact request lengths and quantizes the batch
    axis only (``time_quantize=False``). ``max_len`` is just a sanity bound
    — the model has no positional table.
    """
    params = jax.device_get(params)
    get_params = _params_source(params, weights_int8)

    def fwd(text, qmask, umask):
        log_prob, *_ = model.apply(
            {"params": get_params()}, text, qmask, umask, deterministic=True
        )
        return log_prob.astype(jnp.float32)  # dtype-invariant serve API

    inputs = [
        {"name": "text", "kind": "feat", "dim": int(model.D_m)},
        {"name": "qmask", "kind": "qmask", "dim": n_parties},
        {"name": "umask", "kind": "umask", "dim": None},
    ]
    return _export(
        model, fwd, inputs,
        family="meld_lstm", has_valid_len=False, time_quantize=False,
        max_len=max_len, batch_size=batch_size, buckets=(),
        platforms=platforms, label_names=label_names,
        weights="int8" if weights_int8 else None,
    )


class ServingClassifier:
    """Model-code-free inference over an exported serving artifact
    (any family: :func:`export_classifier`,
    :func:`export_dialoguernn_classifier`, :func:`export_meld_classifier`).

    Needs only ``jax`` — no flax, no gan_ffn_tpu models, no checkpoint.
    Thread-safe after construction (the deserialized function is immutable;
    jax caches one executable per concrete shape).

    ``quantize`` (default True) pads request shapes up to the artifact's
    bucket/batch grid so a server compiles at most
    ``len(buckets) x ceil(max_B / batch_size)`` distinct programs;
    ``quantize=False`` runs exact request shapes (one compile per distinct
    shape — fine for offline use, compile churn in production). Artifacts
    with ``time_quantize = False`` (MELD) always run exact time lengths.

    ``batch_grid`` refines the batch-axis policy for latency-sensitive
    servers: a sorted tuple of batch sizes (e.g. ``(1, 4, 8, 32)``) that a
    request's B is padded UP to (falling back to ``batch_size`` multiples
    beyond the grid). The default policy pads every request to at least the
    artifact's training ``batch_size``, which wastes ~B_q/B of the FLOPs on
    a single-dialogue request (measured on v5e: a B=1 request at the
    default grid runs the full B=32 program — PERF.md "serving path"); a
    grid bounds compiles at ``len(buckets) x len(batch_grid)`` while
    letting small requests run small programs. Serve-side policy only —
    the artifact is unchanged.
    """

    def __init__(self, meta: Dict[str, Any], entries: Dict[str, bytes], *,
                 quantize: bool = True,
                 batch_grid: Optional[Sequence[int]] = None):
        if meta.get("version") != ARTIFACT_VERSION:
            raise ValueError(f"unsupported artifact version {meta.get('version')!r}")
        self.meta = meta
        self.family: str = meta.get("family", "gan_ffn")
        self.inputs = meta.get("inputs") or _default_inputs_gan_ffn(
            meta["dims"]["audio"], meta["dims"]["visual"], meta["dims"]["text"]
        )
        self.input_names: Tuple[str, ...] = tuple(s["name"] for s in self.inputs)
        self.has_valid_len: bool = meta.get("has_valid_len", True)
        self.time_quantize: bool = meta.get("time_quantize", True)
        self.max_len: int = meta["max_len"]
        self.batch_size: int = meta["batch_size"]
        self.buckets: Tuple[int, ...] = tuple(meta["buckets"])
        self.label_names: Tuple[str, ...] = tuple(meta["label_names"])
        self.dtype: str = meta.get("dtype", "float32")  # baked compute dtype
        # constant storage dtype ("int8" = weight-only quantized constants)
        self.weights: str = meta.get("weights", self.dtype)
        self.quantize = quantize
        if batch_grid is not None and (
            not batch_grid or any(int(b) < 1 for b in batch_grid)
        ):
            raise ValueError(f"batch_grid must be positive ints, got {batch_grid!r}")
        self.batch_grid: Optional[Tuple[int, ...]] = (
            tuple(sorted(int(b) for b in batch_grid)) if batch_grid else None
        )
        if "main" not in entries:
            raise ValueError(
                "truncated/corrupt artifact: no 'main' program entry "
                f"(entries present: {sorted(entries) or 'none'})"
            )
        recorded = meta.get("jax_version", "<unrecorded>")
        if recorded != jax.__version__:
            import warnings

            warnings.warn(
                f"serving artifact was exported under jax {recorded} but "
                f"jax {jax.__version__} is running; jax.export carries "
                "compatibility guarantees across nearby versions, but "
                "re-export on the serving version to be safe",
                RuntimeWarning,
                stacklevel=3,
            )
        try:
            self._fn = jax.export.deserialize(entries["main"])
        except Exception as e:
            detail = (
                f"exported under jax {recorded}, running jax {jax.__version__}"
                if recorded != jax.__version__
                else f"jax {jax.__version__} matches the exporting version, "
                "so the program bytes are likely corrupt"
            )
            raise ValueError(
                f"failed to deserialize the exported program ({detail}). "
                "Re-export the artifact with cli/export.py on a matching jax "
                f"version. Underlying error: {e}"
            ) from e

    # -- construction ------------------------------------------------------
    @classmethod
    def loads(cls, blob: bytes, **kw) -> "ServingClassifier":
        meta, entries = _unpack(blob)
        return cls(meta, entries, **kw)

    @classmethod
    def load(cls, path: str, **kw) -> "ServingClassifier":
        with open(path, "rb") as f:
            return cls.loads(f.read(), **kw)

    # -- inference ---------------------------------------------------------
    def _quantized_shape(self, L: int, B: int) -> Tuple[int, int]:
        if not self.quantize:
            return L, B
        Lq = L
        if self.time_quantize:
            Lq = next((b for b in self.buckets if L <= b), None)
            if Lq is None:  # between the largest bucket and the hard max
                Lq = self.max_len
        if self.batch_grid:
            Bq = next((g for g in self.batch_grid if B <= g), None)
            if Bq is None:  # beyond the grid: batch_size multiples as before
                Bq = math.ceil(B / self.batch_size) * self.batch_size
        else:
            Bq = max(self.batch_size, math.ceil(B / self.batch_size) * self.batch_size)
        return Lq, Bq

    def warmup(
        self,
        *,
        lengths: Optional[Sequence[int]] = None,
        batches: Optional[Sequence[int]] = None,
    ) -> List[Tuple[int, int, float]]:
        """Precompile the quantization grid so requests never stall.

        Execution specializes per concrete padded shape, so the FIRST
        request hitting each (bucket, batch) point pays that shape's
        compile (measured 46 s per grid point on the hosted v5e — PERF.md
        "serving path"). A production server calls this at startup
        (``cli/serve.py --warmup``) to move every compile out of the
        request path.

        ``lengths`` defaults to every time shape :meth:`log_probs` can
        route a request to: the artifact's buckets, plus ``max_len`` when
        requests between the largest bucket and the hard max fall through
        to it. ``batches`` defaults to the ``batch_grid`` if one is set,
        else the training batch size. Two routes stay unwarmable by
        construction and compile on first use: batches beyond the grid
        (quantized to unbounded ``batch_size`` multiples) and — for
        artifacts with ``time_quantize = False`` (MELD), which run exact
        request lengths — any length not warmed explicitly; for those
        there is no finite default grid, so pass the lengths you expect to
        serve, or get a ValueError.

        Requested shapes are mapped through the same quantization as a real
        request and DEDUPED, so the returned ``[(L, B, seconds), ...]``
        lists the padded shapes actually compiled, each exactly once
        (zero-filled dummy requests through the real :meth:`log_probs`
        path, so routing and padding are exercised too).
        """
        if lengths is None:
            if self.time_quantize:
                lengths = self.buckets
                if not lengths or max(lengths) < self.max_len:
                    lengths = tuple(lengths) + (self.max_len,)
            else:
                lengths = ()
        if batches is None:
            batches = self.batch_grid or (self.batch_size,)
        if not lengths or not batches:
            if not self.time_quantize and not tuple(lengths):
                raise ValueError(
                    "nothing to warm: this artifact runs exact time lengths "
                    "(time_quantize=False) — pass lengths=(...) for the "
                    "request lengths you expect to serve"
                )
            raise ValueError(
                f"nothing to warm: empty lengths={tuple(lengths)!r} / "
                f"batches={tuple(batches)!r}"
            )
        shapes: List[Tuple[int, int]] = []
        for L in lengths:
            for B in batches:
                q = self._quantized_shape(int(L), int(B))
                if q not in shapes:
                    shapes.append(q)
        timings: List[Tuple[int, int, float]] = []
        for L, B in shapes:
            zeros = [
                np.zeros(_shape_for(s["kind"], s.get("dim"), L, B), np.float32)
                for s in self.inputs
            ]
            t0 = time.perf_counter()
            self.log_probs(*zeros)
            timings.append((L, B, time.perf_counter() - t0))
        return timings

    def log_probs(self, *tensors: np.ndarray, valid_len: Optional[int] = None) -> np.ndarray:
        """Family input tensors -> (L, B, n_classes) float32 log-probs.

        ``tensors`` are the artifact's inputs in order (``self.input_names``):
        ``(audio, visual, text)`` for gan_ffn, plus ``(qmask, umask)`` for
        gan_ffn_dialoguernn, ``(text, qmask, umask)`` for meld_lstm. Features
        and qmask are time-major ``(L, B, dim)``; umask is ``(B, L)``.
        ``valid_len`` defaults to the input's L (reference semantics: the
        batch max length, nn/transformer.py:12). Padding added by shape
        quantization is zeros (umask/qmask zero = not a real utterance) and
        is sliced back off before returning.
        """
        if len(tensors) != len(self.inputs):
            raise ValueError(
                f"{self.family} artifact takes {len(self.inputs)} tensors "
                f"{self.input_names}, got {len(tensors)}"
            )
        arrs = [np.asarray(a, np.float32) for a in tensors]
        for a, s in zip(arrs, self.inputs):
            if a.ndim != _RANK[s["kind"]]:
                raise ValueError(
                    f"{'/'.join(self.input_names)} tensors must be rank-3 "
                    f"(L, B, D) time-major (umask rank-2 (B, L)); "
                    f"{s['name']} has rank {a.ndim}"
                )
        L, B = arrs[0].shape[0], arrs[0].shape[1]
        for a, s in zip(arrs, self.inputs):
            want = (B, L) if s["kind"] == "umask" else (L, B)
            if a.shape[:2] != want:
                raise ValueError(
                    f"input leading dims must agree: expected {s['name']} to "
                    f"start {want}, got {a.shape[:2]}"
                )
            if s["kind"] != "umask" and s.get("dim") and a.shape[2] != s["dim"]:
                raise ValueError(
                    f"{s['name']} last dim must be {s['dim']}, got {a.shape[2]}"
                )
        if L > self.max_len:
            raise ValueError(f"sequence length {L} exceeds exported max_len {self.max_len}")
        Lq, Bq = self._quantized_shape(L, B)
        padded = [
            np.pad(a, ((0, Bq - B), (0, Lq - L))) if s["kind"] == "umask"
            else np.pad(a, ((0, Lq - L), (0, Bq - B), (0, 0)))
            for a, s in zip(arrs, self.inputs)
        ]
        if self.has_valid_len:
            padded.append(np.int32(L if valid_len is None else valid_len))
        out = self._fn.call(*padded)
        return np.asarray(out)[:L, :B]

    def predict(self, *tensors, valid_len: Optional[int] = None) -> np.ndarray:
        """Argmax class ids, (L, B) int32."""
        return np.argmax(
            self.log_probs(*tensors, valid_len=valid_len), axis=2
        ).astype(np.int32)

    def names_for(self, ids: np.ndarray):
        """Map (L, B) class ids to names, a length-B list of length-L lists.

        Shared by ``predict_names`` and callers that already hold the ids
        (cli/serve.py returns both from one forward pass).
        """
        return [[self.label_names[c] for c in ids[:, j]] for j in range(ids.shape[1])]

    def predict_names(self, *tensors, valid_len: Optional[int] = None):
        """Class names, a length-B list of length-L lists."""
        return self.names_for(self.predict(*tensors, valid_len=valid_len))
