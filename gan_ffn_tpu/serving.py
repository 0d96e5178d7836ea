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
- :class:`ServingClassifier` loads that blob and serves predictions with
  zero dependencies on this package: deserialization and execution need
  only ``jax`` (and the artifact). No flax, no model code, no checkpoint —
  the artifact is the unit you ship to the fleet.

Execution of the polymorphic function still specializes per concrete shape
(XLA compiles static programs), so the loader QUANTIZES request shapes by
default — time padded up to the training loaders' bucket grid
(data/loaders.py ``DEFAULT_BUCKETS``), batch up to a multiple of the
recommended batch size — bounding the number of compilations a server ever
pays. Attention masks keys at ``valid_len`` (nn/transformer.py:10-12,87-89),
so time padding cannot leak into real rows; batch padding is embarrassingly
parallel. Quantization is a serve-side policy (``quantize=False`` runs exact
shapes), not baked into the artifact.

The export uses the pure-XLA attention path rather than the Pallas kernel so
one artifact runs on every exported platform (the +12% Pallas win is a
TRAIN-step measurement, PERF.md; inference is dominated by the same GEMMs
either way).

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
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_MAGIC = b"GANFFN_SERVING\x00"
ARTIFACT_VERSION = 1

# IEMOCAP emotion order (dataloader.py:15 via data/datasets.py label_names)
DEFAULT_LABEL_NAMES = ("happy", "sad", "neutral", "angry", "excited", "frustrated")


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
    if not blob.startswith(ARTIFACT_MAGIC):
        raise ValueError("not a gan_ffn_tpu serving artifact (bad magic)")
    off = len(ARTIFACT_MAGIC)
    (json_len,) = struct.unpack_from("<I", blob, off)
    off += 4
    meta = json.loads(blob[off : off + json_len].decode("utf-8"))
    off += json_len
    entries: Dict[str, bytes] = {}
    while off < len(blob):
        (name_len,) = struct.unpack_from("<I", blob, off)
        off += 4
        name = blob[off : off + name_len].decode("utf-8")
        off += name_len
        (payload_len,) = struct.unpack_from("<Q", blob, off)
        off += 8
        entries[name] = blob[off : off + payload_len]
        off += payload_len
    return meta, entries


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
) -> bytes:
    """Export ``model``'s deterministic forward with ``params`` baked in.

    One shape-polymorphic StableHLO function, multi-platform. The exported
    signature is ``(audio (L,B,100) f32, visual (L,B,512) f32, text
    (L,B,100) f32, valid_len () i32) -> log_prob (L,B,C) f32`` with symbolic
    ``1 <= L <= max_len`` (the positional-encoding table bound) and
    ``B >= 1``. ``batch_size``/``buckets`` are recorded as the loader's
    shape-quantization grid, not baked into the function.
    """
    from .ops.config import use_pallas_attention, use_pallas_mlp

    if max(buckets) > max_len:
        raise ValueError(f"buckets {buckets} exceed max_len {max_len}")
    params = jax.device_get(params)  # bake host copies, not device refs

    def fwd(audio, visual, text, valid_len):
        log_prob, *_ = model.apply(
            {"params": params},
            audio,
            visual,
            text,
            valid_len=valid_len,
            deterministic=True,
        )
        return log_prob

    L, B = jax.export.symbolic_shape(
        "L, B", constraints=(f"L <= {max_len}", "L >= 1", "B >= 1")
    )
    args = (
        jax.ShapeDtypeStruct((L, B, d_audio), jnp.float32),
        jax.ShapeDtypeStruct((L, B, d_visual), jnp.float32),
        jax.ShapeDtypeStruct((L, B, d_text), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    with use_pallas_attention(False), use_pallas_mlp(False):
        exp = jax.export.export(jax.jit(fwd), platforms=list(platforms))(*args)

    meta = {
        "version": ARTIFACT_VERSION,
        "model": type(model).__name__,
        "max_len": int(max_len),
        "batch_size": int(batch_size),
        "buckets": sorted(int(b) for b in buckets),
        "platforms": list(platforms),
        "dims": {"audio": d_audio, "visual": d_visual, "text": d_text},
        "n_classes": int(getattr(model, "n_classes", len(label_names))),
        "label_names": list(label_names),
        "jax_version": jax.__version__,
    }
    return _pack(meta, {"main": exp.serialize()})


class ServingClassifier:
    """Model-code-free inference over an :func:`export_classifier` artifact.

    Needs only ``jax`` — no flax, no gan_ffn_tpu models, no checkpoint.
    Thread-safe after construction (the deserialized function is immutable;
    jax caches one executable per concrete shape).

    ``quantize`` (default True) pads request shapes up to the artifact's
    bucket/batch grid so a server compiles at most
    ``len(buckets) x ceil(max_B / batch_size)`` distinct programs;
    ``quantize=False`` runs exact request shapes (one compile per distinct
    shape — fine for offline use, compile churn in production).
    """

    def __init__(self, meta: Dict[str, Any], entries: Dict[str, bytes], *,
                 quantize: bool = True):
        if meta.get("version") != ARTIFACT_VERSION:
            raise ValueError(f"unsupported artifact version {meta.get('version')!r}")
        self.meta = meta
        self.max_len: int = meta["max_len"]
        self.batch_size: int = meta["batch_size"]
        self.buckets: Tuple[int, ...] = tuple(meta["buckets"])
        self.label_names: Tuple[str, ...] = tuple(meta["label_names"])
        self.quantize = quantize
        self._fn = jax.export.deserialize(entries["main"])

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
        Lq = next((b for b in self.buckets if L <= b), None)
        if Lq is None:  # between the largest bucket and the hard max
            Lq = self.max_len
        Bq = max(self.batch_size, math.ceil(B / self.batch_size) * self.batch_size)
        return Lq, Bq

    def log_probs(
        self,
        audio: np.ndarray,
        visual: np.ndarray,
        text: np.ndarray,
        valid_len: Optional[int] = None,
    ) -> np.ndarray:
        """(L, B, D_*) float arrays -> (L, B, n_classes) float32 log-probs.

        ``valid_len`` defaults to the input's L (reference semantics: the
        batch max length, nn/transformer.py:12). Padding added by shape
        quantization is sliced back off before returning.
        """
        audio, visual, text = (np.asarray(a, np.float32) for a in (audio, visual, text))
        if not (audio.ndim == visual.ndim == text.ndim == 3):
            raise ValueError("audio/visual/text must be rank-3 (L, B, D) arrays")
        L, B = audio.shape[0], audio.shape[1]
        if visual.shape[:2] != (L, B) or text.shape[:2] != (L, B):
            raise ValueError("audio/visual/text leading dims (L, B) must agree")
        if L > self.max_len:
            raise ValueError(f"sequence length {L} exceeds exported max_len {self.max_len}")
        vl = np.int32(L if valid_len is None else valid_len)
        Lq, Bq = self._quantized_shape(L, B)
        pad = lambda a: np.pad(a, ((0, Lq - L), (0, Bq - B), (0, 0)))
        out = self._fn.call(pad(audio), pad(visual), pad(text), vl)
        return np.asarray(out)[:L, :B]

    def predict(self, audio, visual, text, valid_len: Optional[int] = None) -> np.ndarray:
        """Argmax class ids, (L, B) int32."""
        return np.argmax(self.log_probs(audio, visual, text, valid_len), axis=2).astype(
            np.int32
        )

    def predict_names(self, audio, visual, text, valid_len: Optional[int] = None):
        """Class names, a length-B list of length-L lists."""
        ids = self.predict(audio, visual, text, valid_len)
        return [[self.label_names[c] for c in ids[:, j]] for j in range(ids.shape[1])]
