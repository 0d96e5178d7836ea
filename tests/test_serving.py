"""Serving-artifact tests: export -> load -> predict, CLI, HTTP server.

The artifact must reproduce the live model exactly (same platform, both on
the quantization grid and off it), reject malformed inputs/blobs, and the
reference HTTP server must round-trip predictions. All on CPU with tiny
1-layer models; platform-portability of the multi-platform export is covered
by exporting for ("cpu", "tpu") from this CPU-only process. All three model
families are covered: gan_ffn, gan_ffn_dialoguernn (the BiModel scan stack
exports shape-polymorphically; time padding with umask=0 must be
output-preserving), meld_lstm (batch-only quantization — the backward LSTM
reads future timesteps, so time runs exact).
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.models import GAN_FFN, GAN_FFN_DialogueRNN, MELDLSTMModel
from gan_ffn_tpu.serving import (
    ARTIFACT_MAGIC,
    ServingClassifier,
    _pack,
    _unpack,
    export_classifier,
    export_dialoguernn_classifier,
    export_meld_classifier,
)

MAX_LEN, BUCKETS, BATCH = 16, (8, 16), 4


@pytest.fixture(scope="module")
def tiny():
    model = GAN_FFN(n_classes=6, gen_num_layers=1)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((8, BATCH, 100), jnp.float32),
        jnp.zeros((8, BATCH, 512), jnp.float32),
        jnp.zeros((8, BATCH, 100), jnp.float32),
    )["params"]
    return model, params


@pytest.fixture(scope="module")
def artifact(tiny):
    model, params = tiny
    return export_classifier(
        model, params, max_len=MAX_LEN, batch_size=BATCH, buckets=BUCKETS,
        platforms=("cpu", "tpu"),
    )


@pytest.fixture(scope="module")
def clf(artifact):
    return ServingClassifier.loads(artifact)


def _inputs(L, B, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        rng.standard_normal((L, B, d)).astype(np.float32) for d in (100, 512, 100)
    )


def _live(tiny, a, v, t):
    model, params = tiny
    lp, *_ = model.apply(
        {"params": params}, a, v, t,
        valid_len=jnp.int32(a.shape[0]), deterministic=True,
    )
    return np.asarray(lp)


def test_container_roundtrip():
    meta = {"version": 1, "x": [1, 2]}
    entries = {"main": b"\x00\x01binary", "z": b""}
    m, e = _unpack(_pack(meta, entries))
    assert m == meta and e == entries


def test_container_rejects_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        _unpack(b"NOT_AN_ARTIFACT")


def test_loader_rejects_bad_version(artifact):
    meta, entries = _unpack(artifact)
    meta["version"] = 999
    with pytest.raises(ValueError, match="version"):
        ServingClassifier(meta, entries)


def test_unpack_rejects_truncation_at_every_boundary(artifact):
    """A blob cut ANYWHERE must raise ValueError naming the corruption —
    never a raw struct.error/UnicodeDecodeError from offset arithmetic
    (serving.py::_unpack is the fleet's load path)."""
    cuts = [
        len(ARTIFACT_MAGIC) + 2,          # inside the metadata length
        len(ARTIFACT_MAGIC) + 4 + 10,     # inside the metadata JSON
        len(artifact) - 1,                # inside the final payload
    ]
    meta, entries = _unpack(artifact)
    meta_len = len(ARTIFACT_MAGIC) + 4 + len(
        json.dumps(meta, sort_keys=True).encode()
    )
    cuts += [meta_len + 2, meta_len + 4 + 2, meta_len + 4 + len("main") + 3]
    for cut in cuts:
        with pytest.raises(ValueError, match="truncated/corrupt"):
            _unpack(artifact[:cut])


def test_unpack_rejects_bitflips_in_framing(artifact):
    """Bit-flips in the length fields imply absurd lengths; they must fail
    as ValueError, not as silent mis-framing or an unbounded slice."""
    # metadata length: flip the high byte -> multi-MB claimed length
    blob = bytearray(artifact)
    blob[len(ARTIFACT_MAGIC) + 3] ^= 0x80
    with pytest.raises(ValueError, match="truncated/corrupt"):
        _unpack(bytes(blob))
    # corrupt the metadata JSON itself -> not valid JSON
    blob = bytearray(artifact)
    blob[len(ARTIFACT_MAGIC) + 4] ^= 0xFF
    with pytest.raises(ValueError, match="not valid JSON|truncated/corrupt"):
        _unpack(bytes(blob))


def test_loader_requires_main_entry(artifact):
    meta, entries = _unpack(artifact)
    with pytest.raises(ValueError, match="main"):
        ServingClassifier(meta, {"other": b"x"})


def test_loader_flipped_program_bytes_fail_actionably(artifact):
    """A bit-flip inside the serialized program must surface as ValueError
    saying the bytes are likely corrupt (jax versions match), not as an
    opaque deserializer exception."""
    meta, entries = _unpack(artifact)
    payload = bytearray(entries["main"])
    for i in range(16, min(len(payload), 4096), 97):  # scatter flips
        payload[i] ^= 0xA5
    try:
        ServingClassifier(meta, {"main": bytes(payload)})
    except ValueError as e:
        assert "likely corrupt" in str(e) or "failed to deserialize" in str(e)
    else:  # pragma: no cover - deserializer tolerated the flips
        pytest.skip("deserializer accepted the mutated bytes")


def test_loader_jax_version_mismatch_is_surfaced(artifact):
    """Version skew is recorded at export; on load it must be (a) warned
    about even when deserialization succeeds, and (b) named in the error
    when it fails."""
    import warnings

    meta, entries = _unpack(artifact)
    meta["jax_version"] = "0.0.1-test"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ServingClassifier(meta, entries)
    assert any("0.0.1-test" in str(x.message) for x in w)
    # failure path: broken program bytes + skewed version -> both versions
    # named in the actionable error
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with pytest.raises(ValueError, match="0.0.1-test"):
            ServingClassifier(meta, {"main": b"garbage"})


def test_artifact_matches_live_model_on_grid(tiny, clf):
    a, v, t = _inputs(8, BATCH)
    np.testing.assert_allclose(
        clf.log_probs(a, v, t), _live(tiny, a, v, t), atol=1e-5, rtol=0
    )


def test_quantization_pads_and_slices_off_grid(tiny, clf):
    # L=5 (below first bucket), B=2 (below batch target): the loader pads to
    # (8, 4) and slices back; attention masks keys at valid_len=5 so the
    # padded rows cannot leak into real ones — result must equal the live
    # model applied to the UNPADDED arrays.
    a, v, t = _inputs(5, 2, seed=1)
    out = clf.log_probs(a, v, t)
    assert out.shape == (5, 2, 6)
    np.testing.assert_allclose(out, _live(tiny, a, v, t), atol=1e-5, rtol=0)


def test_unquantized_exact_shapes_match(tiny, artifact):
    exact = ServingClassifier.loads(artifact, quantize=False)
    a, v, t = _inputs(7, 3, seed=2)
    np.testing.assert_allclose(
        exact.log_probs(a, v, t), _live(tiny, a, v, t), atol=1e-5, rtol=0
    )


def test_batch_above_target_quantizes_to_multiple(clf):
    # B=6 with target 4 -> padded to 8 internally, still returns B=6
    a, v, t = _inputs(8, 6, seed=3)
    assert clf.log_probs(a, v, t).shape == (8, 6, 6)
    assert clf._quantized_shape(8, 6) == (8, 8)
    assert clf._quantized_shape(9, 1) == (16, 4)


def test_batch_grid_policy(tiny, artifact):
    """batch_grid pads B up to the next grid size (B=1 requests run a B=1
    program instead of the training-batch one), falls back to batch_size
    multiples beyond the grid, and stays output-preserving."""
    grid = ServingClassifier.loads(artifact, batch_grid=(1, 2, BATCH))
    assert grid._quantized_shape(8, 1) == (8, 1)
    assert grid._quantized_shape(5, 2) == (8, 2)
    assert grid._quantized_shape(8, 3) == (8, BATCH)
    assert grid._quantized_shape(8, BATCH + 1) == (8, 2 * BATCH)  # beyond grid
    a, v, t = _inputs(5, 1, seed=6)
    out = grid.log_probs(a, v, t)
    assert out.shape == (5, 1, 6)
    np.testing.assert_allclose(out, _live(tiny, a, v, t), atol=1e-5, rtol=0)
    with pytest.raises(ValueError, match="batch_grid"):
        ServingClassifier.loads(artifact, batch_grid=(0, 4))
    with pytest.raises(ValueError, match="batch_grid"):
        ServingClassifier.loads(artifact, batch_grid=())


def test_rejects_overlong_and_mismatched(clf):
    a, v, t = _inputs(MAX_LEN + 1, 1)
    with pytest.raises(ValueError, match="max_len"):
        clf.log_probs(a, v, t)
    a, v, t = _inputs(8, 2)
    with pytest.raises(ValueError, match="must agree"):
        clf.log_probs(a, v[:, :1], t)


def test_predict_and_names(tiny, clf):
    a, v, t = _inputs(8, 2, seed=4)
    ids = clf.predict(a, v, t)
    assert ids.shape == (8, 2) and ids.dtype == np.int32
    np.testing.assert_array_equal(ids, np.argmax(_live(tiny, a, v, t), axis=2))
    names = clf.predict_names(a, v, t)
    assert len(names) == 2 and len(names[0]) == 8
    assert names[0][0] == clf.label_names[ids[0, 0]]


def test_export_cli_end_to_end(tiny, tmp_path, monkeypatch):
    from gan_ffn_tpu.cli import export as export_cli
    from gan_ffn_tpu.utils.checkpoint import save_params

    model, params = tiny
    save_dir = tmp_path / "GAN_save"
    save_dir.mkdir()
    save_params(str(save_dir / "classifier_best.msgpack"), params)
    out = tmp_path / "gan_ffn.stablehlo"
    res = export_cli.main([
        "--model-save-path", str(save_dir), "--output", str(out),
        "--num-layers", "1", "--batch-size", str(BATCH),
        "--max-len", str(MAX_LEN), "--buckets", "8", "16",
        "--platforms", "cpu", "--verify",
    ])
    assert out.exists() and res["bytes"] == out.stat().st_size
    loaded = ServingClassifier.load(str(out))
    a, v, t = _inputs(8, 2, seed=5)
    np.testing.assert_allclose(
        loaded.log_probs(a, v, t), _live(tiny, a, v, t), atol=1e-5, rtol=0
    )


# ---------------------------------------------------------------------------
# GAN_FFN_DialogueRNN family: the whole BiModel scan stack must export
# shape-polymorphically, and zero-umask time/batch padding added by shape
# quantization must be output-preserving (forward scan causal; reverse scan
# and att2 driven by per-dialogue umask lengths, models/dialogue_rnn.py).
# ---------------------------------------------------------------------------

DRNN_KW = dict(D_g=24, D_p=24, D_e=8, D_a=8)  # small recurrent dims, fast CPU


@pytest.fixture(scope="module")
def drnn():
    model = GAN_FFN_DialogueRNN(n_classes=6, gen_num_layers=1, **DRNN_KW)
    L0, B0 = 8, BATCH
    qm = np.zeros((L0, B0, 2), np.float32)
    qm[..., 0] = 1.0
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((L0, B0, 100), jnp.float32),
        jnp.zeros((L0, B0, 512), jnp.float32),
        jnp.zeros((L0, B0, 100), jnp.float32),
        jnp.asarray(qm),
        jnp.ones((B0, L0), jnp.float32),
    )["params"]
    return model, params


@pytest.fixture(scope="module")
def drnn_clf(drnn):
    model, params = drnn
    blob = export_dialoguernn_classifier(
        model, params, max_len=MAX_LEN, batch_size=BATCH, buckets=BUCKETS,
        platforms=("cpu", "tpu"),
    )
    return ServingClassifier.loads(blob)


def _drnn_inputs(L, B, seed=0):
    rng = np.random.default_rng(seed)
    a, v, t = (
        rng.standard_normal((L, B, d)).astype(np.float32) for d in (100, 512, 100)
    )
    qm = np.zeros((L, B, 2), np.float32)
    qm[np.arange(L)[:, None], np.arange(B)[None, :], rng.integers(0, 2, (L, B))] = 1.0
    um = np.ones((B, L), np.float32)
    return a, v, t, qm, um


def _drnn_live(drnn, a, v, t, qm, um):
    model, params = drnn
    lp, *_ = model.apply(
        {"params": params}, a, v, t, qm, um, valid_len=jnp.int32(a.shape[0])
    )
    return np.asarray(lp)


def test_drnn_meta(drnn_clf):
    assert drnn_clf.family == "gan_ffn_dialoguernn"
    assert drnn_clf.input_names == ("audio", "visual", "text", "qmask", "umask")
    assert drnn_clf.time_quantize and drnn_clf.has_valid_len


def test_drnn_artifact_matches_live_on_grid(drnn, drnn_clf):
    ins = _drnn_inputs(8, BATCH)
    np.testing.assert_allclose(
        drnn_clf.log_probs(*ins), _drnn_live(drnn, *ins), atol=1e-5, rtol=0
    )


def test_drnn_quantization_padding_is_output_preserving(drnn, drnn_clf):
    # L=5, B=2 -> padded to (8, 4) with umask/qmask zeros; the recurrent
    # stack must not leak padding into real rows (the serving-side analogue
    # of the stacked-bidir ragged-length equivalence tests).
    ins = _drnn_inputs(5, 2, seed=1)
    out = drnn_clf.log_probs(*ins)
    assert out.shape == (5, 2, 6)
    assert drnn_clf._quantized_shape(5, 2) == (8, BATCH)
    np.testing.assert_allclose(out, _drnn_live(drnn, *ins), atol=1e-5, rtol=0)


def test_drnn_wrong_tensor_count(drnn_clf):
    a, v, t, qm, um = _drnn_inputs(8, 2)
    with pytest.raises(ValueError, match="takes 5 tensors"):
        drnn_clf.log_probs(a, v, t)


def test_drnn_umask_shape_validated(drnn_clf):
    a, v, t, qm, um = _drnn_inputs(8, 2)
    with pytest.raises(ValueError, match="must agree"):
        drnn_clf.log_probs(a, v, t, qm, um.T)  # (L, B) instead of (B, L)


def test_drnn_export_forces_deterministic(drnn):
    # a training-mode model instance exports the eval-mode forward
    model, params = drnn
    train_model = GAN_FFN_DialogueRNN(
        n_classes=6, gen_num_layers=1, deterministic=False, **DRNN_KW
    )
    blob = export_dialoguernn_classifier(
        train_model, params, max_len=MAX_LEN, batch_size=BATCH, buckets=BUCKETS,
        platforms=("cpu",),
    )
    ins = _drnn_inputs(8, 2, seed=2)
    np.testing.assert_allclose(
        ServingClassifier.loads(blob).log_probs(*ins),
        _drnn_live(drnn, *ins),
        atol=1e-5, rtol=0,
    )


# ---------------------------------------------------------------------------
# MELDLSTMModel family: batch-only quantization (the backward LSTM reads
# future timesteps regardless of mask — reference model.py:543 — so time
# padding is NOT output-preserving and the loader must never apply it).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def meld():
    model = MELDLSTMModel(D_m=24, D_e=8, D_h=16, n_classes=7)
    L0, B0 = 8, BATCH
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((L0, B0, 24), jnp.float32),
        jnp.zeros((L0, B0, 9), jnp.float32),
        jnp.ones((B0, L0), jnp.float32),
    )["params"]
    return model, params


@pytest.fixture(scope="module")
def meld_clf(meld):
    model, params = meld
    blob = export_meld_classifier(
        model, params, batch_size=BATCH, platforms=("cpu", "tpu")
    )
    return ServingClassifier.loads(blob)


def _meld_inputs(L, B, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((L, B, 24)).astype(np.float32)
    qm = np.zeros((L, B, 9), np.float32)
    qm[np.arange(L)[:, None], np.arange(B)[None, :], rng.integers(0, 9, (L, B))] = 1.0
    um = np.ones((B, L), np.float32)
    return t, qm, um


def test_meld_meta_and_grid(meld_clf):
    assert meld_clf.family == "meld_lstm"
    assert meld_clf.input_names == ("text", "qmask", "umask")
    assert not meld_clf.time_quantize and not meld_clf.has_valid_len
    assert meld_clf.label_names[1] == "surprise"
    # time exact, batch quantized
    assert meld_clf._quantized_shape(13, 2) == (13, BATCH)
    assert meld_clf._quantized_shape(13, BATCH + 1) == (13, 2 * BATCH)


def test_meld_artifact_matches_live_batch_off_grid(meld, meld_clf):
    model, params = meld
    t, qm, um = _meld_inputs(13, 2, seed=3)  # off-grid time stays exact
    out = meld_clf.log_probs(t, qm, um)
    assert out.shape == (13, 2, 7)
    want, *_ = model.apply({"params": params}, t, qm, um, deterministic=True)
    np.testing.assert_allclose(out, np.asarray(want), atol=1e-5, rtol=0)


def test_meld_batch_padding_is_output_preserving(meld, meld_clf):
    # the quantized call above padded B 2 -> 4: prove the padded columns did
    # not leak by comparing against the exact-shape loader
    t, qm, um = _meld_inputs(13, 2, seed=3)
    blob = export_meld_classifier(meld[0], meld[1], batch_size=BATCH,
                                  platforms=("cpu",))
    exact = ServingClassifier.loads(blob, quantize=False)
    np.testing.assert_allclose(
        meld_clf.log_probs(t, qm, um), exact.log_probs(t, qm, um),
        atol=1e-6, rtol=0,
    )


def test_export_cli_dialoguernn_and_meld(tmp_path):
    from gan_ffn_tpu.cli import export as export_cli
    from gan_ffn_tpu.utils.checkpoint import save_params

    save_dir = tmp_path / "GAN_save"
    save_dir.mkdir()

    meld_model = MELDLSTMModel(D_m=600, D_e=300, D_h=600, n_classes=7)
    params = meld_model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((4, 2, 600), jnp.float32),
        jnp.zeros((4, 2, 9), jnp.float32),
        jnp.ones((2, 4), jnp.float32),
    )["params"]
    save_params(str(save_dir / "meld_classifier_best.msgpack"), params)
    out = tmp_path / "meld.stablehlo"
    res = export_cli.main([
        "--model", "meld", "--model-save-path", str(save_dir),
        "--output", str(out), "--batch-size", "2",
        "--platforms", "cpu", "--verify",
    ])
    assert out.exists() and res["bytes"] == out.stat().st_size
    clf = ServingClassifier.load(str(out))
    assert clf.family == "meld_lstm" and clf.meta["dims"]["text"] == 600


def test_http_server_dialoguernn_family(drnn_clf):
    from gan_ffn_tpu.cli.serve import make_handler
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(drnn_clf))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health["family"] == "gan_ffn_dialoguernn"
        assert health["inputs"] == ["audio", "visual", "text", "qmask", "umask"]

        a, v, t, qm, um = _drnn_inputs(8, 2, seed=7)
        body = json.dumps({
            "audio": a.tolist(), "visual": v.tolist(), "text": t.tolist(),
            "qmask": qm.tolist(), "umask": um.tolist(),
        }).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body, headers={"Content-Type": "application/json"}
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        want = drnn_clf.predict(a, v, t, qm, um)
        assert resp["classes"] == want.T.tolist()

        # family-required key missing -> 400
        body = json.dumps(
            {"audio": a.tolist(), "visual": v.tolist(), "text": t.tolist()}
        ).encode()
        bad = urllib.request.Request(f"{base}/predict", data=body)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_http_server_round_trip(tiny, clf, artifact, tmp_path):
    from gan_ffn_tpu.cli.serve import make_handler
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(clf))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health["status"] == "ok" and health["buckets"] == list(BUCKETS)

        a, v, t = _inputs(8, 2, seed=6)
        body = json.dumps(
            {"audio": a.tolist(), "visual": v.tolist(), "text": t.tolist()}
        ).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body, headers={"Content-Type": "application/json"}
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        want = clf.predict(a, v, t)
        assert resp["classes"] == want.T.tolist()
        assert resp["class_names"][1][3] == clf.label_names[want[3, 1]]

        # malformed requests -> 400, not a crash: missing key, wrong-rank
        # tensors (all keys present), a valid-JSON non-object body and a
        # dict tensor value (both raise TypeError, which must be caught —
        # uncaught it kills the handler thread and the client sees a
        # connection reset instead of an HTTP response)
        for payload in (
            b'{"audio": [1]}',
            json.dumps({"audio": [1.0], "visual": [1.0], "text": [1.0]}).encode(),
            b'[1, 2]',
            json.dumps({"audio": {"a": 1}, "visual": [1.0], "text": [1.0]}).encode(),
        ):
            bad = urllib.request.Request(f"{base}/predict", data=payload)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad)
            assert ei.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_http_server_concurrent_mixed_shapes(tiny, clf):
    """ThreadingHTTPServer under concurrent load: N client threads hammer
    /predict with MIXED (L, B) shapes — every response must be 200 and must
    equal that shape's single-threaded prediction (the deserialized program
    is immutable and per-shape execution caches populate under a lock;
    a race would surface as a 500, a wrong-shape answer, or a hang)."""
    from gan_ffn_tpu.cli.serve import make_handler
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(clf))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_port}"
    shapes = [(8, 2), (5, 1), (12, 3), (16, 4), (3, 2), (9, 5)]
    cases = []
    for i, (sl, sb) in enumerate(shapes):
        a, v, t = _inputs(sl, sb, seed=20 + i)
        body = json.dumps(
            {"audio": a.tolist(), "visual": v.tolist(), "text": t.tolist()}
        ).encode()
        cases.append((body, clf.predict(a, v, t).T.tolist()))

    results = {}
    errors = []

    def worker(idx):
        body, want = cases[idx % len(cases)]
        try:
            req = urllib.request.Request(
                f"{base}/predict", data=body,
                headers={"Content-Type": "application/json"},
            )
            resp = json.loads(urllib.request.urlopen(req, timeout=60).read())
            results[idx] = resp["classes"] == want
        except Exception as e:  # surface in the main thread
            errors.append((idx, repr(e)))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(18)]
    try:
        for t_ in threads:
            t_.start()
        for t_ in threads:
            t_.join(timeout=120)
        assert not errors, errors
        assert len(results) == 18 and all(results.values()), results
    finally:
        server.shutdown()
        thread.join(timeout=5)


# ---------------------------------------------------------------------------
# warmup(): precompile the quantization grid (cli/serve.py --warmup)
# ---------------------------------------------------------------------------


def test_warmup_covers_quantization_grid(artifact):
    clf = ServingClassifier.loads(artifact, batch_grid=(1, BATCH))
    timings = clf.warmup()
    assert [(L, B) for L, B, _ in timings] == [(8, 1), (8, BATCH),
                                               (16, 1), (16, BATCH)]
    assert all(secs >= 0 for *_, secs in timings)
    # the warmed shapes serve real requests (routing/padding exercised)
    a, v, t = _inputs(7, 1, seed=3)  # quantizes to (8, 1)
    assert clf.log_probs(a, v, t).shape == (7, 1, 6)


def test_warmup_defaults_to_batch_size_without_grid(clf):
    timings = clf.warmup()
    assert [(L, B) for L, B, _ in timings] == [(8, BATCH), (16, BATCH)]


def test_warmup_meld_requires_explicit_lengths(meld_clf):
    # time_quantize=False has no finite default time grid
    with pytest.raises(ValueError, match="exact time lengths"):
        meld_clf.warmup()
    timings = meld_clf.warmup(lengths=(6,))
    assert [(L, B) for L, B, _ in timings] == [(6, BATCH)]


def test_warmup_reports_quantized_shapes_and_dedupes(artifact):
    clf = ServingClassifier.loads(artifact)
    # both requested lengths route to the L=8 bucket: ONE warm, labeled
    # with the shape actually compiled, not the requested one
    timings = clf.warmup(lengths=(3, 5), batches=(2,))
    assert [(L, B) for L, B, _ in timings] == [(8, BATCH)]
    # empty explicit args on a quantizing artifact: the error must blame
    # the argument, not time_quantize
    with pytest.raises(ValueError, match="empty lengths"):
        clf.warmup(lengths=())


def test_warmup_default_covers_max_len_fallthrough(tiny):
    # buckets stop below max_len: requests with max(buckets) < L <= max_len
    # quantize to max_len, so the default warm grid must include it
    model, params = tiny
    blob = export_classifier(
        model, params, max_len=MAX_LEN, batch_size=BATCH, buckets=(8,),
        platforms=("cpu",),
    )
    clf = ServingClassifier.loads(blob)
    timings = clf.warmup()
    assert [(L, B) for L, B, _ in timings] == [(8, BATCH), (MAX_LEN, BATCH)]


# ---------------------------------------------------------------------------
# bf16 deployment variant (serving.bf16_variant, cli/export.py --dtype bf16)
# ---------------------------------------------------------------------------


def test_bf16_export_halves_weights_and_agrees(tiny, artifact):
    from gan_ffn_tpu.serving import bf16_variant

    model, params = tiny
    bmodel, bparams = bf16_variant(model, params)
    assert all(
        x.dtype == jnp.bfloat16 for x in jax.tree.leaves(bparams)
    )
    blob = export_classifier(
        bmodel, bparams, max_len=MAX_LEN, batch_size=BATCH, buckets=BUCKETS,
        platforms=("cpu", "tpu"),
    )
    # the constants dominate the artifact: bf16 should save ~half
    assert len(blob) < 0.75 * len(artifact)

    bclf = ServingClassifier.loads(blob)
    assert bclf.dtype == "bfloat16"
    a, v, t = _inputs(8, BATCH, seed=9)
    got = bclf.log_probs(a, v, t)
    assert got.dtype == np.float32  # dtype-invariant serve API

    # the artifact's contract is the live bf16 model (same computation,
    # different compile)
    want, *_ = bmodel.apply(
        {"params": bparams}, a, v, t,
        valid_len=jnp.int32(8), deterministic=True,
    )
    np.testing.assert_allclose(got, np.asarray(want, np.float32), atol=1e-2, rtol=0)

    # vs the f32 live model only resolution-scale closeness holds; argmax
    # agreement is NOT asserted here because on RANDOM weights the argmax
    # sits on near-uniform log-probs and flips with fusion order / jax
    # version — cli/export.py --verify enforces >=0.98 agreement where it
    # is meaningful, on trained checkpoints (measured 532/533 on a trained
    # tiny model)
    ref = _live(tiny, a, v, t)
    assert np.max(np.abs(got - ref)) < 5e-2


def test_f32_artifact_dtype_metadata(clf):
    assert clf.dtype == "float32"


def test_bf16_meld_variant_runs_lstm_at_bf16(meld):
    """MELDLSTMModel casts its input to the requested dtype so the 4-layer
    LSTM stack follows (nn/recurrent.py runs cells at inputs.dtype); the
    artifact must shrink and stay resolution-close to the f32 live model."""
    from gan_ffn_tpu.serving import bf16_variant

    model, params = meld
    bmodel, bparams = bf16_variant(model, params)
    f32_blob = export_meld_classifier(model, params, batch_size=BATCH,
                                      platforms=("cpu",))
    blob = export_meld_classifier(bmodel, bparams, batch_size=BATCH,
                                  platforms=("cpu",))
    assert len(blob) < 0.75 * len(f32_blob)
    bclf = ServingClassifier.loads(blob)
    assert bclf.dtype == "bfloat16"
    t, qm, um = _meld_inputs(9, 2, seed=11)
    got = bclf.log_probs(t, qm, um)
    assert got.dtype == np.float32
    want, *_ = model.apply({"params": params}, t, qm, um, deterministic=True)
    assert np.max(np.abs(got - np.asarray(want))) < 5e-2


def test_serve_cli_warmup_wiring(meld, tmp_path, monkeypatch, capsys):
    """--warmup on an exact-length (meld) artifact: no lengths -> a clean
    argparse error (exit 2, not a traceback); --warmup-lengths warms the
    parsed lengths before the server starts."""
    from gan_ffn_tpu.cli import serve as serve_cli

    model, params = meld
    blob = export_meld_classifier(model, params, batch_size=BATCH,
                                  platforms=("cpu",))
    path = tmp_path / "meld.stablehlo"
    path.write_bytes(blob)

    class FakeServer:
        def __init__(self, addr, handler):
            self.server_port = addr[1]
        def serve_forever(self):
            raise KeyboardInterrupt  # exit main() right after startup
        def shutdown(self):
            pass

    monkeypatch.setattr(serve_cli, "ThreadingHTTPServer", FakeServer)

    with pytest.raises(SystemExit) as ei:
        serve_cli.main(["--artifact", str(path), "--warmup"])
    assert ei.value.code == 2
    assert "exact time lengths" in capsys.readouterr().err

    serve_cli.main(["--artifact", str(path), "--warmup", "--warmup-lengths", "6,9"])
    out = capsys.readouterr().out
    assert f"warmup L=6 B={BATCH}" in out and f"warmup L=9 B={BATCH}" in out


# ---------------------------------------------------------------------------
# int8 weight-only quantized artifacts (serving.quantize_weights_int8,
# cli/export.py --weights int8)
# ---------------------------------------------------------------------------


def test_quantize_weights_int8_unit():
    from gan_ffn_tpu.serving import dequantize_weights, quantize_weights_int8

    rng = np.random.default_rng(0)
    tree = {
        "k": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(8,)).astype(np.float32)),
        "zero": jnp.zeros((4, 4), jnp.float32),  # all-zero channel guard
    }
    qflat, td, n = quantize_weights_int8(tree)
    assert n == 2  # the two matrices; the bias passes through
    deq = dequantize_weights(qflat, td, tree)
    np.testing.assert_array_equal(np.asarray(deq["b"]), np.asarray(tree["b"]))
    np.testing.assert_array_equal(np.asarray(deq["zero"]), 0.0)
    # per-output-channel symmetric: |error| <= scale/2 everywhere
    k = np.asarray(tree["k"])
    scale = np.abs(k).max(axis=0) / 127.0
    err = np.abs(np.asarray(deq["k"]) - k)
    assert np.all(err <= scale / 2 + 1e-7)
    assert all(q.dtype == jnp.int8 for q, s in qflat if s is not None)


def test_int8_artifact_matches_dequantized_live(tiny, artifact):
    from gan_ffn_tpu.serving import dequantize_weights, quantize_weights_int8

    model, params = tiny
    blob = export_classifier(
        model, params, max_len=MAX_LEN, batch_size=BATCH, buckets=BUCKETS,
        platforms=("cpu", "tpu"), weights_int8=True,
    )
    # the kernels dominate the artifact: int8 should save ~3/4
    assert len(blob) < 0.45 * len(artifact)
    clf8 = ServingClassifier.loads(blob)
    assert clf8.weights == "int8" and clf8.dtype == "float32"

    a, v, t = _inputs(8, 2, seed=13)
    got = clf8.log_probs(a, v, t)
    # exact contract: the live model applied to the SAME dequantized params
    # the exported program reconstructs from its int8 constants
    qf, td, _ = quantize_weights_int8(jax.device_get(params))
    pdq = dequantize_weights(qf, td, params)
    want, *_ = model.apply(
        {"params": pdq}, a, v, t, valid_len=jnp.int32(8), deterministic=True
    )
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-4, rtol=0)


def test_int8_export_cli_wiring(tiny, tmp_path):
    from gan_ffn_tpu.cli import export as export_cli
    from gan_ffn_tpu.utils.checkpoint import save_params

    model, params = tiny
    save_dir = tmp_path / "GAN_save"
    save_dir.mkdir()
    save_params(str(save_dir / "classifier_best.msgpack"), params)
    out = tmp_path / "gan_ffn_int8.stablehlo"
    # no --verify: its argmax-agreement gate is meaningful on trained
    # checkpoints, not random init (see test_bf16_export_halves_weights...)
    export_cli.main([
        "--model-save-path", str(save_dir), "--output", str(out),
        "--num-layers", "1", "--batch-size", str(BATCH),
        "--max-len", str(MAX_LEN), "--buckets", "8", "16",
        "--platforms", "cpu", "--weights", "int8",
    ])
    clf8 = ServingClassifier.load(str(out))
    assert clf8.weights == "int8"
    a, v, t = _inputs(8, 2, seed=14)
    assert clf8.predict(a, v, t).shape == (8, 2)
