"""Serving-artifact tests: export -> load -> predict, CLI, HTTP server.

The artifact must reproduce the live model exactly (same platform, both on
the quantization grid and off it), reject malformed inputs/blobs, and the
reference HTTP server must round-trip predictions. All on CPU with a tiny
1-layer model; platform-portability of the multi-platform export is covered
by exporting for ("cpu", "tpu") from this CPU-only process.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_ffn_tpu.models import GAN_FFN
from gan_ffn_tpu.serving import (
    ARTIFACT_MAGIC,
    ServingClassifier,
    _pack,
    _unpack,
    export_classifier,
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

        # malformed requests -> 400, not a crash: missing key, then
        # wrong-rank tensors (all keys present)
        for payload in (
            b'{"audio": [1]}',
            json.dumps({"audio": [1.0], "visual": [1.0], "text": [1.0]}).encode(),
        ):
            bad = urllib.request.Request(f"{base}/predict", data=payload)
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(bad)
            assert ei.value.code == 400
    finally:
        server.shutdown()
        thread.join(timeout=5)
