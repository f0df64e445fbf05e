"""HTTP serving daemon (cli.serve): contract + error handling."""

import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rare_disease_tpu.cli.serve import make_handler
from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.data.tokenizer import get_tokenizer
from multimodal_rare_disease_tpu.inference.predictor import MultimodalPredictor
from multimodal_rare_disease_tpu.models import create_model

REF_IMAGES = Path("/root/reference/data/images")


@pytest.fixture(scope="module")
def server():
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
    pred = MultimodalPredictor(cfg, v["params"], v.get("batch_stats", {}),
                               mode="multimodal", tokenizer=get_tokenizer())
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(pred, threading.Lock()))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"
    assert body["mode"] == "multimodal"


def test_predict_json_contract(server):
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


def test_predict_base64_image(server):
    from PIL import Image

    arr = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    code, body = _post(server + "/predict", {"image": b64, "text": "hi"})
    assert code == 200, body
    assert abs(sum(body["all_probabilities"].values()) - 1.0) < 1e-3


def test_predict_bad_image_is_400(server):
    code, body = _post(server + "/predict", {"image": "@@not-an-image@@",
                                             "text": "x"})
    assert code == 400
    assert "error" in body
