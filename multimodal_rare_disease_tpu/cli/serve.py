"""Minimal HTTP serving daemon for the multimodal predictor.

The reference has no serving surface at all — inference is a
one-request-at-a-time CLI (`src/predict.py:360-408`, SURVEY §1 "no
serving daemon"). This daemon wraps the same predictor (and its JSON
contract) behind HTTP so the framework covers the production-serving
shape:

  GET  /healthz            → {"status": "ok", "mode": ..., "device": ...}
  POST /predict            → the `src/predict.py:159-188` JSON contract
       body: {"image": <path or base64 PNG/JPEG>, "text": "...",
              "top_k": 5}

Requests are served from the predictor's pre-compiled batch buckets
(fixed shapes — no per-request recompilation); stdlib http.server keeps
the daemon dependency-free. One process serves one chip; scale-out is
process-per-chip behind any HTTP load balancer.
"""

from __future__ import annotations

import argparse
import base64
import binascii
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _decode_image(spec: str):
    """Path string or base64-encoded image bytes → np.uint8 [S,S,3]."""
    import numpy as np
    from PIL import Image

    from multimodal_rare_disease_tpu.data.images import load_image_uint8

    if len(spec) < 4096 and "\n" not in spec:
        import os

        if os.path.exists(spec):
            return load_image_uint8(spec, 256)
    try:
        raw = base64.b64decode(spec, validate=True)
    except (binascii.Error, ValueError) as e:
        raise ValueError(f"image is neither an existing path nor valid "
                         f"base64: {e}") from e
    with Image.open(io.BytesIO(raw)) as im:
        im = im.convert("RGB")
        if im.size != (256, 256):
            im = im.resize((256, 256), Image.BILINEAR)
        return np.asarray(im, np.uint8)


def make_handler(predictor, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload, default=float).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                self._send(200, {"status": "ok", "mode": predictor.mode,
                                 "device": str(jax.devices()[0])})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                image = req.get("image")
                text = req.get("text", "")
                top_k = int(req.get("top_k", 5))
                img = _decode_image(image) if image is not None else None
                # the jitted predict path is not re-entrant-safe per
                # process (single device stream); serialize requests
                with lock:
                    result = predictor.predict(image=img, text=text,
                                               top_k=top_k)
                self._send(200, result)
            except Exception as e:  # noqa: BLE001 — report, don't crash
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return Handler


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Serve the predictor over HTTP")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--mode", default=None)
    args = parser.parse_args(argv)

    from multimodal_rare_disease_tpu.inference import load_predictor

    predictor = load_predictor(args.checkpoint, mode=args.mode)
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(predictor, threading.Lock()))
    print(f"serving {predictor.mode} predictor on "
          f"http://{args.host}:{args.port} (POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
