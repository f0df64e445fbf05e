"""VERDICT-r3 #5: widen the perf margin — three cheap follow-ups scoped
in PERF_R3.md, measured through the official bench methodology:

  * packing-capacity sweep (256 / 384 / 512 rows): fewer, longer rows at
    the same 128-lane alignment — fewer packed rows per batch but a
    bigger attention T per row.
  * B=512 clean retest (the round-3 attempt OOMed before the adaptive-K
    fix landed; PERF_R3.md expected <1%).
  * serve-daemon throughput: the HTTP surface (MicroBatcher ->
    predict_batch with packing inherited) has no number at all.

Writes artifacts/round4/perf_wideners.json (resumable per cell).

Run on the real chip: python artifacts/exp_perf_wideners.py [cell...]
cells: cap384 cap512 b512 serve
"""

from __future__ import annotations

import base64
import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT_DIR = REPO / "artifacts" / "round4"
OUT_DIR.mkdir(parents=True, exist_ok=True)
OUT = OUT_DIR / "perf_wideners.json"


def bench(env_extra: dict) -> dict:
    env = dict(os.environ, BENCH_TIMEOUT_S="900", **env_extra)
    proc = subprocess.run([sys.executable, str(REPO / "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=1200)
    line = [l for l in proc.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    r = json.loads(line)
    print(f"{env_extra}: {r['value']} pairs/s "
          f"p50={r['extra']['p50_batch_latency_ms']} ms "
          f"packing={r['extra']['text_packing']}", flush=True)
    return r


def serve_bench() -> dict:
    """Drive the HTTP daemon with concurrent clients over the real
    corpus; report request throughput and per-request latency. The
    daemon and the load generator share this host — the number is a
    floor (client CPU + HTTP parsing included), not a device ceiling."""
    import http.client

    from multimodal_rare_disease_tpu.config import (
        find_image_dir, resolve_config,
    )
    from multimodal_rare_disease_tpu.data.clinical_text import (
        load_clinical_descriptions,
    )
    from multimodal_rare_disease_tpu.data.images import scan_image_corpus

    cfg = resolve_config("default")
    samples = scan_image_corpus(find_image_dir(cfg))
    descs = load_clinical_descriptions(cfg)
    reqs = []
    for s in samples[:32]:
        raw = Path(s.path).read_bytes()
        text = descs.get(s.syndrome, {}).get("clinical_description",
                                             s.syndrome)
        reqs.append(json.dumps({
            "image": base64.b64encode(raw).decode(),
            "text": text, "top_k": 3}))

    ckpt = next((str(p) for p in (
        REPO / "checkpoints" / "multimodal_best",
        Path("/tmp/mrd_workflow/checkpoints/multimodal_best"),
    ) if p.exists()), None)
    if ckpt is None:
        raise RuntimeError("no multimodal checkpoint yet — run the "
                           "workflow notebook / cli.train first")
    cmd = [sys.executable, "-m", "multimodal_rare_disease_tpu.cli.serve",
           "--checkpoint", ckpt, "--port", "8741", "--window-ms", "5"]
    server = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                              stderr=subprocess.STDOUT)
    try:
        for _ in range(600):  # model build + first compile can take ~60s
            try:
                c = http.client.HTTPConnection("127.0.0.1", 8741, timeout=2)
                c.request("GET", "/healthz")
                if c.getresponse().status == 200:
                    break
            except OSError:
                time.sleep(1)
        else:
            raise RuntimeError("serve daemon never became healthy")

        # one warm-up volley compiles the batch buckets
        def post(payload: str) -> float:
            t0 = time.perf_counter()
            c = http.client.HTTPConnection("127.0.0.1", 8741, timeout=300)
            c.request("POST", "/predict", body=payload,
                      headers={"Content-Type": "application/json"})
            r = c.getresponse()
            body = r.read()
            assert r.status == 200, body[:200]
            return time.perf_counter() - t0

        post(reqs[0])

        lat: list = []
        lock = threading.Lock()
        N_CLIENTS, N_REQ = 16, 8

        def client(ci: int):
            for i in range(N_REQ):
                d = post(reqs[(ci * N_REQ + i) % len(reqs)])
                with lock:
                    lat.append(d)

        t0 = time.perf_counter()
        ts = [threading.Thread(target=client, args=(i,))
              for i in range(N_CLIENTS)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        wall = time.perf_counter() - t0
        lat.sort()
        n = len(lat)
        return {
            "checkpoint": ckpt or "random-init",
            "concurrent_clients": N_CLIENTS,
            "requests": n,
            "wall_s": round(wall, 2),
            "requests_per_sec": round(n / wall, 1),
            "p50_latency_ms": round(lat[n // 2] * 1000, 1),
            "p95_latency_ms": round(lat[int(n * 0.95)] * 1000, 1),
            "note": "same-host client; includes HTTP + base64 + PNG decode",
        }
    finally:
        server.terminate()
        server.wait(timeout=10)


CELLS = {
    "cap384": lambda: bench({"BENCH_CAP": "384"}),
    "cap512": lambda: bench({"BENCH_CAP": "512"}),
    "b512": lambda: bench({"BENCH_B": "512"}),
    "serve": serve_bench,
}


def main():
    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    todo = sys.argv[1:] or list(CELLS)
    for cell in todo:
        if results.get(cell):
            print(f"{cell}: cached", flush=True)
            continue
        print(f"=== {cell} ===", flush=True)
        results[cell] = CELLS[cell]()
        OUT.write_text(json.dumps(results, indent=1))
    print("written", OUT)


if __name__ == "__main__":
    main()
