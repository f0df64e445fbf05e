"""VERDICT-r3 #1: measure the int8 W8A8 serving path end-to-end on chip.

models/quant.py claims ~2x MXU rate on the BERT tower (~80% of inference
FLOPs) but has never been measured end-to-end. This runner:

  1. runs the OFFICIAL bench.py methodology (RTT-free scan window,
     real-corpus batch, watchdog) in subprocesses across the
     {bf16, int8} x {packed, classic} grid via the BENCH_QUANT /
     BENCH_PACKED env overrides, and
  2. measures the accuracy cost in-process: max|probs_int8 - probs_bf16|
     and top-1 agreement on the real corpus batch against the BASELINE
     +-1e-3 parity contract (BASELINE.md:26-29).

Writes artifacts/round4/int8_serving.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
OUT_DIR = REPO / "artifacts" / "round4"
OUT_DIR.mkdir(parents=True, exist_ok=True)


def run_bench(quant: int, packed: int) -> dict:
    env = dict(os.environ,
               BENCH_QUANT=str(quant),
               BENCH_PACKED=str(packed),
               BENCH_TIMEOUT_S="900")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, timeout=1200)
    line = [l for l in proc.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    r = json.loads(line)
    print(f"quant={quant} packed={packed}: {r['value']} pairs/s "
          f"p50={r['extra']['p50_batch_latency_ms']} ms", flush=True)
    return r


def parity_check() -> dict:
    """max|probs_int8 - probs_bf16| on the real corpus batch, unpacked
    classic path (both variants share every non-text-tower stage)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    import bench as bench_mod
    from multimodal_rare_disease_tpu.config import resolve_config
    from multimodal_rare_disease_tpu.models import create_model
    from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess

    dtype = jnp.bfloat16
    cfg_f = resolve_config("default")
    cfg_q = resolve_config("default", text_encoder__quantized_inference=True)
    B, S = 256, 256
    images_np, ids_np, mask_np = bench_mod._real_corpus_batch(cfg_f, B, S)
    images, ids, mask = map(jnp.asarray, (images_np, ids_np, mask_np))

    model_f = create_model(cfg_f, mode="multimodal", dtype=dtype)
    model_q = create_model(cfg_q, mode="multimodal", dtype=dtype)
    variables = model_f.init(jax.random.key(0),
                             eval_preprocess(images[:1], cfg_f, dtype=dtype),
                             ids[:1], mask[:1], train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    @jax.jit
    def fwd_f(v, img, ii, mm):
        return model_f.apply(v, eval_preprocess(img, cfg_f, dtype=dtype),
                             ii, mm, train=False)["probs"]

    @jax.jit
    def fwd_q(v, img, ii, mm):
        return model_q.apply(v, eval_preprocess(img, cfg_q, dtype=dtype),
                             ii, mm, train=False)["probs"]

    pf = np.asarray(fwd_f(variables, images, ids, mask), np.float32)
    pq = np.asarray(fwd_q(variables, images, ids, mask), np.float32)
    return {
        "max_abs_probs_delta": float(np.max(np.abs(pf - pq))),
        "mean_abs_probs_delta": float(np.mean(np.abs(pf - pq))),
        "top1_agreement": float(np.mean(pf.argmax(-1) == pq.argmax(-1))),
        "batch": B,
        "note": ("random-init params (no egress for pretrained); int8 "
                 "rounding error is weight-distribution-dependent so this "
                 "is indicative, not a release gate"),
    }


def main() -> None:
    """Resumable: each cell persists into int8_serving.json as it lands,
    so a killed run continues where it left off. Optional argv selects a
    subset: `bench Q P` (one cell) or `parity`."""
    out = OUT_DIR / "int8_serving.json"
    results = (json.loads(out.read_text()) if out.exists()
               else {"bench": {}, "parity": None})
    only = sys.argv[1:] or None
    if only is None or only[0] == "bench":
        cells = ([(int(only[1]), int(only[2]))] if only and len(only) == 3
                 else [(q, p) for q in (0, 1) for p in (1, 0)])
        for quant, packed in cells:
            key = (f"{'int8' if quant else 'bf16'}_"
                   f"{'packed' if packed else 'classic'}")
            if results["bench"].get(key):
                print(f"{key}: cached", flush=True)
                continue
            results["bench"][key] = run_bench(quant, packed)
            out.write_text(json.dumps(results, indent=2))
    if only is None or only[0] == "parity":
        print("parity check...", flush=True)
        results["parity"] = parity_check()
        out.write_text(json.dumps(results, indent=2))
        print(json.dumps(results["parity"], indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
