"""Benchmark: multimodal predict throughput (image+text pairs/sec/chip).

Measures the flagship inference path end-to-end on device over the REAL
corpus workload: the shipped 256x256 face PNGs and their clinical
descriptions (tokenized with the framework WordPiece tokenizer) → Pallas
fused normalize → ResNet50 + BERT-base + cross-modal attention fusion →
class probabilities, batch-256 streaming, bf16 compute. The text tower
runs exactly as the predictor serves this corpus: sequence-PACKED when
the packed token count beats the length bucket by >15%
(inference/packing.py — the 75-95-token descriptions pack ~2.7 docs per
256-token row, ~30% fewer tokens/doc than the 128 bucket), classic
bucketed rows otherwise. Outputs match the unpacked forward up to f32
summation order (tests/test_packing.py).

Baseline target (BASELINE.json): >= 5,000 pairs/sec/chip on TPU v5e.
The PyTorch reference publishes no throughput numbers at all (SURVEY.md §6)
— per-sample, unbatched CPU-bound inference (`evaluate_multimodal.py:77-163`),
and its predict path pads every request to fixed 128 tokens
(`src/predict.py:111-118`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
from pathlib import Path

import numpy as np

BASELINE_PAIRS_PER_SEC = 5000.0
_CACHE = Path(__file__).resolve().parent / ".bench_cache.json"


def _emit(result: dict) -> None:
    print(json.dumps(result))
    sys.stdout.flush()


def _real_corpus_batch(cfg, B: int, S: int):
    """The real serving workload, tiled to one batch: the shipped face
    PNGs paired with their syndromes' clinical descriptions, tokenized and
    sliced to the predictor's length bucket (see `_prep_texts`). Falls
    back to synthetic u8 images / random ids if the corpus is absent."""
    from multimodal_rare_disease_tpu.config import find_image_dir
    from multimodal_rare_disease_tpu.data.clinical_text import (
        load_clinical_descriptions,
    )
    from multimodal_rare_disease_tpu.data.images import (
        load_image_uint8,
        scan_image_corpus,
    )
    from multimodal_rare_disease_tpu.data.tokenizer import get_tokenizer
    from multimodal_rare_disease_tpu.inference.predictor import (
        _LENGTH_BUCKETS,
    )

    T = cfg.data.max_text_length
    rng = np.random.default_rng(0)
    try:
        samples = scan_image_corpus(find_image_dir(cfg))
        descs = load_clinical_descriptions(cfg)
        if not samples or not descs:
            raise FileNotFoundError("empty corpus")
        images = np.stack([
            load_image_uint8(samples[i % len(samples)].path, S)
            for i in range(B)])
        texts = [
            descs.get(samples[i % len(samples)].syndrome, {}).get(
                "clinical_description", samples[i % len(samples)].syndrome)
            for i in range(B)]
        ids, mask, _ = get_tokenizer().encode_batch(texts, T)
        longest = int(mask.sum(axis=1).max())
        bucket = next((b for b in _LENGTH_BUCKETS if longest <= b < T), T)
        return images, ids[:, :bucket], mask[:, :bucket]
    except (OSError, FileNotFoundError, StopIteration):
        images = rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8)
        ids = rng.integers(0, cfg.text_encoder.vocab_size, (B, T),
                           dtype=np.int32)
        return images, ids, np.ones((B, T), np.int32)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_rare_disease_tpu.config import resolve_config
    from multimodal_rare_disease_tpu.models import create_model
    from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess

    # BENCH_QUANT=1: experiment override — serve the BERT tower via the
    # dynamic W8A8 int8 path (models/quant.py). Driver contract stays
    # bf16; this exists so artifacts/exp_int8_serving.py can measure the
    # quantized path through the exact official-bench methodology.
    quant = os.environ.get("BENCH_QUANT", "0") == "1"
    cfg = resolve_config("default",
                         text_encoder__quantized_inference=quant)
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)

    # BENCH_B: experiment override (driver contract stays batch 256)
    B, S = int(os.environ.get("BENCH_B", "256")), 256
    images_np, ids_np, mask_np = _real_corpus_batch(cfg, B, S)
    T = ids_np.shape[1]
    images = jnp.asarray(images_np)
    ids = jnp.asarray(ids_np)
    mask = jnp.asarray(mask_np)

    # mirror the predictor's packing decision (inference/packing.py)
    from multimodal_rare_disease_tpu.inference.packing import (
        pack_texts, packing_wins,
    )

    lens = mask_np.sum(axis=1)
    # BENCH_CAP: packing-row capacity override for the round-4 sweep
    # (256/384/512 — fewer, longer rows at the same 128-lane alignment)
    cap = int(os.environ.get(
        "BENCH_CAP", max(256, -(-int(lens.max()) // 128) * 128)))
    packed = (os.environ.get("BENCH_PACKED", "1") == "1"
              and packing_wins(lens, T, capacity=cap))
    if packed:
        pb = pack_texts(ids_np, mask_np, capacity=cap)
        packed_args = tuple(jnp.asarray(a) for a in (
            pb.input_ids, pb.position_ids, pb.segment_ids,
            pb.query_positions, pb.doc_row, pb.doc_slot))

    variables = model.init(jax.random.key(0),
                           eval_preprocess(images[:1], cfg, dtype=dtype),
                           ids[:1], mask[:1], train=False)
    # inference-time weight cast: halves HBM weight traffic (params are
    # f32 masters during training; predict serves bf16)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    # NOTE: over the axon tunnel, block_until_ready() does NOT synchronize
    # with device execution — only host readback does, and each call has
    # ~36 ms RTT. So: scan K batches inside ONE jit and read back a scalar,
    # amortizing the RTT into the steady-state throughput measurement
    # (K=192 ≈ 10 s per timed run at the current ~52 ms step → the RTT
    # contributes <0.2 ms/step; at K=24 it was still ~1.3 ms/step of
    # non-throughput overhead in the reported number).
    # Cap the K-fold input broadcast at ~6 GB of HBM (B=512 at K=192
    # would materialize 19 GB of u8 images and OOM the 16 GB chip).
    K = max(24, min(192, int(6e9 // (B * S * S * 3))))

    @jax.jit
    def predict_stream(variables, images_u8, input_ids, attention_mask):
        def body(carry, xs):
            img, ii, mm = xs
            x = eval_preprocess(img, cfg, dtype=dtype)
            out = model.apply(variables, x, ii, mm, train=False)
            return carry + jnp.sum(out["probs"]), ()

        total, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            (images_u8, input_ids, attention_mask))
        return total

    @jax.jit
    def predict_stream_packed(variables, images_u8, packed_k):
        # packed text arrays are scanned alongside the images — as
        # loop-invariants XLA would hoist the whole text tower out of
        # the K-loop and the number would be fiction (first run of
        # artifacts/bench_packed.py measured exactly that: 23 ms)
        def body(carry, xs):
            img, pk = xs
            x = eval_preprocess(img, cfg, dtype=dtype)
            out = model.apply(variables, x, *pk, method="packed_forward")
            return carry + jnp.sum(out["probs"]), ()

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                (images_u8, packed_k))
        return total

    imgs_k = jnp.broadcast_to(images, (K,) + images.shape)
    if packed:
        packed_k = tuple(jnp.broadcast_to(a, (K,) + a.shape)
                         for a in packed_args)
        run = lambda: float(predict_stream_packed(
            variables, imgs_k, packed_k))
    else:
        ids_k = jnp.broadcast_to(ids, (K,) + ids.shape)
        mask_k = jnp.broadcast_to(mask, (K,) + mask.shape)
        run = lambda: float(predict_stream(
            variables, imgs_k, ids_k, mask_k))

    # warmup / compile (forced to completion by scalar readback)
    run()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    pairs_per_sec = (K * B) / p50
    p50_batch_ms = p50 / K * 1000

    result = {
        "metric": "multimodal_predict_throughput",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
        "extra": {
            "batch": B,
            "p50_batch_latency_ms": round(p50_batch_ms, 2),
            "image_size": cfg.data.image_size,
            "text_tokens": T,
            "text_packing": (f"{B} docs in {pb.num_rows} x {cap} rows "
                             f"({pb.tokens_per_doc:.0f} tok/doc)"
                             if packed else "off"),
            "dtype": "int8-W8A8 text tower, bf16 rest" if quant
                     else "bfloat16",
            "device": str(jax.devices()[0]),
            "capture_ts": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        },
    }
    try:
        if B == 256 and not quant:  # don't let experiment overrides pollute the
            _CACHE.write_text(json.dumps(result))  # watchdog fallback
    except OSError:
        pass
    _emit(result)


def _fallback_result(note: str, cache_path: Path = _CACHE) -> dict:
    """The result emitted when the device never produced a fresh number:
    the last measured value (if any) marked machine-readably stale.

    Top-level ``"stale": true`` plus the cached ``extra.capture_ts``
    (when the served number was actually measured) — round 4's fallback
    was detectable only by reading a prose note. Unit-tested in
    tests/test_bench_fallback.py."""
    if cache_path.exists():
        cached = json.loads(cache_path.read_text())
    else:
        cached = {"metric": "multimodal_predict_throughput", "value": 0.0,
                  "unit": "pairs/sec/chip", "vs_baseline": 0.0, "extra": {}}
        note += "; no cached measurement available"
    cached["stale"] = True
    cached.setdefault("extra", {})["note"] = note
    return cached


def _device_responsive(budget_s: float) -> float:
    """Pre-flight probe: one tiny device computation + host readback,
    bounded by ``budget_s``. Returns the wait in seconds, or -1 on
    timeout.

    The axon tunnel QUEUES the device claim rather than failing it:
    after a clean client exit the next claim is granted in ~10 s, but
    after an unclean client death (SIGKILL'd trainer, hard-killed
    notebook kernel) the grant takes minutes — measured 414 s worst
    case, round-4's "wedge" took ~30 min. The probe therefore WAITS on
    one pending claim (the claim stays queued server-side; re-issuing
    from fresh processes only resets the queue position) instead of
    declaring a hang after a short window."""
    ok = threading.Event()
    t0 = time.time()

    def _probe():
        import jax
        import jax.numpy as jnp
        float(jnp.ones((8, 8)).sum())  # readback = the only real sync
        ok.set()

    threading.Thread(target=_probe, daemon=True).start()
    return (time.time() - t0) if ok.wait(budget_s) else -1.0


def _run_with_watchdog() -> None:
    """Run the benchmark with two layers of hang protection:

    1. A device-claim wait first (default 480 s — past the measured
       ~414 s worst-case grant delay behind an uncleanly-died client) —
       a genuinely dead tunnel fails over to the stale cached result.
    2. The full-run watchdog (default 1200 s) for anything slower than
       a hang (e.g. pathological compile) — same stale fallback."""
    probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "480"))
    timeout_s = float(os.environ.get("BENCH_TIMEOUT_S", "1200"))

    if probe_s > 0:
        waited = _device_responsive(probe_s)
        if waited < 0:
            _emit(_fallback_result(
                f"device hang: claim not granted within {probe_s:.0f}s "
                "(axon tunnel down, or a dead client's grant still "
                "held); reporting last measured value"))
            os._exit(0)
        if waited > 30:
            print(f"# device claim waited {waited:.0f}s (queued behind "
                  "a dead client's grant)", file=sys.stderr)

    done = threading.Event()

    def _work():
        try:
            main()
        finally:
            done.set()

    t = threading.Thread(target=_work, daemon=True)
    t.start()
    if done.wait(timeout_s):
        return
    _emit(_fallback_result(
        f"device hang: benchmark did not finish within {timeout_s:.0f}s "
        "(wedged axon tunnel); reporting last measured value"))
    os._exit(0)


if __name__ == "__main__":
    _run_with_watchdog()
