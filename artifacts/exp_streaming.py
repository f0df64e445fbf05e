"""VERDICT-r3 #4: put a real number behind the streaming training path.

The trainer auto-selects between the HBM-resident index-batch mode
(whole corpus in device memory; the round-2/3 numbers) and the
double-buffered streaming host pipeline (`Trainer._prefetched`) when the
corpus exceeds `training.device_corpus_budget_gb`. The streaming path
has tests but no on-chip number. Here: a synthetic 21k-image corpus
(4.13 GB u8 > the 4.0 GB default budget -> streaming engages exactly as
it would for a real user), one timed epoch per mode, writing
artifacts/round4/streaming.json.

Run on the real chip: python artifacts/exp_streaming.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.train import Trainer
from multimodal_rare_disease_tpu.train.pipeline import DataPipeline

OUT = Path(__file__).parent / os.environ.get("MRD_STREAM_DIR", "round4")
OUT.mkdir(exist_ok=True)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 21000
EPOCHS = 2  # epoch 1 pays compile; epoch 2 is the steady-state number


def make_pipeline(cfg) -> DataPipeline:
    """Real pipeline scaffolding (splits, text pool, class weights) with
    the train split swapped for a synthetic N-image corpus — so the
    measured path is byte-for-byte the production one, only bigger."""
    pipe = DataPipeline(cfg, mode="multimodal")
    rng = np.random.default_rng(0)
    side = pipe.train_images.shape[1]
    pipe.train_images = rng.integers(0, 256, (N, side, side, 3),
                                     dtype=np.uint8)
    pipe.train_labels = rng.integers(0, 10, N).astype(np.int64)
    pipe.train_samples = pipe.train_samples * (N // len(pipe.train_samples)
                                               + 1)
    pipe.train_samples = pipe.train_samples[:N]
    pipe._sampler = None  # plain permutation epochs over the N rows
    return pipe


def run(budget_gb: float, tag: str) -> dict:
    cfg = resolve_config("multimodal", {
        "data.augmentation_factor": 1,
        "training.num_epochs": EPOCHS,
        "training.early_stopping": False,
        "training.checkpoint_every_epochs": 10**6,
        "training.device_corpus_budget_gb": budget_gb,
        "training.checkpoint_dir": f"/tmp/streaming_{tag}",
    })
    pipe = make_pipeline(cfg)
    tr = Trainer(cfg, mode="multimodal", pipeline=pipe,
                 workdir=f"/tmp/streaming_{tag}")
    t0 = time.time()
    epoch_times = []

    orig = tr._train_epoch

    def timed(epoch, schedule):
        t = time.time()
        m = orig(epoch, schedule)
        epoch_times.append(time.time() - t)
        print(f"[{tag}] epoch {epoch}: {epoch_times[-1]:.1f}s "
              f"(index_mode={tr._use_index_mode})", flush=True)
        return m

    tr._train_epoch = timed
    tr.train(num_epochs=EPOCHS)
    steady = epoch_times[-1]
    return {
        "mode": tag,
        "n_images": N,
        "corpus_gb": round(N * 256 * 256 * 3 / 1e9, 2),
        "index_mode": bool(tr._use_index_mode),
        "epoch_times_s": [round(t, 1) for t in epoch_times],
        "steady_epoch_s": round(steady, 1),
        "train_pairs_per_sec": round(
            (N // cfg.training.batch_size) * cfg.training.batch_size
            / steady, 1),
        "batch_size": cfg.training.batch_size,
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    # Optional second argv: output filename (default streaming.json), so
    # the crossover run (same N through BOTH modes) lands in its own file.
    out_name = sys.argv[2] if len(sys.argv) > 2 else "streaming.json"
    out = OUT / out_name
    results = json.loads(out.read_text()) if out.exists() else {}
    for tag, budget in (("streaming", 4.0), ("hbm_resident", 8.0)):
        if tag in results:
            print(f"{tag}: cached", flush=True)
            continue
        print(f"=== {tag} (budget {budget} GB, N={N}) ===", flush=True)
        try:
            results[tag] = run(budget, tag)
        except Exception as e:  # e.g. resident mode OOM at this N
            results[tag] = {"mode": tag, "error": repr(e)[:500]}
            print(f"[{tag}] FAILED: {e!r}", flush=True)
        out.write_text(json.dumps(results, indent=1))
    print("written", out)


if __name__ == "__main__":
    main()
