"""VERDICT-r4 #4b: measure the HBM-resident <-> streaming crossover.

Round 4 produced one streaming number (with Pallas silently disabled by
the probe-inside-jit bug, fixed in e3941a2) and a hard TPU-worker crash
on the resident side. Round 5 shipped the pre-flight HBM guard
(train/trainer.py:estimate_train_hbm_bytes). This script sweeps corpus
size N through BOTH modes on the real chip and records where the guard
draws the resident/streaming line and what each mode costs, so
docs/PERF.md and docs/TRAINING.md can state the measured crossover.

Mode forcing is by budget, the same knob a user has:
  * resident:  device_corpus_budget_gb=12 -> index mode engages whenever
    the pre-flight estimate clears 75% of HBM (the production guard
    decides, not this script).
  * streaming: device_corpus_budget_gb=0.001 -> host pipeline always.

Results accumulate in artifacts/round5/crossover.json (re-runs skip
finished cells), one timed epoch per mode after the compile epoch.

Run on the real chip: python artifacts/exp_crossover.py [N ...]
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

HERE = Path(__file__).parent
OUT = HERE / "round5"
OUT.mkdir(exist_ok=True)

from multimodal_rare_disease_tpu.cli._common import enable_compilation_cache

enable_compilation_cache()

# Reuse exp_streaming's measured-run machinery (same Trainer wiring, same
# synthetic-corpus pipeline swap) rather than duplicating it.
spec = importlib.util.spec_from_file_location("exp_streaming",
                                              HERE / "exp_streaming.py")
es = importlib.util.module_from_spec(spec)
_argv, sys.argv = sys.argv, [sys.argv[0]]  # keep es from eating our argv
spec.loader.exec_module(es)
sys.argv = _argv

SWEEP = [int(a) for a in sys.argv[1:]] or [2750, 11000, 21000, 31000]


def main() -> None:
    out = OUT / "crossover.json"
    results = json.loads(out.read_text()) if out.exists() else {}
    for n in SWEEP:
        es.N = n
        for tag, budget in (("resident", 12.0), ("streaming", 0.001)):
            key = f"{tag}_{n}"
            if key in results and "error" not in results[key]:
                print(f"{key}: cached", flush=True)
                continue
            print(f"=== {key} (budget {budget} GB) ===", flush=True)
            try:
                results[key] = es.run(budget, f"{tag}_{n}")
            except Exception as e:
                results[key] = {"mode": tag, "n_images": n,
                                "error": repr(e)[:500]}
                print(f"[{key}] FAILED: {e!r}", flush=True)
            out.write_text(json.dumps(results, indent=1))
    print("written", out)


if __name__ == "__main__":
    main()
