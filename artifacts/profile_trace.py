"""Capture a device trace of the predict step and print the top HLO ops.

Runs model_only (preprocessed inputs) for a few batches under
jax.profiler.trace, then parses the perfetto trace.json.gz, aggregating
device-track slice durations by (trimmed) op name.

Run: PYTHONPATH=/root/repo python artifacts/profile_trace.py
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model

B = 256
OUT = "/tmp/jax_trace"


def main():
    cfg = resolve_config("default")
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)
    T = cfg.data.max_text_length
    S = cfg.data.image_size

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, S, S, 3)), dtype)
    ids = jnp.asarray(rng.integers(0, cfg.text_encoder.vocab_size, (B, T),
                                   dtype=np.int32))
    mask = jnp.ones((B, T), jnp.int32)

    variables = model.init(jax.random.key(0), x[:1], ids[:1], mask[:1],
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def step(v, x, ids, mask):
        return jnp.sum(model.apply(v, x, ids, mask, train=False)["probs"])

    float(step(variables, x, ids, mask))  # compile
    os.system(f"rm -rf {OUT}")
    with jax.profiler.trace(OUT):
        for _ in range(3):
            float(step(variables, x, ids, mask))

    # parse perfetto trace
    files = glob.glob(f"{OUT}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found under", OUT)
        sys.exit(1)
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # find device-side process ids (TPU / device streams, not python host)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|/device|XLA", n, re.I)}
    print("processes:", json.dumps(pid_names, indent=1)[:500])

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        # trim ssa numbering: fusion.123 -> fusion
        key = re.sub(r"[.\d]+$", "", name)
        agg[key] += dur
        cnt[key] += 1
        total += dur

    print(f"\ntotal device time: {total:.2f} ms over 3 steps "
          f"(= {total/3:.2f} ms/step)\n")
    for k in sorted(agg, key=agg.get, reverse=True)[:30]:
        print(f"{agg[k]/3:8.3f} ms/step  x{cnt[k]//3:<4d} {k[:90]}")


if __name__ == "__main__":
    main()
