"""Attributed device profile: trace slices joined to HLO metadata.

profile_trace.py's name-trimming collapsed everything into 'fusion' /
'convert_reduce_fusion'; this version keeps exact op names and joins them
to the op_name metadata (flax module path) parsed from the optimized HLO,
so each hot op is attributed to model components.

Run on chip: BENCH_T=96 python artifacts/profile_trace3.py
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
OUT = "/tmp/jax_trace3"


def main():
    overrides = {}
    if "MRD_FLAT" in os.environ:
        overrides["text_encoder.flat_residual"] = \
            os.environ["MRD_FLAT"] == "1"
    cfg = resolve_config("default", overrides)
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)
    T = int(os.environ.get("BENCH_T", cfg.data.max_text_length))
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

    def step(v, x, ids, mask):
        return jnp.sum(model.apply(v, x, ids, mask, train=False)["probs"])

    compiled = jax.jit(step).lower(variables, x, ids, mask).compile()
    hlo = compiled.as_text()

    # op -> (metadata op_name, shape) from the optimized HLO
    meta = {}
    for m in re.finditer(
            r"%?([a-z0-9_.-]+) = (\(?[a-z0-9]+\[[0-9,]*\][^ ]*)[^\n]*?"
            r"metadata=\{op_name=\"([^\"]*)\"", hlo):
        meta[m.group(1)] = (m.group(3), m.group(2))

    float(np.asarray(compiled(variables, x, ids, mask)))
    os.system(f"rm -rf {OUT}")
    with jax.profiler.trace(OUT):
        for _ in range(3):
            float(np.asarray(compiled(variables, x, ids, mask)))

    files = glob.glob(f"{OUT}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|/device|XLA", n, re.I)}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        agg[name] += e.get("dur", 0) / 1e3
        cnt[name] += 1

    total = sum(agg.values())
    print(f"total device (3 steps): {total:.1f} ms = {total/3:.2f} ms/step\n")
    shown = 0.0
    for k in sorted(agg, key=agg.get, reverse=True)[:45]:
        path, shape = meta.get(k, ("?", "?"))
        # compress the flax path
        path = re.sub(r"jit\(step\)/MultimodalClassifier/", "", path)
        path = re.sub(r"/jit\(_?[a-z_]+\)", "", path)
        shown += agg[k]
        print(f"{agg[k]/3:7.3f} ms  x{cnt[k]//3:<3d} {k[:44]:44s} "
              f"{shape[:24]:24s} {path[:70]}")
    print(f"\nshown: {shown/3:.2f} ms/step of {total/3:.2f}")


if __name__ == "__main__":
    main()
