"""Component-aggregated device profile of the PACKED predict step —
the exact configuration the official bench ships (bench.py: real-corpus
texts first-fit-decreasing-packed into 256-token rows, eval_preprocess
included). profile_trace4.py profiles the classic bucketed forward;
this is the packed `packed_forward` path that produced the 5,068 pairs/s
number, so the margin hunt targets what actually runs.

Run on chip: python artifacts/profile_trace5.py
"""

import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from profile_trace4 import bucket  # same attribution buckets

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model
from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess

B = int(os.environ.get("BENCH_B", 256))
OUT = "/tmp/jax_trace5"


def main():
    import bench as bench_mod

    cfg = resolve_config("default")
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)

    images_np, ids_np, mask_np = bench_mod._real_corpus_batch(cfg, B, 256)
    from multimodal_rare_disease_tpu.inference.packing import pack_texts

    lens = mask_np.sum(axis=1)
    cap = max(256, -(-int(lens.max()) // 128) * 128)
    pb = pack_texts(ids_np, mask_np, capacity=cap)
    packed_args = tuple(jnp.asarray(a) for a in (
        pb.input_ids, pb.position_ids, pb.segment_ids,
        pb.query_positions, pb.doc_row, pb.doc_slot))
    x = jnp.asarray(images_np)
    ids = jnp.asarray(ids_np)
    mask = jnp.asarray(mask_np)

    variables = model.init(jax.random.key(0),
                           eval_preprocess(x[:1], cfg, dtype=dtype),
                           ids[:1], mask[:1], train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        variables)

    def step(v, x, pk):
        xi = eval_preprocess(x, cfg, dtype=dtype)
        return jnp.sum(model.apply(v, xi, *pk,
                                   method="packed_forward")["probs"])

    compiled = jax.jit(step).lower(variables, x, packed_args).compile()
    hlo = compiled.as_text()

    meta = {}
    for m in re.finditer(
            r"%?([a-z0-9_.-]+) = (\(?[a-z0-9]+\[[0-9,]*\][^ ]*)[^\n]*?"
            r"metadata=\{op_name=\"([^\"]*)\"", hlo):
        meta[m.group(1)] = (m.group(3), m.group(2))

    float(np.asarray(compiled(variables, x, packed_args)))
    os.system(f"rm -rf {OUT}")
    with jax.profiler.trace(OUT):
        for _ in range(3):
            float(np.asarray(compiled(variables, x, packed_args)))

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
    print(f"B={B} packed {pb.num_rows}x{cap}  total device (3 steps): "
          f"{total:.1f} ms = {total/3:.2f} ms/step\n")

    comp = defaultdict(float)
    comp_ops = defaultdict(list)
    for k, v in agg.items():
        path, shape = meta.get(k, ("?", "?"))
        b = bucket(path)
        comp[b] += v
        comp_ops[b].append((v, k, shape, path))
    print("== component totals (ms/step) ==")
    for b in sorted(comp, key=comp.get, reverse=True):
        print(f"{comp[b]/3:8.3f}  {b}")
    print()
    for b in sorted(comp, key=comp.get, reverse=True):
        print(f"-- {b}: {comp[b]/3:.3f} ms/step --")
        for v, k, shape, path in sorted(comp_ops[b], reverse=True)[:8]:
            p = re.sub(r"jit\(step\)/MultimodalClassifier/", "", path)
            print(f"  {v/3:7.3f} x{cnt[k]//3:<3d} {k[:40]:40s} "
                  f"{shape[:26]:26s} {p[:60]}")
        print()


if __name__ == "__main__":
    main()
