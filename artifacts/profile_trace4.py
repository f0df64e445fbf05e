"""Component-aggregated device profile of the predict forward step.

Extends profile_trace3.py: every device op is attributed to a model
component bucket (cnn stage / bert sublayer / fusion / head / other) via
the op_name metadata from the optimized HLO, and ALL rows are aggregated
so nothing hides in the tail.

Run on chip: python artifacts/profile_trace4.py
"""

import glob
import gzip
import json
import os
import re
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model

B = int(os.environ.get("BENCH_B", 256))
OUT = "/tmp/jax_trace4"


def bucket(path: str) -> str:
    if "cnn_encoder" in path:
        m = re.search(r"(stem|stage\d|reduce_window|head|projection)", path)
        return f"cnn/{m.group(1)}" if m else "cnn/other"
    if "text_encoder" in path:
        m = re.search(r"layer(\d+)/(\w+)", path)
        if m:
            part = m.group(2)
            if part in ("attention",):
                sub = "attn"
                if "qkv" in path:
                    sub = "qkv"
                elif "output" in path:
                    sub = "attn_out"
                return f"bert/{sub}"
            if "pallas" in path or part in ("intermediate", "output",
                                            "output_ln"):
                return "bert/ffn"
            return f"bert/{part}"
        if "embedding" in path:
            return "bert/embed"
        if "pooler" in path:
            return "bert/pooler"
        return "bert/other"
    if "fusion" in path:
        return "fusion"
    if "classifier" in path or "head" in path:
        return "head"
    return "other"


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
    # MRD_PREPROC=1: profile the full bench-equivalent step including
    # eval_preprocess (u8 256x256 -> resample 224 -> normalize)
    preproc = os.environ.get("MRD_PREPROC") == "1"
    if preproc:
        from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess
        x = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3)), jnp.uint8)
        x0 = eval_preprocess(x[:1], cfg, dtype=dtype)
    else:
        x = jnp.asarray(rng.normal(size=(B, S, S, 3)), dtype)
        x0 = x[:1]
    ids = jnp.asarray(rng.integers(0, cfg.text_encoder.vocab_size, (B, T),
                                   dtype=np.int32))
    mask = jnp.ones((B, T), jnp.int32)
    variables = model.init(jax.random.key(0), x0, ids[:1], mask[:1],
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables)

    def step(v, x, ids, mask):
        if preproc:
            x = eval_preprocess(x, cfg, dtype=dtype)
        return jnp.sum(model.apply(v, x, ids, mask, train=False)["probs"])

    compiled = jax.jit(step).lower(variables, x, ids, mask).compile()
    hlo = compiled.as_text()

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
    print(f"B={B} T={T}  total device (3 steps): {total:.1f} ms "
          f"= {total/3:.2f} ms/step\n")

    # component aggregation over ALL ops
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
