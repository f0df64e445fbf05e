"""Dump optimized HLO of the predict step; print the hot fusion bodies.

Run: python artifacts/dump_hlo.py [pattern]
"""

import os
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model

B = 256


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else "convert_reduce_fusion"
    cfg = resolve_config("default")
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)
    T = int(os.environ.get("BENCH_T", cfg.data.max_text_length))
    S = cfg.data.image_size

    x = jnp.zeros((B, S, S, 3), dtype)
    ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    variables = model.init(jax.random.key(0), x[:1], ids[:1], mask[:1],
                           train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables)

    def step(v, x, ids, mask):
        return jnp.sum(model.apply(v, x, ids, mask, train=False)["probs"])

    txt = jax.jit(step).lower(variables, x, ids, mask).compile().as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"wrote /tmp/step_hlo.txt ({len(txt)} chars)")

    # print the first fusion computation matching the pattern
    lines = txt.splitlines()
    printing = 0
    shown = 0
    for i, ln in enumerate(lines):
        if re.search(rf"%fused_computation.*{pat}|^%{pat}", ln):
            pass
        if re.match(rf"%?{pat}[.\d]*\s*\(", ln.strip()) or \
           (pat in ln and "fusion(" in ln and "calls=" in ln):
            print(ln.strip()[:400])
            shown += 1
            if shown > 3:
                break


if __name__ == "__main__":
    main()
