"""In-model predict-step benchmark (RTT-proof: N chained steps, one sync).

Usage: PYTHONPATH=/root/repo python artifacts/bench_model.py [component]
  component: full (default) | bert | cnn
  env BENCH_B overrides the batch size (default 256)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model

B = int(os.environ.get("BENCH_B", "256"))
N = 16


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "full"
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

    if what == "full":
        def body(v, x, ids, mask):
            return jnp.sum(model.apply(v, x, ids, mask,
                                       train=False)["probs"])
    elif what == "bert":
        def body(v, x, ids, mask):
            return jnp.sum(model.apply(
                v, ids, mask,
                method=lambda m, ii, mm: m.text_encoder(ii, mm, train=False),
            ).astype(jnp.float32))
    elif what == "cnn":
        def body(v, x, ids, mask):
            return jnp.sum(model.apply(
                v, x, method=lambda m, xx: m.cnn_encoder(xx, train=False),
            ).astype(jnp.float32))
    else:
        raise SystemExit(f"unknown component {what}")

    @jax.jit
    def run(v, x, ids, mask):
        def step(c, _):
            # every input must depend on the carry, else XLA hoists the
            # corresponding tower out of the scan (loop-invariant code
            # motion) and it gets timed once instead of N times
            xx = x + c.astype(x.dtype)
            ids2 = jnp.where(c > jnp.float32(1e30), jnp.zeros_like(ids), ids)
            return body(v, xx, ids2, mask) * 1e-12, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(variables, x, ids, mask))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(variables, x, ids, mask))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"{what}: {ms:.2f} ms/step (B={B})  -> {B / ms * 1000:.0f} pairs/s")


if __name__ == "__main__":
    main()
