"""Round-3 component isolation: where did the T=96 savings go?

Measures (RTT-proof chained-scan harness, N=24):
  model@128 : model.apply only, preprocessed input, T=128
  model@96  : same at T=96
  prep_pallas : eval_preprocess u8->bf16 224 crop, use_pallas=True
  prep_xla    : same with use_pallas=False
  full@96   : eval_preprocess(pallas) + model at T=96 (the bench path)
  full@96x  : eval_preprocess(xla) + model at T=96

Run on the real chip: python artifacts/bench_components_r3.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model
from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess

B, N = 256, 24


def measure(fn, *args):
    @jax.jit
    def run(*args):
        def step(c, _):
            o = fn(c, *args)
            return o, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N * 1000


def main():
    cfg = resolve_config("default")
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)
    S = cfg.data.image_size
    rng = np.random.default_rng(0)
    img_u8 = jnp.asarray(rng.integers(0, 256, (B, 256, 256, 3),
                                      dtype=np.uint8))
    x = jnp.asarray(rng.normal(size=(B, S, S, 3)) * 0.5, dtype)

    def make_inputs(T):
        ids = jnp.asarray(rng.integers(0, cfg.text_encoder.vocab_size,
                                       (B, T), dtype=np.int32))
        mask = jnp.ones((B, T), jnp.int32)
        return ids, mask

    v = model.init(jax.random.key(0), x[:1], *[a[:1] for a in make_inputs(128)],
                   train=False)
    v = jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, v)

    for T in (128, 96):
        ids, mask = make_inputs(T)

        def model_only(c, v, x, ids, mask):
            out = model.apply(v, x + c.astype(x.dtype), ids, mask,
                              train=False)
            return c + jnp.sum(out["probs"])

        print(f"model@{T}    : {measure(model_only, v, x, ids, mask):7.2f} ms",
              flush=True)

    for name, up in (("prep_pallas", True), ("prep_xla", False)):
        def prep(c, img):
            xx = eval_preprocess(
                (img + c.astype(jnp.uint8)), cfg, dtype=dtype, use_pallas=up)
            return c + jnp.sum(xx[:, 0, 0, :].astype(jnp.float32))

        print(f"{name:12s}: {measure(prep, img_u8):7.2f} ms", flush=True)

    ids, mask = make_inputs(96)
    for name, up in (("full@96", True), ("full@96x", False)):
        def full(c, v, img, ids, mask):
            xx = eval_preprocess(
                (img + c.astype(jnp.uint8)), cfg, dtype=dtype, use_pallas=up)
            out = model.apply(v, xx, ids, mask, train=False)
            return c + jnp.sum(out["probs"])

        print(f"{name:12s}: {measure(full, v, img_u8, ids, mask):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
