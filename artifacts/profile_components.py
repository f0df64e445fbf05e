"""Component-level timing breakdown of the predict path on the real chip.

Uses the same scan-amortized measurement as bench.py (host readback is the
only sync over the axon tunnel; scanning K batches inside one jit amortizes
the ~36 ms RTT). Run: python artifacts/profile_components.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model
from multimodal_rare_disease_tpu.ops.preprocess import eval_preprocess

K = 8
B, S = 256, 256


def measure(fn, *args, reps=5):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K * 1000  # ms per batch


def main():
    cfg = resolve_config("default")
    dtype = jnp.bfloat16
    model = create_model(cfg, mode="multimodal", dtype=dtype)
    T = cfg.data.max_text_length

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (B, S, S, 3), dtype=np.uint8))
    ids = jnp.asarray(rng.integers(0, cfg.text_encoder.vocab_size, (B, T),
                                   dtype=np.int32))
    mask = jnp.ones((B, T), jnp.int32)

    variables = model.init(jax.random.key(0),
                           eval_preprocess(images[:1], cfg, dtype=dtype),
                           ids[:1], mask[:1], train=False)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, variables)

    imgs_k = jnp.broadcast_to(images, (K,) + images.shape)
    ids_k = jnp.broadcast_to(ids, (K,) + ids.shape)
    mask_k = jnp.broadcast_to(mask, (K,) + mask.shape)
    x224 = eval_preprocess(images, cfg, dtype=dtype)
    x224_k = jnp.broadcast_to(x224, (K,) + x224.shape)
    jax.block_until_ready(x224_k)

    def scan_over(body):
        # `variables` is passed explicitly (never closed over): captured
        # weights get embedded in the compile payload, which overflows the
        # axon remote-compile request limit at 110M params.
        @jax.jit
        def run(variables, *xs):
            def step(c, x):
                return c + body(variables, *x), ()
            tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), xs)
            return tot
        return run

    results = {}

    # 1. preprocess only
    f = scan_over(lambda v, im: jnp.sum(
        eval_preprocess(im, cfg, dtype=dtype).astype(jnp.float32)))
    results["eval_preprocess"] = measure(f, variables, imgs_k)

    # 2. full model on preprocessed images
    f = scan_over(lambda v, x, ii, mm: jnp.sum(model.apply(
        v, x, ii, mm, train=False)["probs"]))
    results["model_only"] = measure(f, variables, x224_k, ids_k, mask_k)

    # 3. full path (preprocess + model)
    f = scan_over(lambda v, im, ii, mm: jnp.sum(model.apply(
        v, eval_preprocess(im, cfg, dtype=dtype), ii, mm,
        train=False)["probs"]))
    results["full_predict"] = measure(f, variables, imgs_k, ids_k, mask_k)

    # 4. CNN encoder only
    try:
        f = scan_over(lambda v, x: jnp.sum(model.apply(
            v, x, method=lambda m, x: m.cnn_encoder(x, train=False)
        ).astype(jnp.float32)))
        results["cnn_resnet50"] = measure(f, variables, x224_k)
    except Exception as e:
        results["cnn_resnet50"] = f"ERR {e}"

    # 5. text encoder only
    try:
        f = scan_over(lambda v, ii, mm: jnp.sum(model.apply(
            v, ii, mm, method=lambda m, ii, mm: m.text_encoder(
                ii, mm, train=False)).astype(jnp.float32)))
        results["bert_base_128"] = measure(f, variables, ids_k, mask_k)
    except Exception as e:
        results["bert_base_128"] = f"ERR {e}"

    results["batch"] = B
    print(json.dumps(results, indent=2, default=str))


if __name__ == "__main__":
    main()
