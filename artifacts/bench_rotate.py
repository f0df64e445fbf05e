"""RTT-proof benchmark of the 3-shear rotation + full train_preprocess.

Round 1 parked online rotation after measuring "~2 s/step" — with the
K=8 scan harness whose readings were dominated by the ~30 ms tunnel RTT
and loop-invariant hoisting. Re-measure with carry-chained inputs.

Run: python artifacts/bench_rotate.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.ops.preprocess import train_preprocess
from multimodal_rare_disease_tpu.ops.rotate import rotate_batch

B, S = 256, 256
N = 32


def measure(fn, *args):
    @jax.jit
    def run(*args):
        def step(c, _):
            x0 = args[0] + c.astype(args[0].dtype)
            out = fn(x0, *args[1:])
            return jnp.sum(out.astype(jnp.float32)) * 1e-12, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=N)
        return tot

    float(run(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N * 1000


def main():
    rng = np.random.default_rng(0)
    img_f32 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    img_bf16 = img_f32.astype(jnp.bfloat16)
    angles = jnp.asarray(rng.uniform(-0.26, 0.26, (B,)), jnp.float32)

    t = measure(lambda x: rotate_batch(x, angles), img_f32)
    print(f"rotate_batch f32  @256: {t:7.2f} ms/batch", flush=True)
    t = measure(lambda x: rotate_batch(x, angles), img_bf16)
    print(f"rotate_batch bf16 @256: {t:7.2f} ms/batch", flush=True)

    u8 = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.uint8)
    key = jax.random.key(0)
    for rot in (False, True):
        cfg = resolve_config(overrides={"data.online_rotation": rot})
        t = measure(lambda x: train_preprocess(x, key, cfg, jnp.bfloat16), u8)
        print(f"train_preprocess(online_rotation={rot}): {t:7.2f} ms/batch",
              flush=True)


if __name__ == "__main__":
    main()
