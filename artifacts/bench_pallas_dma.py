"""Characterize Pallas DMA throughput at attention-like shapes.

copy_G<n>   — copy q (3 inputs fetched, 1 output) with blocks [G,T,768].
copy1_G<n>  — copy q with q as the ONLY input.
xla_add1    — jnp baseline touching the same q bytes.
Run: PYTHONPATH=/root/repo python artifacts/bench_pallas_dma.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, HD = 256, 128, 768
K = 8


def _copy(q_ref, o_ref):
    o_ref[...] = q_ref[...]


def _copy3(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...]


def make_copy(G, ninputs):
    spec = pl.BlockSpec((G, T, HD), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def fn(q, k, v):
        if ninputs == 3:
            return pl.pallas_call(
                _copy3, grid=(B // G,), in_specs=[spec] * 3, out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
            )(q, k, v)
        return pl.pallas_call(
            _copy, grid=(B // G,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        )(q)
    return fn


def xla_add1(q, k, v):
    return q + jnp.bfloat16(1)


def measure(fn, qs, ks, vs):
    @jax.jit
    def run(qs, ks, vs):
        def step(c, xs):
            return c + jnp.sum(fn(*xs).astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), (qs, ks, vs))
        return tot

    float(run(qs, ks, vs))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(qs, ks, vs))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K * 1000


def main():
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.normal(size=(K, B, T, HD)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(K, B, T, HD)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(K, B, T, HD)), jnp.bfloat16)
    cases = [("xla_add1", xla_add1)]
    for G in (1, 8, 32):
        cases.append((f"copy1_G{G}", make_copy(G, 1)))
        cases.append((f"copy3_G{G}", make_copy(G, 3)))
    for name, fn in cases:
        try:
            t = measure(fn, qs, ks, vs)
            print(f"{name:10s}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
