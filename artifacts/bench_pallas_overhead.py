"""Isolate where the ~4ms goes in the Pallas attention kernels.

Same varying-input scan harness. Cases:
  copy      — DMA-only kernel (blocks in/out, no compute): measures
              pallas_call + pipelining overhead at attention block sizes.
  dots_only — the 12 per-head QK^T+AV dots, NO softmax (max/exp/sum).
  softmax1  — one [T,T] f32 softmax per head on a dummy score, no dots.
Run: PYTHONPATH=/root/repo python artifacts/bench_pallas_overhead.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, D = 256, 128, 12, 64
K = 8


def _copy_kernel(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = q_ref[...]


def _dots_kernel(q_ref, k_ref, v_ref, o_ref):
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = (s * (1.0 / D ** 0.5)).astype(q_ref.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _softmax_kernel(q_ref, k_ref, v_ref, o_ref):
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s = (q_ref[0, :, 0:128]).astype(jnp.float32)  # [T,128] dummy scores
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, :, sl] = p[:, :D].astype(o_ref.dtype)


def make(kernel):
    def fn(q, k, v):
        qf, kf, vf = (x.reshape(B, T, H * D) for x in (q, k, v))
        spec = pl.BlockSpec((1, T, H * D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel, grid=(B,), in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
        )(qf, kf, vf)
        return out.reshape(B, T, H, D)
    return fn


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
    qs = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    for name, kern in [("copy", _copy_kernel), ("dots_only", _dots_kernel),
                       ("softmax1", _softmax_kernel)]:
        try:
            t = measure(make(kern), qs, ks, vs)
            print(f"{name:10s}: {t:7.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
