"""SUPERSEDED — see bench_attention_v4.py.

This harness fixed the loop-invariant-hoisting bug but still scanned
only K=8 steps per readback: the ~30 ms axon-tunnel RTT floor (RTT/8 =
~3.3 ms/step minimum for ANY op — a bare elementwise add "measures"
3.27 ms, see bench_pallas_dma.py) drowned the real kernel differences.
bench_attention_v4.py carry-chains N=64 iterations and subtracts an
empty-loop control; its numbers are the valid ones.

Original intent: attention micro-benchmark with VARYING scan inputs
(loop-invariant inputs get hoisted by XLA and measure nothing).

Run: PYTHONPATH=/root/repo python artifacts/bench_attention.py
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


def xla_f32(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (D ** 0.5) + bias[:, :, None]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def xla_bf16(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (D ** 0.5) + bias[:, :, None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def xla_pref32(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32)
    s = s / (D ** 0.5) + bias[:, :, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def _kernel_v2(q_ref, k_ref, v_ref, bias_ref, o_ref):
    b = bias_ref[0].astype(jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / D ** 0.5) + b
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def pallas_v2(q, k, v, bias):
    qf, kf, vf = (x.reshape(B, T, H * D) for x in (q, k, v))
    spec = pl.BlockSpec((1, T, H * D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel_v2, grid=(B,), in_specs=[spec, spec, spec, bspec],
        out_specs=spec, out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
    )(qf, kf, vf, bias)
    return out.reshape(B, T, H, D)


def measure(fn, qs, ks, vs, bias):
    @jax.jit
    def run(qs, ks, vs, bias):
        def step(c, xs):
            return c + jnp.sum(fn(*xs, bias).astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), (qs, ks, vs))
        return tot

    float(run(qs, ks, vs, bias))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(qs, ks, vs, bias))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K * 1000


def main():
    rng = np.random.default_rng(0)
    # varying inputs per scan step — prevents loop-invariant hoisting
    qs = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    bias = jnp.zeros((B, 1, T), jnp.float32)

    ref = np.asarray(xla_f32(qs[0], ks[0], vs[0],
                             bias.astype(jnp.bfloat16)), np.float32)
    for name, fn in [("xla_f32", lambda q, k, v, b: xla_f32(q, k, v, b.astype(q.dtype))),
                     ("xla_bf16", lambda q, k, v, b: xla_bf16(q, k, v, b.astype(q.dtype))),
                     ("xla_pref32", xla_pref32),
                     ("pallas_v2", pallas_v2)]:
        try:
            t = measure(fn, qs, ks, vs, bias)
            d = float(np.abs(np.asarray(fn(qs[0], ks[0], vs[0], bias),
                                        np.float32) - ref).max())
            print(f"{name:12s}: {t:7.3f} ms/layer-batch  maxdiff {d:.2e}")
        except Exception as e:
            print(f"{name:12s}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
