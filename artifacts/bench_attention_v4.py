"""Attention kernels vs XLA — RTT-proof harness.

Previous micro-harnesses (K=8 scan steps, one readback) were dominated by
the ~26-36 ms axon-tunnel RTT: a trivial elementwise add measured 3.27
"ms/step" — the RTT floor divided by 8. This harness carry-chains N=64
iterations (the output perturbs the next input, preventing hoisting) so
device time >> RTT, and reports (t_case - t_empty)/N.

Run: PYTHONPATH=/root/repo python artifacts/bench_attention_v4.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, D = 256, 128, 12, 64
N = 64


def xla_f32(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (D ** 0.5) \
        + bias[:, :, None].astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def xla_bf16(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (D ** 0.5) \
        + bias[:, :, None].astype(q.dtype)
    p = jax.nn.softmax(s, axis=-1)
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


def _kernel_v3a(q_ref, k_ref, v_ref, bias_ref, o_ref, *, G):
    b = bias_ref[:, 0, :][:, None, :].astype(jnp.float32)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(
            q_ref[:, :, sl], k_ref[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s * (1.0 / D ** 0.5) + b
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[:, :, sl] = jax.lax.dot_general(
            p, v_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_v3a(G):
    def fn(q, k, v, bias):
        qf, kf, vf = (x.reshape(B, T, H * D) for x in (q, k, v))
        spec = pl.BlockSpec((G, T, H * D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((G, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_v3a, G=G), grid=(B // G,),
            in_specs=[spec, spec, spec, bspec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
        )(qf, kf, vf, bias)
        return out.reshape(B, T, H, D)
    return fn


def measure(fn, q, k, v, bias, with_attn=True):
    @jax.jit
    def run(q, k, v, bias):
        def step(c, _):
            qq = q + c.astype(q.dtype)  # carry-dependence defeats hoisting
            if with_attn:
                o = fn(qq, k, v, bias)
                c2 = jnp.sum(o[:, 0, 0, 0].astype(jnp.float32)) * 1e-9
            else:
                c2 = jnp.sum(qq[:, 0, 0, 0].astype(jnp.float32)) * 1e-9
            return c2, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=N)
        return tot

    float(run(q, k, v, bias))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(q, k, v, bias))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N * 1000


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    bias = jnp.zeros((B, 1, T), jnp.float32)

    t_empty = measure(None, q, k, v, bias, with_attn=False)
    print(f"{'empty':10s}: {t_empty:7.3f} ms (loop overhead, subtracted)",
          flush=True)

    ref = np.asarray(xla_f32(q, k, v, bias), np.float32)
    cases = [("xla_f32", xla_f32), ("xla_bf16", xla_bf16),
             ("pallas_v2", pallas_v2), ("v3a_G4", make_v3a(4)),
             ("v3a_G8", make_v3a(8))]
    for name, fn in cases:
        try:
            t = measure(fn, q, k, v, bias) - t_empty
            d = float(np.abs(np.asarray(fn(q, k, v, bias), np.float32)
                             - ref).max())
            print(f"{name:10s}: {t:7.3f} ms/layer-batch  maxdiff {d:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
