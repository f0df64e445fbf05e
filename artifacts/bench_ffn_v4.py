"""Pre-LN FFN kernel loop-structure experiment.

The shipped _ffn_pre_ln_kernel runs three chunk loops (LN0+dot1 | gelu+
dot2 | LN2+store). The first LN0 and the whole final LN2 loop have no
MXU work to hide under. A single software-pipelined loop
    for i: LN2+store(i-2); gelu+dot2(i-1); LN0+dot1(i)
interleaves every VPU stage between two MXU stages.

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/bench_ffn_v4.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_rare_disease_tpu.ops.pallas.ffn import (
    _ffn_pre_ln_kernel, _gelu_f32, _ln_f32,
)

B, T, H, F = 256, 128, 768, 3072
M = B * T
N = 24
EPS = 1e-12


def make_pipelined(splits):
    def kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref,
               g0_ref, o0_ref, y_ref):
        tm = z_ref.shape[0]
        s = tm // splits
        w1 = w1_ref[...]
        w2 = w2_ref[...]
        xs, hs, ys = {}, {}, {}

        def stage_a(i):  # LN0 + dot1
            x = _ln_f32(z_ref[i * s:(i + 1) * s].astype(jnp.float32),
                        g0_ref[...], o0_ref[...], EPS).astype(z_ref.dtype)
            xs[i] = x
            hs[i] = jax.lax.dot_general(
                x, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def stage_b(i):  # gelu + dot2
            h = _gelu_f32(hs[i] + b1_ref[...]).astype(z_ref.dtype)
            ys[i] = jax.lax.dot_general(
                h, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def stage_c(i):  # residual + LN2 + store
            z = ys[i] + b2_ref[...] + xs[i].astype(jnp.float32)
            zn = _ln_f32(z, g_ref[...], o_ref[...], EPS)
            y_ref[i * s:(i + 1) * s] = zn.astype(y_ref.dtype)

        for i in range(splits + 2):
            if i < splits:
                stage_a(i)
            if 1 <= i < splits + 1:
                stage_b(i - 1)
            if i >= 2:
                stage_c(i - 2)

    return kernel


def build(kernel_fn, tm=512):
    @jax.jit
    def fn(z, w1, b1, w2, b2, g, o, g0, o0):
        const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                        memory_space=pltpu.VMEM)
        row = pl.BlockSpec((tm, H), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel_fn,
            grid=(M // tm,),
            in_specs=[row, const(H, F), const(1, F), const(F, H),
                      const(1, H), const(1, H), const(1, H),
                      const(1, H), const(1, H)],
            out_specs=row,
            out_shape=jax.ShapeDtypeStruct((M, H), z.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 << 20),
        )(z, w1, b1, w2, b2, g, o, g0, o0)

    return fn


def measure(fn, args, tag):
    @jax.jit
    def run(z, w1, b1, w2, b2, g, o, g0, o0):
        def step(c, _):
            y = fn(z, w1, b1 + c, w2, b2, g, o, g0, o0)
            return jnp.sum(y[:8, :8].astype(jnp.float32)) * 1e-6, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    try:
        float(run(*args))
    except Exception as e:
        print(f"{tag:28s}: FAILED {str(e)[:90]}", flush=True)
        return None
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"{tag:28s}: {ms:7.3f} ms/layer-batch", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    z = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dt)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.03, dt)
    b1 = jnp.asarray(rng.normal(size=(1, F)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.03, dt)
    b2 = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    g = jnp.asarray(1.0 + rng.normal(size=(1, H)) * 0.05, jnp.float32)
    o = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    g0 = jnp.asarray(1.0 + rng.normal(size=(1, H)) * 0.05, jnp.float32)
    o0 = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    args = (z, w1, b1, w2, b2, g, o, g0, o0)

    shipped = build(functools.partial(_ffn_pre_ln_kernel, eps=EPS, splits=8))
    ref = np.asarray(shipped(*args)[:256], np.float32)
    measure(shipped, args, "shipped 3-loop s=8")
    for s in (4, 8, 16):
        fn = build(make_pipelined(s))
        m = measure(fn, args, f"pipelined s={s}")
        if m is not None:
            d = float(np.abs(np.asarray(fn(*args)[:256], np.float32)
                             - ref).max())
            if d > 1e-6:
                print(f"  maxdiff vs shipped: {d:.2e}")


if __name__ == "__main__":
    main()
