"""FFN pre-LN kernel: f32 vs bf16 dot outputs.

The shipped kernel keeps dot1/dot2 outputs in f32. The CLASSIC module
path rounds both to bf16 (Dense emits dtype): h_bf16 = x@w1 + b1, gelu
computed in f32 OF the bf16 h, y_bf16 = h@w2 + b2, residual added in
bf16. Emitting bf16 from the MXU halves the accumulator VREG traffic
and the elementwise adds — and matches the classic path's rounding
exactly (closer parity than the f32 kernel, not further).

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/bench_ffn_v5.py
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


def make_bf16(splits):
    def kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref,
               g0_ref, o0_ref, y_ref):
        tm = z_ref.shape[0]
        s = tm // splits
        dt = z_ref.dtype
        w1 = w1_ref[...]
        w2 = w2_ref[...]
        b1 = b1_ref[...].astype(dt)
        b2 = b2_ref[...].astype(dt)
        xs, hs, ys = [], [], []
        for i in range(splits):
            x = _ln_f32(z_ref[i * s:(i + 1) * s].astype(jnp.float32),
                        g0_ref[...], o0_ref[...], EPS).astype(dt)
            xs.append(x)
            hs.append(jax.lax.dot_general(
                x, w1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt) + b1)
        for i in range(splits):
            h = _gelu_f32(hs[i].astype(jnp.float32)).astype(dt)
            ys.append(jax.lax.dot_general(
                h, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt) + b2)
        for i in range(splits):
            z = (xs[i] + ys[i]).astype(jnp.float32)
            zn = _ln_f32(z, g_ref[...], o_ref[...], EPS)
            y_ref[i * s:(i + 1) * s] = zn.astype(y_ref.dtype)

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


def classic_ref(z, w1, b1, w2, b2, g, o, g0, o0):
    """The classic module path numerics exactly."""
    zf = z.astype(jnp.float32)
    mu = jnp.mean(zf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(zf), axis=-1, keepdims=True)
                      - jnp.square(mu), 0.0)
    h1 = ((zf - mu) * jax.lax.rsqrt(var + EPS) * g0 + o0).astype(z.dtype)
    hb = jnp.dot(h1, w1) + b1.astype(z.dtype)
    hf = hb.astype(jnp.float32)
    act = (0.5 * hf * (1.0 + jax.lax.erf(
        hf * np.float32(0.7071067811865476)))).astype(z.dtype)
    y = jnp.dot(act, w2) + b2.astype(z.dtype)
    zz = (h1 + y).astype(jnp.float32)
    mu2 = jnp.mean(zz, axis=-1, keepdims=True)
    var2 = jnp.maximum(jnp.mean(jnp.square(zz), axis=-1, keepdims=True)
                       - jnp.square(mu2), 0.0)
    return ((zz - mu2) * jax.lax.rsqrt(var2 + EPS) * g + o).astype(z.dtype)


def measure(fn, args, tag):
    @jax.jit
    def run(z, w1, b1, w2, b2, g, o, g0, o0):
        def step(c, _):
            y = fn(z, w1, b1 + c, w2, b2, g, o, g0, o0)
            return jnp.sum(y[:8, :8].astype(jnp.float32)) * 1e-6, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"{tag:24s}: {ms:7.3f} ms/layer-batch", flush=True)
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

    cls = np.asarray(jax.jit(classic_ref)(*args)[:512], np.float32)
    shipped = build(functools.partial(_ffn_pre_ln_kernel, eps=EPS, splits=8))
    bf = build(make_bf16(8))
    print("maxdiff shipped-f32 vs classic:",
          float(np.abs(np.asarray(shipped(*args)[:512], np.float32)
                       - cls).max()), flush=True)
    print("maxdiff bf16-dots  vs classic:",
          float(np.abs(np.asarray(bf(*args)[:512], np.float32)
                       - cls).max()), flush=True)
    measure(shipped, args, "shipped f32-dots s=8")
    measure(bf, args, "bf16-dots s=8")
    measure(build(make_bf16(4)), args, "bf16-dots s=4")
    measure(build(make_bf16(16)), args, "bf16-dots s=16")


if __name__ == "__main__":
    main()
