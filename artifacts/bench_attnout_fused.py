"""Fused attention-output sublayer: y = LN(x + ctx @ wo + bo), Pallas vs
XLA (RTT-proof harness).

Sibling of bench_ffn_fused.py (which won +0.42 ms/layer): the attention
sublayer ends with an output projection [M,768]x[768,768] followed by
residual-add + LayerNorm — a full HBM round trip of the [M,768] context
between the dot and the LN reduce. One kernel keeps the tile in VMEM.
Expected win is smaller than the FFN's (the dot is 4x smaller) but the
residual+LN pass elimination is the same.

Run: PYTHONPATH=/root/repo python artifacts/bench_attnout_fused.py
Env: TM (rows/tile, default 512)
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H = 256, 128, 768
M = B * T
TM = int(os.environ.get("TM", "512"))
N = 24
EPS = 1e-12


def xla_attnout(ctx, x, wo, bo, g, o):
    y = jnp.dot(ctx, wo) + bo.astype(ctx.dtype)
    z = (x + y).astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    zn = (z - mu) * jax.lax.rsqrt(var + EPS)
    return (zn * g + o).astype(ctx.dtype)


def _kernel(ctx_ref, x_ref, wo_ref, bo_ref, g_ref, o_ref, y_ref):
    ctx = ctx_ref[...]
    y = jax.lax.dot_general(ctx, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = y + bo_ref[...] + x_ref[...].astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    zn = (z - mu) * jax.lax.rsqrt(var + np.float32(EPS))
    y_ref[...] = (zn * g_ref[...] + o_ref[...]).astype(y_ref.dtype)


@jax.jit
def pallas_attnout(ctx, x, wo, bo, g, o):
    m = ctx.shape[0]
    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    row = pl.BlockSpec((TM, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(m // TM,),
        in_specs=[row, row, const(H, H), const(1, H), const(1, H),
                  const(1, H)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, H), ctx.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
    )(ctx, x, wo, bo, g, o)


def measure(fn, ctx, x, args, tag):
    @jax.jit
    def run(ctx, x, *args):
        def step(c, _):
            cc = (ctx + c.astype(ctx.dtype)).astype(ctx.dtype)
            y = fn(cc, x, *args)
            return jnp.sum(y[:8, :8].astype(jnp.float32)) * 1e-6, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(ctx, x, *args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(ctx, x, *args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"{tag:16s}: {ms:7.3f} ms/layer-batch (M={M}, TM={TM})",
          flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    ctx = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dt)
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dt)
    wo = jnp.asarray(rng.normal(size=(H, H)) * 0.03, dt)
    bo = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    g = jnp.asarray(1.0 + rng.normal(size=(1, H)) * 0.05, jnp.float32)
    o = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    args = (wo, bo, g, o)

    ref = np.asarray(jax.jit(xla_attnout)(ctx[:TM], x[:TM], *args),
                     np.float32)
    got = np.asarray(pallas_attnout(ctx[:TM], x[:TM], *args), np.float32)
    print(f"maxdiff: {float(np.abs(got - ref).max()):.5f} "
          f"(ref scale {float(np.abs(ref).max()):.2f})", flush=True)

    t_x = measure(xla_attnout, ctx, x, args, "xla_attnout")
    t_p = measure(pallas_attnout, ctx, x, args, "pallas_attnout")
    print(f"delta: {t_x - t_p:+.3f} ms/layer -> x12 = "
          f"{(t_x - t_p) * 12:+.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
