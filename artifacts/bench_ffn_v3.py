"""FFN kernel stage-stagger experiment: can gelu/LN VPU work overlap
the MXU dots of the other row-half?

The chain dot1 -> gelu -> dot2 -> LN is serial by data within one tile.
Splitting the TM rows into S interleaved halves and ordering the
instruction stream as h_a, h_b, g_a, y_a, g_b, y_b, ln_a, ln_b gives
Mosaic's scheduler the chance to run VPU stages of one half under MXU
stages of the other. gelu=identity ablation bounds the available win at
~0.2 ms/layer (artifacts/round3/ffn_ablation.log).

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/bench_ffn_v3.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, F = 256, 128, 768, 3072
M = B * T
N = 24
EPS = 1e-12
_SQRT1_2 = np.float32(0.7071067811865476)


def _erf_poly(x):
    a1, a2, a3 = np.float32(0.254829592), np.float32(-0.284496736), \
        np.float32(1.421413741)
    a4, a5, p = np.float32(-1.453152027), np.float32(1.061405429), \
        np.float32(0.3275911)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(xf):
    return 0.5 * xf * (1.0 + _erf_poly(xf * _SQRT1_2))


def make_kernel(splits):
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, y_ref):
        tm = x_ref.shape[0]
        s = tm // splits
        xs = [x_ref[i * s:(i + 1) * s] for i in range(splits)]
        w1 = w1_ref[...]
        w2 = w2_ref[...]
        # stage-staggered: issue dot1 for ALL halves first, then walk the
        # gelu->dot2->LN chain half by half so each half's VPU work can
        # hide under the next half's MXU work.
        hs = [jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
              for x in xs]
        ys = []
        for i in range(splits):
            g = _gelu(hs[i] + b1_ref[...]).astype(x_ref.dtype)
            ys.append(jax.lax.dot_general(
                g, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        for i in range(splits):
            z = ys[i] + b2_ref[...] + xs[i].astype(jnp.float32)
            mu = jnp.mean(z, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
            zn = (z - mu) * jax.lax.rsqrt(var + np.float32(EPS))
            y_ref[i * s:(i + 1) * s] = \
                (zn * g_ref[...] + o_ref[...]).astype(y_ref.dtype)

    return kernel


def build(splits=1, tm=512):
    @jax.jit
    def fn(x, w1, b1, w2, b2, g, o):
        const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                        memory_space=pltpu.VMEM)
        row = pl.BlockSpec((tm, H), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            make_kernel(splits),
            grid=(M // tm,),
            in_specs=[row, const(H, F), const(1, F), const(F, H),
                      const(1, H), const(1, H), const(1, H)],
            out_specs=row,
            out_shape=jax.ShapeDtypeStruct((M, H), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 << 20),
        )(x, w1, b1, w2, b2, g, o)

    return fn


def measure(fn, args, tag):
    @jax.jit
    def run(x, w1, b1, w2, b2, g, o):
        def step(c, _):
            y = fn(x, w1, b1 + c, w2, b2, g, o)
            return jnp.sum(y[:8, :8].astype(jnp.float32)) * 1e-6, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    try:
        float(run(*args))
    except Exception as e:
        print(f"{tag:24s}: FAILED {str(e)[:90]}", flush=True)
        return None
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
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dt)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.03, dt)
    b1 = jnp.asarray(rng.normal(size=(1, F)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.03, dt)
    b2 = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    g = jnp.asarray(1.0 + rng.normal(size=(1, H)) * 0.05, jnp.float32)
    o = jnp.asarray(rng.normal(size=(1, H)) * 0.01, jnp.float32)
    args = (x, w1, b1, w2, b2, g, o)

    base = build()
    ref = np.asarray(base(*args)[:256], np.float32)
    measure(base, args, "base TM=512")
    for splits, tm in ((4, 512), (8, 512), (16, 512), (8, 1024), (4, 256)):
        fn = build(splits, tm)
        m = measure(fn, args, f"stagger s={splits} TM={tm}")
        if m is not None:
            got = np.asarray(fn(*args)[:256], np.float32)
            d = float(np.abs(got - ref).max())
            if d > 1e-6:
                print(f"  maxdiff vs base: {d:.2e}")


if __name__ == "__main__":
    main()
