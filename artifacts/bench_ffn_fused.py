"""Fused BERT FFN sublayer: Pallas vs XLA (RTT-proof harness).

Motivation (profile, artifacts/profile_trace3.py @ B=256/T=128): the FFN
input projection runs at 73% MFU and the output projection+LN fusion at
93%, with the exact-erf f32 GELU over the [32768, 3072] intermediate
fused as matmul prologue/epilogue VPU work that stalls the MXU, plus a
full HBM round-trip of the 201 MB intermediate. A Pallas kernel that
computes the whole post-LN sublayer

    y = LN(x + gelu(x @ w1 + b1) @ w2 + b2)

tile-by-tile over M = B*T keeps the intermediate in VMEM, overlaps the
GELU/LN VPU work with the next tile's MXU work (Mosaic pipelines the
grid), and skips the separate residual+LN HBM pass.

Variants (env toggles; compile on the tunnel is ~minutes each):
  TM     rows per grid step (default 512)
  MODE   ffn    = gelu-FFN only (residual+LN stay in XLA)
         ffnln  = full sublayer incl. residual + LayerNorm
Numerics gate: compiled-vs-XLA max|d| printed first (bf16 tolerance).

Run: PYTHONPATH=/root/repo python artifacts/bench_ffn_fused.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, F = 256, 128, 768, 3072
M = B * T
TM = int(os.environ.get("TM", "512"))
MODE = os.environ.get("MODE", "ffnln")
N = 24  # carry-chained iterations per timed run
EPS = 1e-12


def _gelu_f32(xf):
    return 0.5 * xf * (1.0 + jax.lax.erf(xf * np.float32(0.7071067811865476)))


def _erf_poly(x):
    """f32 erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7 — exact at
    bf16). Mosaic has no erf lowering (NotImplementedError), so the
    kernel carries its own short polynomial: 1 exp, 1 reciprocal, ~10
    mul/add, matching lax.erf's XLA cost class."""
    a1, a2, a3 = np.float32(0.254829592), np.float32(-0.284496736), \
        np.float32(1.421413741)
    a4, a5, p = np.float32(-1.453152027), np.float32(1.061405429), \
        np.float32(0.3275911)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel_f32(xf):
    return 0.5 * xf * (1.0 + _erf_poly(xf * np.float32(0.7071067811865476)))


def xla_ffn(x, w1, b1, w2, b2, g, o):
    # exactly models/bert.py: bf16 dot outputs, f32 erf GELU
    h = jnp.dot(x, w1) + b1.astype(x.dtype)
    h = _gelu_f32(h.astype(jnp.float32)).astype(x.dtype)
    return jnp.dot(h, w2) + b2.astype(x.dtype)


def xla_ffnln(x, w1, b1, w2, b2, g, o):
    y = xla_ffn(x, w1, b1, w2, b2, g, o)
    z = (x + y).astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    zn = (z - mu) * jax.lax.rsqrt(var + EPS)
    return (zn * g + o).astype(x.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, y_ref,
            *, with_ln: bool, f_chunks: int):
    x = x_ref[...]
    if f_chunks == 1:
        h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = _gelu_kernel_f32(h + b1_ref[...]).astype(x.dtype)
        y = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    else:
        # chunk the FFN intermediate over F so the [TM, F] tensor never
        # exists: y = sum_c gelu(x @ w1[:, c]) @ w2[c, :]
        FC = F // f_chunks
        y = jnp.zeros((x.shape[0], H), jnp.float32)
        for c in range(f_chunks):
            sl = slice(c * FC, (c + 1) * FC)
            hc = jax.lax.dot_general(
                x, w1_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hc = _gelu_kernel_f32(hc + b1_ref[:, sl]).astype(x.dtype)
            y = y + jax.lax.dot_general(
                hc, w2_ref[sl, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    if with_ln:
        z = y + x.astype(jnp.float32)
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
        zn = (z - mu) * jax.lax.rsqrt(var + EPS)
        y = zn * g_ref[...] + o_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


FCHUNKS = int(os.environ.get("FCHUNKS", "1"))
VMEM_MB = int(os.environ.get("VMEM_MB", "48"))


@functools.partial(jax.jit, static_argnames=("with_ln",))
def pallas_ffn(x, w1, b1, w2, b2, g, o, with_ln=False):
    m = x.shape[0]
    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, with_ln=with_ln, f_chunks=FCHUNKS),
        grid=(m // TM,),
        in_specs=[pl.BlockSpec((TM, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  const(H, F), const(1, F), const(F, H), const(1, H),
                  const(1, H), const(1, H)],
        out_specs=pl.BlockSpec((TM, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_MB << 20),
    )(x, w1, b1, w2, b2, g, o)


def measure(fn, x, args, tag):
    @jax.jit
    def run(x, *args):
        def step(c, _):
            xx = (x + c.astype(x.dtype)).astype(x.dtype)
            y = fn(xx, *args)
            return jnp.sum(y[:8, :8].astype(jnp.float32)) * 1e-6, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(x, *args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x, *args))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"{tag:18s}: {ms:7.3f} ms/layer-batch (M={M}, TM={TM})",
          flush=True)
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
    args = (w1, b1, w2, b2, g, o)

    with_ln = MODE == "ffnln"
    xla_fn = xla_ffnln if with_ln else xla_ffn

    ref = np.asarray(jax.jit(xla_fn)(x[:TM], *args), np.float32)
    got = np.asarray(pallas_ffn(x[:TM], *args, with_ln=with_ln), np.float32)
    scale = float(np.abs(ref).max())
    print(f"MODE={MODE} maxdiff: {float(np.abs(got - ref).max()):.5f} "
          f"(ref scale {scale:.2f})", flush=True)

    t_x = measure(lambda xx, *a: xla_fn(xx, *a), x, args, f"xla_{MODE}")
    t_p = measure(lambda xx, *a: pallas_ffn(xx, *a, with_ln=with_ln),
                  x, args, f"pallas_{MODE}")
    print(f"delta: {t_x - t_p:+.3f} ms/layer -> x12 = "
          f"{(t_x - t_p) * 12:+.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
