"""Pallas fused BERT FFN sublayer: y = LN(x + gelu(x @ w1 + b1) @ w2 + b2).

Motivation (attributed trace, artifacts/profile_trace3.py @ B=256/T=128
on v5e): the FFN dominates the BERT tower's step time — the
intermediate projection+GELU runs ~1.08 ms/layer and the output
projection(+residual+LN epilogue) ~0.84 ms/layer at 35-73% MFU, with
the [B*T, 3072] intermediate (201 MB bf16 at B=256/T=128) doing a full
HBM round trip between them. This kernel computes the whole post-LN
sublayer tile-by-tile over M = B*T rows: the intermediate lives only in
VMEM, the GELU/LayerNorm VPU work pipelines against the next tile's MXU
work (Mosaic double-buffers the grid), and the separate residual+LN HBM
pass disappears.

Measured on v5e (RTT-proof carry-chained harness,
artifacts/bench_ffn_fused.py, B=256/T=128/H=768/F=3072 bf16, TM=512):

    XLA (dot + erf-GELU + dot + residual + LN)   3.402 ms/layer-batch
    this kernel                                  2.983 ms/layer-batch
    -> x12 layers = ~5.0 ms/step back (58.4 -> ~53.4 ms @ B=256)

Inference-only (no dropout inside; the training path keeps the XLA
formulation which jax.grad differentiates). GELU uses an f32
Abramowitz-Stegun erf polynomial (|err| <= 1.5e-7 — exact at bf16)
because Mosaic has no erf lowering. LayerNorm inside the kernel uses
the two-pass variance in f32 (flax uses the fast E[x^2]-E[x]^2 form;
both agree to f32 roundoff, far below the bf16 serving precision).

Reference parity target: HF BertLayer's intermediate->output->LayerNorm
chain (`/root/reference/src/text_encoder.py` encoder stacks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT1_2 = np.float32(0.7071067811865476)

# Tests set this True to route BertLayer's fused-FFN dispatch through the
# interpreter on CPU (the production gate requires a real TPU).
FORCE_INTERPRET = False


def _erf_poly_f32(x):
    """f32 erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7)."""
    a1, a2, a3 = np.float32(0.254829592), np.float32(-0.284496736), \
        np.float32(1.421413741)
    a4, a5, p = np.float32(-1.453152027), np.float32(1.061405429), \
        np.float32(0.3275911)
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(xf):
    return 0.5 * xf * (1.0 + _erf_poly_f32(xf * _SQRT1_2))


def _ln_f32(z, g, o, eps):
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    return (z - mu) * jax.lax.rsqrt(var + np.float32(eps)) * g + o


def _ffn_pre_ln_kernel(z_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref,
                       g0_ref, o0_ref, y_ref, *, eps: float, splits: int):
    """Post-LN BERT FFN sublayer taking the UNNORMALIZED attention
    residual z: y = LN2(h + gelu(h@w1+b1)@w2 + b2), h = LN0(z). Folding
    the attention LayerNorm into the kernel removes its separate
    normalize pass over the [M,H] stream in HBM (0.156 ms/layer at
    B=256/T=128 on v5e, profile_comp_t128.log 'attention_ln'); the LN0
    VPU work hides under other chunks' MXU dots like the gelu does."""
    tm = z_ref.shape[0]
    s = tm // splits
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    xs = []
    hs = []
    for i in range(splits):
        x = _ln_f32(z_ref[i * s:(i + 1) * s].astype(jnp.float32),
                    g0_ref[...], o0_ref[...], eps).astype(z_ref.dtype)
        xs.append(x)
        hs.append(jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    ys = []
    for i in range(splits):
        h = _gelu_f32(hs[i] + b1_ref[...]).astype(z_ref.dtype)
        ys.append(jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    for i in range(splits):
        z = ys[i] + b2_ref[...] + xs[i].astype(jnp.float32)
        zn = _ln_f32(z, g_ref[...], o_ref[...], eps)
        y_ref[i * s:(i + 1) * s] = zn.astype(y_ref.dtype)


def _ffn_ln_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref,
                   y_ref, *, eps: float, splits: int):
    """Stage-staggered over `splits` row-chunks: all dot1s issue first,
    then the gelu→dot2 chain walks chunk by chunk, then the LN+store
    pass — so each chunk's VPU work (gelu, LN) can retire under another
    chunk's MXU dots instead of serializing against them. Bit-identical
    to the monolithic form (pure reordering of row-independent work);
    measured 2.79 vs 2.89-3.10 ms/layer at splits=8/TM=512 on v5e
    (artifacts/round3/ffn_stagger.log)."""
    tm = x_ref.shape[0]
    s = tm // splits
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    xs = [x_ref[i * s:(i + 1) * s] for i in range(splits)]
    hs = [jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          for x in xs]
    ys = []
    for i in range(splits):
        h = _gelu_f32(hs[i] + b1_ref[...]).astype(x_ref.dtype)
        ys.append(jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    for i in range(splits):
        z = ys[i] + b2_ref[...] + xs[i].astype(jnp.float32)
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
        zn = (z - mu) * jax.lax.rsqrt(var + np.float32(eps))
        y_ref[i * s:(i + 1) * s] = \
            (zn * g_ref[...] + o_ref[...]).astype(y_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_rows", "interpret"))
def _fused_ffn_ln_impl(x, w1, b1, w2, b2, gamma, beta, *, eps: float,
                       block_rows: int, interpret: bool):
    m, H = x.shape
    F = w1.shape[1]
    # 64-row stagger chunks (>= one f32 sublane tile x8); fall back to
    # the monolithic form for small tiles
    splits = max(1, min(8, block_rows // 64))
    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_ln_kernel, eps=eps, splits=splits),
        grid=(m // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  const(H, F), const(1, F), const(F, H), const(1, H),
                  const(1, H), const(1, H)],
        out_specs=pl.BlockSpec((block_rows, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(x, w1, b1, w2, b2, gamma, beta)


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_rows", "interpret"))
def _fused_ffn_pre_ln_impl(z, w1, b1, w2, b2, gamma, beta, g0, o0, *,
                           eps: float, block_rows: int, interpret: bool):
    m, H = z.shape
    F = w1.shape[1]
    splits = max(1, min(8, block_rows // 64))
    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_pre_ln_kernel, eps=eps, splits=splits),
        grid=(m // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  const(H, F), const(1, F), const(F, H), const(1, H),
                  const(1, H), const(1, H), const(1, H), const(1, H)],
        out_specs=pl.BlockSpec((block_rows, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, H), z.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(z, w1, b1, w2, b2, gamma, beta, g0, o0)


def ffn_ln_fusible(m: int, hidden: int, intermediate: int) -> bool:
    """Shape gate: the kernel wants lane-aligned H/F and at least one
    full sublane tile of rows; anything else takes the XLA path."""
    return (m >= 32 and m % 16 == 0 and hidden % 128 == 0
            and intermediate % 128 == 0)


def _pick_block_rows(m: int) -> int:
    for t in (512, 256, 128, 64, 32, 16):
        if m % t == 0:
            return t
    raise ValueError(f"m={m} not tileable")  # guarded by ffn_ln_fusible


def fused_ffn_ln(x2d: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                 w2: jnp.ndarray, b2: jnp.ndarray, gamma: jnp.ndarray,
                 beta: jnp.ndarray, eps: float = 1e-12,
                 interpret: bool = False,
                 pre_gamma: jnp.ndarray = None,
                 pre_beta: jnp.ndarray = None) -> jnp.ndarray:
    """x2d [M, H]; w1 [H, F]; b1 [F]; w2 [F, H]; b2/gamma/beta [H]
    → LN(x + gelu(x @ w1 + b1) @ w2 + b2) as [M, H] in x2d.dtype.

    With `pre_gamma`/`pre_beta`, x2d is the UNNORMALIZED attention
    residual z and the kernel applies the attention LayerNorm first:
    h = LN0(z); → LN(h + gelu(h @ w1 + b1) @ w2 + b2). This folds the
    post-LN BERT layer's second LN into the same kernel, removing its
    separate HBM normalize pass.

    Weights are consumed in x2d's compute dtype (matching the classic
    MaybeQuantDenseGeneral path); biases/LN params promote to f32.
    """
    dt = x2d.dtype
    f32 = jnp.float32
    if pre_gamma is not None:
        return _fused_ffn_pre_ln_impl(
            x2d, w1.astype(dt), b1.astype(f32).reshape(1, -1),
            w2.astype(dt), b2.astype(f32).reshape(1, -1),
            gamma.astype(f32).reshape(1, -1),
            beta.astype(f32).reshape(1, -1),
            pre_gamma.astype(f32).reshape(1, -1),
            pre_beta.astype(f32).reshape(1, -1), eps=eps,
            block_rows=_pick_block_rows(x2d.shape[0]), interpret=interpret)
    return _fused_ffn_ln_impl(
        x2d, w1.astype(dt), b1.astype(f32).reshape(1, -1), w2.astype(dt),
        b2.astype(f32).reshape(1, -1), gamma.astype(f32).reshape(1, -1),
        beta.astype(f32).reshape(1, -1), eps=eps,
        block_rows=_pick_block_rows(x2d.shape[0]), interpret=interpret)


def ffn_ln_reference(x2d, w1, b1, w2, b2, gamma, beta, eps: float = 1e-12):
    """XLA reference of the same sublayer (parity tests/benchmarks);
    mirrors the classic module path: dtype dots, f32 exact-erf GELU,
    flax-LayerNorm f32 statistics."""
    dt = x2d.dtype
    h = jnp.dot(x2d, w1.astype(dt)) + b1.astype(dt)
    hf = h.astype(jnp.float32)
    h = (0.5 * hf * (1.0 + jax.lax.erf(hf * _SQRT1_2))).astype(dt)
    y = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    z = (x2d + y).astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(z), axis=-1, keepdims=True)
                      - jnp.square(mu), 0.0)
    zn = (z - mu) * jax.lax.rsqrt(var + np.float32(eps))
    return (zn * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32)).astype(dt)
