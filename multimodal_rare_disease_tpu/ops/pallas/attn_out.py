"""Pallas fused attention-output sublayer: y = LN(x + ctx @ wo + bo).

Sibling of the fused FFN sublayer (ops/pallas/ffn.py). At B=256/T=128
on v5e the classic path costs 0.437 ms/layer — the out-projection dot
with the residual add + LN statistics fused into its epilogue
(0.281 ms) plus a separate normalize pass (0.156 ms), both touching the
[M,768] stream in HBM twice (artifacts/round3/profile_comp_t128.log).
This kernel computes the whole sublayer tile-by-tile: one read of
ctx + residual, one write of the normalized output, LN statistics on
the f32 accumulator while it is still in VMEM.

Numerics contract (same liberties as the fused FFN kernel, parity
tested in interpret mode): the dot accumulates f32 and the residual is
added in f32 — the classic path rounds the projection and the residual
add to bf16 first, so results differ by bf16 rounding noise only.
Inference path only (the training path keeps the XLA formulation which
jax.grad differentiates).

Reference parity target: HF BertSelfOutput's dense -> residual ->
LayerNorm chain (`/root/reference/src/text_encoder.py` encoder stacks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests set this True to route the dispatch through the interpreter on
# CPU (the production gate requires a real TPU), mirroring ffn.py.
FORCE_INTERPRET = False


def _attn_out_ln_kernel(ctx_ref, x_ref, wo_ref, bo_ref, g_ref, o_ref,
                        y_ref, *, eps: float):
    ctx = ctx_ref[...]
    y = jax.lax.dot_general(ctx, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    z = y + bo_ref[...] + x_ref[...].astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    zn = (z - mu) * jax.lax.rsqrt(var + np.float32(eps))
    y_ref[...] = (zn * g_ref[...] + o_ref[...]).astype(y_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "block_rows", "interpret"))
def _fused_attn_out_ln_impl(ctx, x, wo, bo, gamma, beta, *, eps: float,
                            block_rows: int, interpret: bool):
    m, H = ctx.shape
    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    row = pl.BlockSpec((block_rows, H), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_out_ln_kernel, eps=eps),
        grid=(m // block_rows,),
        in_specs=[row, row, const(H, H), const(1, H), const(1, H),
                  const(1, H)],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, H), ctx.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        interpret=interpret,
    )(ctx, x, wo, bo, gamma, beta)


def attn_out_ln_fusible(m: int, hidden: int) -> bool:
    """Shape gate, mirroring ffn.ffn_ln_fusible."""
    return m >= 32 and m % 16 == 0 and hidden % 128 == 0


def _pick_block_rows(m: int) -> int:
    for t in (512, 256, 128, 64, 32, 16):
        if m % t == 0:
            return t
    raise ValueError(f"m={m} not tileable")  # guarded by fusible gate


def fused_attn_out_ln(ctx2d: jnp.ndarray, x2d: jnp.ndarray,
                      wo: jnp.ndarray, bo: jnp.ndarray,
                      gamma: jnp.ndarray, beta: jnp.ndarray,
                      eps: float = 1e-12,
                      interpret: bool = False) -> jnp.ndarray:
    """ctx2d/x2d [M, H]; wo [H, H]; bo/gamma/beta [H]
    → LN(x + ctx @ wo + bo) as [M, H] in x2d.dtype."""
    dt = ctx2d.dtype
    f32 = jnp.float32
    return _fused_attn_out_ln_impl(
        ctx2d, x2d, wo.astype(dt), bo.astype(f32).reshape(1, -1),
        gamma.astype(f32).reshape(1, -1), beta.astype(f32).reshape(1, -1),
        eps=eps, block_rows=_pick_block_rows(ctx2d.shape[0]),
        interpret=interpret)


def attn_out_ln_reference(ctx2d, x2d, wo, bo, gamma, beta,
                          eps: float = 1e-12):
    """XLA reference of the same sublayer (parity tests/benchmarks);
    mirrors the classic module path: dtype dot + bf16 residual add,
    flax-LayerNorm f32 statistics."""
    dt = ctx2d.dtype
    y = jnp.dot(ctx2d, wo.astype(dt)) + bo.astype(dt)
    z = (x2d + y).astype(jnp.float32)
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(z), axis=-1, keepdims=True)
                      - jnp.square(mu), 0.0)
    zn = (z - mu) * jax.lax.rsqrt(var + np.float32(eps))
    return (zn * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32)).astype(dt)
