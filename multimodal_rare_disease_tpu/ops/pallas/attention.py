"""Pallas fused multi-head self-attention for the BERT encoder.

For the 128/256-token clinical-text regime the whole per-(batch, head)
attention problem fits in VMEM (Q/K/V [T,64] + scores [T,T] ≈ 0.3 MB at
T=256), so one kernel instance computes QK^T → bias → f32 softmax → AV
without ever materializing the [B, heads, T, T] score tensor in HBM —
the XLA path writes/reads it twice (~100 MB per direction per layer at
B=256, T=128), which is pure bandwidth waste.

Grid: (B, heads). Inference path only (no dropout inside; the training
path keeps the XLA formulation which jax.grad differentiates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_rare_disease_tpu.ops.pallas.image_kernels import _on_tpu


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    # blocks: q/k/v [T, d]; bias [1, T] (additive, -1e9 on padding)
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, T]
    scores = scores * (1.0 / (d ** 0.5)) + bias_ref[:].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mha_impl(q, k, v, bias, *, interpret: bool):
    B, T, H, D = q.shape
    grid = (B, H)
    qkv_spec = pl.BlockSpec((1, T, 1, D), lambda b, h: (b, 0, h, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, T), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
        _mha_kernel(q_ref.at[0, :, 0, :], k_ref.at[0, :, 0, :],
                    v_ref.at[0, :, 0, :], bias_ref.at[0], o_ref.at[0, :, 0, :])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, H, D), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              attention_mask: jnp.ndarray) -> jnp.ndarray:
    """q/k/v: [B, T, heads, d]; attention_mask: [B, T] {0,1}.
    → context [B, T, heads, d]. Numerically matches the XLA softmax path
    (f32 accumulation) to bf16 precision."""
    bias = (1.0 - attention_mask[:, None, :].astype(jnp.float32)) * -1e9
    return _fused_mha_impl(q, k, v, bias, interpret=not _on_tpu())
