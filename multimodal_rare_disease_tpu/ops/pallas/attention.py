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
    # blocks: q/k/v/o [1, T, d]; bias [1, 1, T] (additive, -1e9 on padding)
    q = q_ref[0]                                     # [T, d] value read
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, T]
    scores = scores * (1.0 / (d ** 0.5)) + bias_ref[0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mha_impl(q, k, v, bias, *, interpret: bool):
    """q/k/v [B, T, H, D]; bias [B, 1, T] → context [B, T, H, D].

    Layout note: blocks must have TPU-tileable (or array-equal) trailing
    dims, so q/k/v flatten to [B*H, T, D] and each grid step owns one
    (batch, head) problem with block (1, T, D) — trailing dims equal the
    array's, which Mosaic accepts for any T, D.
    """
    B, T, H, D = q.shape

    def to_flat(x):
        return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    qf, kf, vf = to_flat(q), to_flat(k), to_flat(v)
    qkv_spec = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, T), lambda i: (i // H, 0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _mha_kernel,
        grid=(B * H,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)


def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              attention_mask: jnp.ndarray) -> jnp.ndarray:
    """q/k/v: [B, T, heads, d]; attention_mask: [B, T] {0,1}.
    → context [B, T, heads, d]. Numerically matches the XLA softmax path
    (f32 accumulation) to bf16 precision. Falls back to the XLA
    formulation when Pallas can't compile here (capability probe)."""
    from multimodal_rare_disease_tpu.ops.pallas.capability import (
        pallas_available,
    )

    if not pallas_available():
        return mha_reference(q, k, v, attention_mask)
    bias = (1.0 - attention_mask[:, None, :].astype(jnp.float32)) * -1e9
    return _fused_mha_impl(q, k, v, bias, interpret=not _on_tpu())


def mha_reference(q, k, v, attention_mask):
    """XLA reference implementation (used for parity tests/benchmarks)."""
    d = q.shape[-1]
    bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / (d ** 0.5) + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(q.dtype), v)
