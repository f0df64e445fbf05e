"""Pallas fused multi-head self-attention for the BERT encoder.

For the 128/256-token clinical-text regime each batch element's whole
attention problem (all heads) fits in VMEM: Q/K/V [T, H*D=768] bf16 ≈
0.2 MB each at T=128, scores [T,T] f32 per head ≈ 64 KB. One kernel
instance computes QK^T → bias → f32 softmax → AV for one batch element
without ever materializing the [B, heads, T, T] score tensor in HBM.

STATUS — measured, and XLA wins at these shapes (config default keeps
`fused_attention: False`). With an RTT-proof harness (carry-chained
N=64 scan; the round-1/early-round-2 micro-benchmarks were dominated by
the ~30 ms axon-tunnel readback and are invalid —
artifacts/bench_attention_v4.py) on v5e at B=256/T=128/H=12/D=64 bf16:

    xla softmax(QK^T)V         0.37 ms/layer-batch   <- default path
    this kernel (grid=(B,))    1.49 ms
    v3a batched G=8 per step   0.98 ms
    jax.experimental flash     ~6 ms   (per-(b,h) grid drowns)

XLA's fused convert+max+exp+div epilogue keeps the softmax near the
bandwidth floor here; the Pallas variants lose to per-step overheads and
the lane-sliced per-head dots (D=64 is half a lane tile). The kernel is
kept as a tested capability for regimes where it should win (longer T,
where the [B,H,T,T] HBM materialization dominates).

Grid layout (v2): grid=(B,), native [B, T, H*D] layout from the fused
QKV projection (reshape is free), heads sliced as static lane offsets
inside the kernel — round 1's grid=(B*heads,) with 4 extra full-tensor
HBM transpose passes was strictly worse.

Inference path only (no dropout inside; the training path keeps the XLA
formulation which jax.grad differentiates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_rare_disease_tpu.ops.pallas.image_kernels import _on_tpu


def _mha_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, num_heads: int,
                head_dim: int):
    """Blocks: q/k/v/o [G, T, H*D]; bias [G, 1, T] (additive, -1e9 pad)."""
    G = q_ref.shape[0]
    scale = 1.0 / (head_dim ** 0.5)
    for g in range(G):
        b = bias_ref[g].astype(jnp.float32)              # [1, T] broadcasts
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            q = q_ref[g, :, sl]                          # [T, D]
            k = k_ref[g, :, sl]
            v = v_ref[g, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [T, T]
            s = s * scale + b
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
            o_ref[g, :, sl] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _fused_mha_impl(q, k, v, bias, *, num_heads: int, interpret: bool):
    """q/k/v [B, T, H, D]; bias [B, 1, T] → context [B, T, H, D]."""
    B, T, H, D = q.shape
    qf = q.reshape(B, T, H * D)   # free: last two dims are contiguous
    kf = k.reshape(B, T, H * D)
    vf = v.reshape(B, T, H * D)

    qkv_spec = pl.BlockSpec((1, T, H * D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, num_heads=H, head_dim=D),
        grid=(B,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out.reshape(B, T, H, D)


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
    return _fused_mha_impl(q, k, v, bias, num_heads=q.shape[2],
                           interpret=not _on_tpu())


def mha_reference(q, k, v, attention_mask):
    """XLA reference implementation (used for parity tests/benchmarks)."""
    d = q.shape[-1]
    bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -1e9
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / (d ** 0.5) + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(q.dtype), v)
