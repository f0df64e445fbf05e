"""Pallas TPU kernels for the image preprocessing fast path.

`fused_normalize_u8` is the predict/eval hot op: uint8 [B,H,W,3] HBM
batch → ImageNet-normalized bf16/f32 activations in one VMEM pass
(cast + scale + shift fused), replacing the XLA chain
convert_u8→f32 / div 255 / sub mean / div std. The layout trick: flatten
to [B, H, W*3] rows so the per-channel mean/std become a precomputed
[W*3] row (channel pattern repeating every 3 lanes) and the kernel is a
pure row-broadcast FMA — no channel indexing, full VPU lanes.

Falls back to interpreter mode off-TPU (CPU tests) and to plain XLA via
`ops.preprocess.normalize_images` when Pallas is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_rare_disease_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def _on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
        kind = getattr(jax.devices()[0], "device_kind", "")
        return plat == "tpu" or "TPU" in str(kind)
    except Exception:  # noqa: BLE001
        return False


def _normalize_kernel(x_ref, scale_ref, bias_ref, o_ref):
    # u8 -> i32 -> f32: this chip's Mosaic cannot lower a direct
    # uint8->float32 convert (NotImplementedError in lowering, caught by
    # tests/test_tpu_kernels.py); the integer widening step is free on
    # the VPU and numerically exact for 0..255
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (x * scale_ref[:] + bias_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def _fused_normalize_impl(x_flat, scale_row, bias_row, *, dtype, interpret):
    B, H, WC = x_flat.shape
    return pl.pallas_call(
        _normalize_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, WC), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WC), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, WC), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, WC), dtype),
        interpret=interpret,
    )(x_flat, scale_row, bias_row)


def fused_normalize_u8(images_uint8: jnp.ndarray,
                       dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """uint8 [B,H,W,3] → normalized dtype [B,H,W,3] in one fused kernel.
    Falls back to the XLA chain when Pallas can't compile here."""
    from multimodal_rare_disease_tpu.ops.pallas.capability import (
        pallas_available,
    )

    if not pallas_available():
        from multimodal_rare_disease_tpu.ops.preprocess import normalize_images

        return normalize_images(images_uint8, dtype)
    B, H, W, C = images_uint8.shape
    assert C == 3
    scale = (1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
    bias = (-IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)
    scale_row = jnp.asarray(np.tile(scale, W))[None, :]
    bias_row = jnp.asarray(np.tile(bias, W))[None, :]
    x_flat = images_uint8.reshape(B, H, W * C)
    out = _fused_normalize_impl(x_flat, scale_row, bias_row, dtype=jnp.dtype(dtype),
                                interpret=not _on_tpu())
    return out.reshape(B, H, W, C)
