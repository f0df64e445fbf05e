"""Pallas availability probe.

On this environment's tunneled TPU, Mosaic compilation can be unavailable
even when XLA works (remote-compile endpoint failures, or a libtpu
version mismatch between the client AOT compiler and the terminal
runtime). Every Pallas fast path therefore probes once per process and
falls back to its XLA formulation when kernels can't actually compile —
correctness never depends on Pallas.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

log = logging.getLogger(__name__)

_PALLAS_OK: Optional[bool] = None


def on_tpu() -> bool:
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in str(getattr(d, "device_kind", ""))
    except Exception:  # noqa: BLE001
        return False


def pallas_available() -> bool:
    """True when Pallas kernels can execute here (compiled on TPU, or
    interpreter mode off-TPU). Probes once per process."""
    global _PALLAS_OK
    if _PALLAS_OK is not None:
        return _PALLAS_OK
    if not on_tpu():
        _PALLAS_OK = True  # interpreter mode
        return True

    def _k(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    try:
        # ensure_compile_time_eval: the first call may come from inside
        # a jit trace (e.g. the trainer's jitted model init traces
        # BertLayer -> _fused_ffn_engaged -> here); without it the
        # float() readback sees a tracer, raises, and Pallas would be
        # cached off for the whole process.
        with jax.ensure_compile_time_eval():
            x = jnp.ones((8, 128), jnp.float32)
            out = pl.pallas_call(
                _k,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
            ok = bool(abs(float(out[0, 0]) - 2.0) < 1e-6)
    except Exception as e:  # noqa: BLE001 — any compile/runtime failure
        log.warning("Pallas unavailable on this TPU (%s: %.200s); "
                    "using XLA fallbacks", type(e).__name__, e)
        ok = False
    _PALLAS_OK = ok
    return ok
