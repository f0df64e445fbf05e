"""Probe which construct breaks the Mosaic remote compiler.

Each variant is a minimal standalone pallas_call around the suspect
construct from the fused-bottleneck tap loop:
  A: dot [16,56,64]x[64,64] with w2_ref[0] leading-dim index
  B: same dot with a plain [64,64] ref (no leading-dim index)
  C: row slice h[0:14] then dot with plain ref
  D: jnp.pad cols + offset slice [0:14, 1:57] then dot with plain ref
  E: scratch-ref staging: write h to [16,58,64] ref, read slice, dot
Run: python artifacts/probe_mosaic.py [A B C ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, S, W = 16, 56, 64


def _dotc(a, w):
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def kA(h_ref, w9_ref, o_ref):
    o_ref[...] = _dotc(h_ref[...], w9_ref[0]).astype(o_ref.dtype)


def kB(h_ref, w_ref, o_ref):
    o_ref[...] = _dotc(h_ref[...], w_ref[...]).astype(o_ref.dtype)


def kC(h_ref, w_ref, o_ref):
    o_ref[...] = _dotc(h_ref[0:14], w_ref[...]).astype(o_ref.dtype)


def kD(h_ref, w_ref, o_ref):
    hpad = jnp.pad(h_ref[...], ((0, 0), (1, 1), (0, 0)))
    o_ref[...] = _dotc(hpad[0:14, 1:1 + S], w_ref[...]).astype(o_ref.dtype)


def kE(h_ref, w_ref, o_ref, hp_ref):
    hp_ref[:, 1:1 + S, :] = h_ref[...]
    hp_ref[:, 0:1, :] = jnp.zeros((R, 1, W), h_ref.dtype)
    hp_ref[:, 1 + S:, :] = jnp.zeros((R, 1, W), h_ref.dtype)
    o_ref[...] = _dotc(hp_ref[0:14, 1:1 + S], w_ref[...]).astype(o_ref.dtype)


CASES = {
    "A": (kA, (R, S, W), (9, W, W), (R, S, W), None),
    "B": (kB, (R, S, W), (W, W), (R, S, W), None),
    "C": (kC, (R, S, W), (W, W), (14, S, W), None),
    "D": (kD, (R, S, W), (W, W), (14, S, W), None),
    "E": (kE, (R, S, W), (W, W), (14, S, W), (R, S + 2, W)),
}


def run(case):
    kern, hs, ws, os_, scratch = CASES[case]
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=hs) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=ws) * 0.05, jnp.bfloat16)
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [pltpu.VMEM(scratch, jnp.bfloat16)]
    t0 = time.time()
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(os_, jnp.bfloat16),
            **kw,
        )(h, w)
        np.asarray(out)
        print(f"{case}: OK ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{case}: FAIL ({time.time()-t0:.0f}s) {str(e)[:150]}",
              flush=True)


if __name__ == "__main__":
    for c in (sys.argv[1:] or list(CASES)):
        if c in CASES:
            run(c)


CIN = 256


def kF(x_ref, w1_ref, w_ref, o_ref):
    h = _dotc(x_ref[...], w1_ref[...])
    h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    hpad = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
    o_ref[...] = _dotc(hpad[0:14, 1:1 + S], w_ref[...]).astype(o_ref.dtype)


def kG(x_ref, w1_ref, w_ref, o_ref):
    # like F but with the row-validity mask multiply (iota + compare)
    h = _dotc(x_ref[...], w1_ref[...])
    h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    gy = (pl.program_id(0) * 14 - 1) + yy
    rowvalid = ((gy >= 0) & (gy < S)).astype(h.dtype)
    hm = h * rowvalid[:, :, None]
    hpad = jnp.pad(hm, ((0, 0), (1, 1), (0, 0)))
    o_ref[...] = _dotc(hpad[0:14, 1:1 + S], w_ref[...]).astype(o_ref.dtype)


def runFG(case):
    kern = {"F": kF, "G": kG}[case]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, S, CIN)) * 0.5, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(CIN, W)) * 0.05, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(W, W)) * 0.05, jnp.bfloat16)
    t0 = time.time()
    try:
        out = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec((R, S, CIN), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)] + [
                pl.BlockSpec((a, b), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
                for a, b in ((CIN, W), (W, W))],
            out_specs=pl.BlockSpec((14, S, W), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((14, S, W), jnp.bfloat16),
        )(x, w1, w)
        np.asarray(out)
        print(f"{case}: OK ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{case}: FAIL ({time.time()-t0:.0f}s) {str(e)[:150]}",
              flush=True)


if "F" in sys.argv or "G" in sys.argv:
    for c in sys.argv[1:]:
        if c in ("F", "G"):
            runFG(c)
