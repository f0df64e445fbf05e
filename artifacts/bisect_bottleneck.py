"""Bisect the v2 fused-bottleneck Mosaic compile failure.

STAGE env var selects how much of the kernel body runs:
  0 = DMA in, copy band to output
  1 = + conv1 (1x1 matmul + relu)
  2 = + 3x3 taps accumulation
  3 = + conv3 + residual + relu (full kernel)
INTERP=1 runs in interpreter mode (numerics check only).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, CIN, W, COUT = 4, 56, 256, 64, 256
ROWS = 14
NBANDS = S // ROWS
HALO_ROWS = ROWS + 2
STAGE = int(os.environ.get("STAGE", "3"))
NTAPS = int(os.environ.get("NTAPS", "9"))
INTERP = os.environ.get("INTERP", "0") == "1"


def _dotc(a, w):
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            xs_ref, hp_ref, sem):
    b = pl.program_id(0)
    j = pl.program_id(1)
    r0 = j * ROWS

    dmas = [
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0, ROWS)], xs_ref.at[pl.ds(1, ROWS)],
            sem.at[0]),
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(jnp.maximum(r0 - 1, 0), 1)],
            xs_ref.at[pl.ds(0, 1)], sem.at[1]),
        pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(jnp.minimum(r0 + ROWS, S - 1), 1)],
            xs_ref.at[pl.ds(ROWS + 1, 1)], sem.at[2]),
    ]
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    xs = xs_ref[...]
    if STAGE == 0:
        o_ref[0] = jnp.pad(xs[1:1 + ROWS].astype(jnp.float32),
                           ((0, 0), (0, 0), (0, COUT - CIN))
                           ).astype(o_ref.dtype) if CIN != COUT else \
            xs[1:1 + ROWS].astype(o_ref.dtype)
        return

    h = _dotc(xs, w1_ref[...])
    h = jnp.maximum(h + b1_ref[0], 0.0).astype(xs.dtype)
    if STAGE == 1:
        o_ref[0] = jnp.concatenate(
            [h[1:1 + ROWS]] * (COUT // W), axis=-1).astype(o_ref.dtype)
        return

    # 3x3 via 9 STATIC slices of a column-padded scratch ref (no rolls,
    # no elementwise masks — both broke or bogged down Mosaic). Halo rows
    # outside the true image are zeroed via pl.when on the band index.
    hp_ref[:, 1:1 + S, :] = h
    zc = jnp.zeros((HALO_ROWS, 1, W), h.dtype)
    hp_ref[:, 0:1, :] = zc
    hp_ref[:, 1 + S:, :] = zc

    @pl.when(j == 0)
    def _():
        hp_ref[0:1] = jnp.zeros((1, S + 2, W), h.dtype)

    @pl.when(j == NBANDS - 1)
    def _():
        hp_ref[HALO_ROWS - 1:] = jnp.zeros((1, S + 2, W), h.dtype)

    acc = jnp.zeros((ROWS, S, W), jnp.float32)
    for t in range(NTAPS):
        dy, dx = divmod(t, 3)
        sl = hp_ref[dy:dy + ROWS, dx:dx + S, :]
        k = w2_ref[t * W:(t + 1) * W, :]
        acc = acc + _dotc(sl, k)
    h2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(xs.dtype)
    if STAGE == 2:
        o_ref[0] = jnp.concatenate(
            [h2] * (COUT // W), axis=-1).astype(o_ref.dtype)
        return

    out = (_dotc(h2, w3_ref[...]) + b3_ref[0]).astype(jnp.float32)
    out = out + xs_ref[1:1 + ROWS].astype(jnp.float32)
    o_ref[0] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


def fused_block(x, *args):
    full = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(x.shape[0], NBANDS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  full(CIN, W), full(1, W), full(9 * W, W),
                  full(1, W), full(W, COUT), full(1, COUT)],
        out_specs=pl.BlockSpec((1, ROWS, S, COUT),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], S, S, COUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((HALO_ROWS, S, CIN), x.dtype),
                        pltpu.VMEM((HALO_ROWS, S + 2, W), x.dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        interpret=INTERP,
    )(x, *args)


def xla_block(x, w1, b1, w2, b2, w3, b3):
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 1, CIN, W), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn)
    h = jnp.maximum(h + b1, 0.0).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, w2.reshape(3, 3, W, W), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn)
    h = jnp.maximum(h + b2, 0.0).astype(x.dtype)
    h = jax.lax.conv_general_dilated(
        h, w3.reshape(1, 1, W, COUT), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn)
    return jnp.maximum(h + b3 + x.astype(jnp.float32), 0.0).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, S, S, CIN)) * 0.5, dt)
    args = (jnp.asarray(rng.normal(size=(CIN, W)) * 0.05, dt),
            jnp.asarray(rng.normal(size=(1, W)) * 0.01, jnp.float32),
            jnp.asarray(rng.normal(size=(9 * W, W)) * 0.05, dt),
            jnp.asarray(rng.normal(size=(1, W)) * 0.01, jnp.float32),
            jnp.asarray(rng.normal(size=(W, COUT)) * 0.05, dt),
            jnp.asarray(rng.normal(size=(1, COUT)) * 0.01, jnp.float32))
    t0 = time.time()
    got = np.asarray(fused_block(x, *args), np.float32)
    print(f"STAGE={STAGE} INTERP={INTERP}: compiled+ran in "
          f"{time.time()-t0:.1f}s, out={got.shape}", flush=True)
    if STAGE == 3:
        ref = np.asarray(xla_block(x, *args), np.float32)
        print("maxdiff:", float(np.abs(got - ref).max()),
              "ref scale:", float(np.abs(ref).max()))


if __name__ == "__main__":
    main()
