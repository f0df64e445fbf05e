"""Fused ResNet bottleneck v3: whole image per instance, static bands.

v2 (grid-banded manual DMA) was numerically right but 2x slower than
XLA: 1024 tiny instances, 3 serialized DMAs each, no compute/IO overlap.
v3 goes back to grid=(B,) with BlockSpec IO (Pallas double-buffers
image in/out across instances) and loops the 4 row bands STATICALLY
inside the kernel, staging conv1's output in a column-padded scratch.
The round-2 whole-image attempt crashed the Mosaic remote compiler —
that is now known to be the roll/iota-mask constructs (see
probe_mosaic.py), not VMEM; this version uses only static slices,
scratch stores, and pl.when.

Run on the real chip: python artifacts/bench_bottleneck_v3.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, CIN, W, COUT = 256, 56, 256, 64, 256  # stage1 identity block shapes
ROWS = 14
NBANDS = S // ROWS
HALO_ROWS = ROWS + 2
N = 32


def _dotc(a, w):
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            hp_ref):
    """x block [1,S,S,CIN] -> out [1,S,S,COUT]; per band j:
    conv1 on rows [j*R-1, j*R+R+1) -> hp scratch [HALO_ROWS, S+2, W]
    (columns padded, edge halo rows zeroed) -> 9 static-slice taps ->
    conv3 + residual + relu -> band rows of the output block."""
    zc = jnp.zeros((HALO_ROWS, 1, W), x_ref.dtype)
    for j in range(NBANDS):
        r0 = j * ROWS
        lo = max(r0 - 1, 0)
        hi = min(r0 + ROWS + 1, S)
        xs = x_ref[0, lo:hi]                       # [rows, S, CIN] static
        h = _dotc(xs, w1_ref[...])
        h = jnp.maximum(h + b1_ref[0], 0.0).astype(xs.dtype)
        # place into hp so the band's own rows sit at hp rows [1, 1+ROWS):
        # edge bands carry one zeroed halo row (outside the image)
        hp_ref[:, 0:1, :] = zc
        hp_ref[:, 1 + S:, :] = zc
        if j == 0:
            hp_ref[1:1 + (hi - lo), 1:1 + S, :] = h
            hp_ref[0:1, 1:1 + S, :] = jnp.zeros((1, S, W), h.dtype)
        elif j == NBANDS - 1:
            hp_ref[0:hi - lo, 1:1 + S, :] = h
            hp_ref[HALO_ROWS - 1:, 1:1 + S, :] = jnp.zeros((1, S, W),
                                                           h.dtype)
        else:
            hp_ref[:, 1:1 + S, :] = h
        acc = jnp.zeros((ROWS, S, W), jnp.float32)
        for t in range(9):
            dy, dx = divmod(t, 3)
            sl = hp_ref[dy:dy + ROWS, dx:dx + S, :]
            k = w2_ref[t * W:(t + 1) * W, :]
            acc = acc + _dotc(sl, k)
        h2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(xs.dtype)
        out = (_dotc(h2, w3_ref[...]) + b3_ref[0]).astype(jnp.float32)
        out = out + x_ref[0, r0:r0 + ROWS].astype(jnp.float32)
        o_ref[0, r0:r0 + ROWS] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


def _call(x, args, grid_b):
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(grid_b,),
        in_specs=[pl.BlockSpec((1, S, S, CIN), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(CIN, W), full(1, W), full(9 * W, W),
                  full(1, W), full(W, COUT), full(1, COUT)],
        out_specs=pl.BlockSpec((1, S, S, COUT), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_b, S, S, COUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((HALO_ROWS, S + 2, W), x.dtype)],
    )(x, *args)


def fused_block(x, *args):
    return _call(x, args, B)


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


def measure(fn, x, args):
    @jax.jit
    def run(x, *args):
        def step(c, _):
            xx = x + c.astype(x.dtype)
            o = fn(xx, *args)
            return jnp.sum(o[:, 0, 0, :8].astype(jnp.float32)) * 1e-9, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(x, *args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x, *args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N * 1000


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

    ref = np.asarray(xla_block(x[:4], *args), np.float32)
    try:
        got = np.asarray(_call(x[:4], args, 4), np.float32)
    except Exception as e:
        print("fused numerics FAILED:", str(e)[:400])
        got = None
    if got is not None:
        print("maxdiff:", float(np.abs(got - ref).max()),
              "ref scale:", float(np.abs(ref).max()), flush=True)

    t_x = measure(xla_block, x, args)
    print(f"xla_block  : {t_x:7.3f} ms/batch", flush=True)
    if got is not None:
        t_p = measure(fused_block, x, args)
        print(f"pallas v3  : {t_p:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
