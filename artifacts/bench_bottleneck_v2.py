"""Fused ResNet bottleneck block, v2: grid strip-mined over row bands.

Round-2's whole-image kernel (bench_bottleneck.py) died with an opaque
TPU backend error (suspected VMEM: ~6.4 MB double-buffered IO blocks).
This version executes the written follow-up plan: grid = (B, NBANDS),
the input stays in HBM (memory_space=ANY) and each instance DMAs a
fixed-size (ROWS+2)-row halo band into VMEM scratch, so VMEM stays
bounded (~2.5 MB) regardless of channel width.

Inference-only: BN folded into conv weights/bias outside the kernel.
1x1 convs are channel matmuls; the 3x3 is 9 rolled+masked matmuls.

Run on the real chip: python artifacts/bench_bottleneck_v2.py
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
N = 32  # carry-chain iterations (RTT-proof harness)


def _dotc(a, w):
    """[R,S,K] x [K,N] -> [R,S,N] contracting the channel dim."""
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            xs_ref, sem):
    b = pl.program_id(0)
    j = pl.program_id(1)
    r0 = j * ROWS
    # fixed-size halo window [lo2, lo2+HALO_ROWS) clamped to the image
    lo2 = jnp.clip(r0 - 1, 0, S - HALO_ROWS)
    off = r0 - lo2  # the band's own rows start here in the buffer

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(lo2, HALO_ROWS)], xs_ref, sem)
    dma.start()
    dma.wait()

    xs = xs_ref[...]                               # [HALO_ROWS, S, CIN]
    h = _dotc(xs, w1_ref[...])
    h = jnp.maximum(h + b1_ref[0], 0.0).astype(xs.dtype)

    yy = jax.lax.broadcasted_iota(jnp.int32, (HALO_ROWS, S), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (HALO_ROWS, S), 1)
    gy = lo2 + yy                                  # global row index
    acc = jnp.zeros((HALO_ROWS, S, W), jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            rolled = h
            if dy:
                rolled = pltpu.roll(rolled, -dy, 0)
            if dx:
                rolled = pltpu.roll(rolled, -dx, 1)
            valid = jnp.ones((HALO_ROWS, S), jnp.float32)
            # wrap masks only matter at true image edges; interior band
            # edges read real halo rows (and are sliced off below)
            if dy == 1:
                valid = valid * (gy < S - 1)
            elif dy == -1:
                valid = valid * (gy > 0)
            if dx == 1:
                valid = valid * (xx < S - 1)
            elif dx == -1:
                valid = valid * (xx > 0)
            k = w2_ref[(dy + 1) * 3 + (dx + 1)]
            acc = acc + _dotc(rolled, k) * valid[:, :, None]
    h2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(xs.dtype)
    h2 = h2[pl.ds(off, ROWS)]                      # drop halo rows
    out = (_dotc(h2, w3_ref[...]) + b3_ref[0]).astype(jnp.float32)
    out = out + xs_ref[pl.ds(off, ROWS)].astype(jnp.float32)  # residual
    o_ref[0] = jnp.maximum(out, 0.0).astype(o_ref.dtype)


def fused_block(x, w1, b1, w2, b2, w3, b3):
    full = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(B, NBANDS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  full(CIN, W), full(1, W), full(9, W, W),
                  full(1, W), full(W, COUT), full(1, COUT)],
        out_specs=pl.BlockSpec((1, ROWS, S, COUT),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, S, COUT), x.dtype),
        scratch_shapes=[pltpu.VMEM((HALO_ROWS, S, CIN), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(x, w1, b1, w2, b2, w3, b3)


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
    w1 = jnp.asarray(rng.normal(size=(CIN, W)) * 0.05, dt)
    b1 = jnp.asarray(rng.normal(size=(1, W)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(9, W, W)) * 0.05, dt)
    b2 = jnp.asarray(rng.normal(size=(1, W)) * 0.01, jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(W, COUT)) * 0.05, dt)
    b3 = jnp.asarray(rng.normal(size=(1, COUT)) * 0.01, jnp.float32)
    args = (w1, b1, w2, b2, w3, b3)

    ref = np.asarray(xla_block(x[:4], *args), np.float32)
    try:
        got = np.asarray(_small_fused(x[:4], args), np.float32)
    except Exception as e:
        print("fused numerics FAILED:", str(e)[:600])
        got = None
    if got is not None:
        print("maxdiff:", float(np.abs(got - ref).max()),
              "ref scale:", float(np.abs(ref).max()), flush=True)

    t_x = measure(xla_block, x, args)
    print(f"xla_block  : {t_x:7.3f} ms/batch", flush=True)
    if got is not None:
        t_p = measure(fused_block, x, args)
        print(f"pallas v2  : {t_p:7.3f} ms/batch", flush=True)


def _small_fused(x4, args):
    """Numerics check on 4 images without recompiling the B-sized grid."""
    full = lambda *shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(4, NBANDS),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  full(CIN, W), full(1, W), full(9, W, W),
                  full(1, W), full(W, COUT), full(1, COUT)],
        out_specs=pl.BlockSpec((1, ROWS, S, COUT),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, S, S, COUT), x4.dtype),
        scratch_shapes=[pltpu.VMEM((HALO_ROWS, S, CIN), x4.dtype),
                        pltpu.SemaphoreType.DMA(())],
    )(x4, *args)


if __name__ == "__main__":
    main()
