"""Fused ResNet bottleneck block as one Pallas kernel — experiment.

Target: stage1 blocks at 56x56 are bandwidth-bound under XLA (~2.2 ms
each at B=256 on v5e, ~14% MFU): conv1(1x1)->bn/relu->conv2(3x3)->
bn/relu->conv3(1x1)->bn->(+res)->relu writes/reads the 56x56
intermediates in HBM between fusions. One kernel instance computes a
whole image's block with every intermediate in VMEM: the only HBM
traffic is input in + output out.

Inference-only: BN is folded into conv weights/bias outside the kernel.
1x1 convs are channel matmuls; the 3x3 is 9 statically-shifted matmuls
accumulated in VMEM (no gathers).

Run: python artifacts/bench_bottleneck.py

STATUS (round 2): parked. Each sub-kernel compiles and matches XLA
standalone on v5e — the [S,S,256]x[256,64] channel dot (maxdiff 0), and
the 9-tap roll+mask 3x3 conv (maxdiff ~bf16 eps) — but the composed
block kernel dies with an opaque "TPU backend error (Internal)" even
after trimming the f32 buffers (suspect VMEM: ~6.4 MB double-buffered
IO blocks + ~6 MB intermediates at CIN=COUT=256). Next step for a
future round: strip-mine the grid over row bands with an explicit halo
column in the input block, which caps VMEM regardless of channel width.
Standalone XLA baseline for this block shape: 3.43 ms/batch at B=256.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, S, CIN, W, COUT = 256, 56, 256, 64, 256  # stage1 block1/2 shapes
N = 32


def _dotc(a, w):
    """[S,S,K] x [K,N] -> [S,S,N] contracting the channel dim (no
    reshapes — Mosaic-friendlier than flattening the spatial dims)."""
    return jax.lax.dot_general(a, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref):
    """Blocks: x [1,S,S,CIN]; w1 [CIN,W]; w2 [9,W,W]; w3 [W,COUT];
    out [1,S,S,COUT]. Identity residual (CIN==COUT).

    Strip-mined inside the kernel: rows are processed in 4 static bands
    of 14 (+1-row halo read from the VMEM-resident input block), so the
    live intermediates are band-sized — the whole-image variant hit an
    opaque backend failure (suspected VMEM)."""
    ROWS = 14
    for j in range(S // ROWS):
        r0 = j * ROWS
        lo = max(r0 - 1, 0)
        hi = min(r0 + ROWS + 1, S)
        xs = x_ref[0, lo:hi]                         # [rows+halo, S, CIN]
        h = _dotc(xs, w1_ref[...])
        h = jnp.maximum(h + b1_ref[0], 0.0).astype(xs.dtype)

        R = hi - lo
        yy = jax.lax.broadcasted_iota(jnp.int32, (R, S), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
        acc = jnp.zeros((R, S, W), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                rolled = h
                if dy:
                    rolled = jnp.roll(rolled, -dy, axis=0)
                if dx:
                    rolled = jnp.roll(rolled, -dx, axis=1)
                valid = jnp.ones((R, S), jnp.float32)
                # vertical wrap masks apply only at true image edges;
                # interior band edges read real halo rows
                if dy == 1:
                    valid = valid * jnp.where(lo + yy < S - 1, 1.0, 0.0)
                elif dy == -1:
                    valid = valid * jnp.where(lo + yy > 0, 1.0, 0.0)
                if dx == 1:
                    valid = valid * (xx < S - 1)
                elif dx == -1:
                    valid = valid * (xx > 0)
                k = w2_ref[(dy + 1) * 3 + (dx + 1)]
                acc = acc + _dotc(rolled, k) * valid[:, :, None]
        h2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(xs.dtype)
        # trim the halo rows: keep the band's own ROWS rows
        off = r0 - lo
        h2 = h2[off:off + ROWS]
        out = (_dotc(h2, w3_ref[...]) + b3_ref[0]).astype(xs.dtype)
        out = out + x_ref[0, r0:r0 + ROWS]
        o_ref[0, r0:r0 + ROWS] = jnp.maximum(
            out, jnp.zeros((), out.dtype)).astype(o_ref.dtype)


def fused_block(x, w1, b1, w2, b2, w3, b3):
    spec_x = pl.BlockSpec((1, S, S, CIN), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, S, S, COUT), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(B,),
        in_specs=[spec_x, full(CIN, W), full(1, W), full(9, W, W),
                  full(1, W), full(W, COUT), full(1, COUT)],
        out_specs=spec_o,
        out_shape=jax.ShapeDtypeStruct((B, S, S, COUT), x.dtype),
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

    ref = np.asarray(xla_block(x[:2], *args), np.float32)
    try:
        got = np.asarray(fused_block(x[:2].astype(dt), *args), np.float32)
    except Exception as e:
        print("fused numerics FAILED:", str(e)[:400])
        got = None
    if got is not None:
        print("maxdiff:", float(np.abs(got - ref).max()),
              "ref scale:", float(np.abs(ref).max()))

    t_x = measure(xla_block, x, args)
    print(f"xla_block  : {t_x:7.3f} ms/batch", flush=True)
    if got is not None:
        try:
            t_p = measure(fused_block, x, args)
            print(f"pallas     : {t_p:7.3f} ms/batch", flush=True)
        except Exception as e:
            print("pallas bench FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
