"""Fused ResNet stem: s2d 4x4 conv + BN + relu + 3x3/s2 maxpool in one
Pallas kernel.

Today the inference stem is: XLA s2d repack -> 4x4/s1 conv (the
space-to-depth form of the 7x7/s2, models/resnet.py:_StemConv) -> BN+relu
-> maxpool, measured ~1.7 ms at B=256 (stem 0.91 + maxpool 0.8, round-2
profile) because the [256,112,112,64] conv output (411 MB bf16) makes a
full HBM round trip between conv and pool. The fused kernel takes the
s2d-packed input [B,112,112,12], computes conv(+folded BN)+relu+maxpool
per image band entirely in VMEM, and writes only the pooled
[B,56,56,64] (103 MB): ~820 MB of traffic saved.

Maxpool without strided slices (Mosaic has none): with hp zero-padded to
114 rows, evens[i] = hp[2i] via reshape [57,2,...] and
q[i] = max(hp[2i], hp[2i+1]) via max over the pair axis; the 3-window is
max(q[i], evens[i+1]). Same trick on columns. Zero-padding is exact here
because the pool input is post-relu (>= 0).

Env: G (images/step, default 1), VMEM_MB (default 32).
Run: PYTHONPATH=/root/repo python artifacts/bench_stem_fused.py
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 256
G = int(os.environ.get("G", "1"))
VMEM_MB = int(os.environ.get("VMEM_MB", "32"))
N = 32
H2 = 112  # s2d spatial
C2 = 12   # s2d channels
K = 4     # s2d kernel


def _pool_half(h, size):
    """3-window/stride-2 max along axis 1 of [M, size+2, ...] (padded):
    out[i] = max(h[2i], h[2i+1], h[2i+2]), i < size//2."""
    pairs = h.reshape((h.shape[0], (size + 2) // 2, 2) + h.shape[2:])
    q = jnp.max(pairs, axis=2)            # q[i] = max(h[2i], h[2i+1])
    evens = pairs[:, :, 0]                # evens[i] = h[2i]
    return jnp.maximum(q[:, : size // 2], evens[:, 1: size // 2 + 1])


def _kernel(x_ref, w_ref, b_ref, o_ref):
    # Mosaic cannot concatenate vectors whose sublane offsets differ
    # (bench_bottleneck_v5 failed exactly there: "result/input offset
    # mismatch on non-concat dimension"), so instead of building the
    # [.., 192] patch tensor the conv is a sum of 16 shifted [M,12]x[12,64]
    # dots — w arrives as [16, 12, 64] so each tap slices a leading dim.
    x = x_ref[...]                                    # [G, 112, 112, 12]
    zr = jnp.zeros((G, 2, H2, C2), x.dtype)
    zr1 = jnp.zeros((G, 1, H2, C2), x.dtype)
    hp = jnp.concatenate([zr, x, zr1], axis=1)        # pad rows (2, 1)
    zc = jnp.zeros((G, H2 + 3, 2, C2), x.dtype)
    zc1 = jnp.zeros((G, H2 + 3, 1, C2), x.dtype)
    hp = jnp.concatenate([zc, hp, zc1], axis=2)       # pad cols (2, 1)
    h = jnp.zeros((G * H2 * H2, 64), jnp.float32)
    for dy in range(K):
        for dx in range(K):
            patch = hp[:, dy:dy + H2, dx:dx + H2, :].reshape(
                G * H2 * H2, C2)
            h = h + jax.lax.dot_general(
                patch, w_ref[dy * K + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b_ref[...], 0.0).astype(x.dtype)
    h = h.reshape(G, H2, H2, 64)
    # maxpool 3x3/s2, pad 1: zero-pad to 114 (values >= 0 post-relu)
    z1 = jnp.zeros((G, 1, H2, 64), h.dtype)
    h = jnp.concatenate([z1, h, z1], axis=1)          # [G, 114, 112, 64]
    h = _pool_half(h, H2)                             # [G, 56, 112, 64]
    h = h.transpose(0, 2, 1, 3)                       # [G, 112, 56, 64]
    z2 = jnp.zeros((G, 1, 56, 64), h.dtype)
    h = jnp.concatenate([z2, h, z2], axis=1)          # [G, 114, 56, 64]
    h = _pool_half(h, H2)                             # [G, 56, 56, 64]
    o_ref[...] = h.transpose(0, 2, 1, 3)


@jax.jit
def fused_stem(x2, w, b):
    nb = x2.shape[0]
    const = lambda *s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel, grid=(nb // G,),
        in_specs=[pl.BlockSpec((G, H2, H2, C2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  const(K * K, C2, 64), const(1, 64)],
        out_specs=pl.BlockSpec((G, 56, 56, 64), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 56, 56, 64), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_MB << 20),
    )(x2, w, b)


def s2d_repack(x):
    """[B,224,224,3] -> [B,112,112,12] (2x2 pixel blocks into channels)."""
    Bn, Hn, Wn, Cn = x.shape
    return x.reshape(Bn, Hn // 2, 2, Wn // 2, 2, Cn) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(Bn, Hn // 2, Wn // 2, 4 * Cn)


def s2d_weights(k7):
    """[7,7,3,64] -> patch-layout [192,64] for the 4x4/s1 s2d conv.

    Matches models/resnet.py:_StemConv: zero-pad to 8x8 on the leading
    edges, fold 2x2 pixel parity into channels. Patch column order is
    (dy, dx, channel) to match the kernel's concat order."""
    w = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))          # [8,8,3,64]
    w = w.reshape(K, 2, K, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5) \
        .reshape(K, K, 4 * 3, 64)                               # [4,4,12,64]
    return w.reshape(K * K, C2, 64)


def xla_current(x, k7, b):
    """Today's path: s2d repack + 4x4/s1 conv + bias/relu + maxpool."""
    dn = ("NHWC", "HWIO", "NHWC")
    x2 = s2d_repack(x)
    w = s2d_weights(k7).reshape(K, K, C2, 64).astype(x.dtype)
    h = jax.lax.conv_general_dilated(x2, w, (1, 1), [(2, 1), (2, 1)],
                                     dimension_numbers=dn)
    h = jnp.maximum(h + b, 0.0).astype(x.dtype)
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def xla_7x7(x, k7, b):
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(x, k7.astype(x.dtype), (2, 2),
                                     [(3, 3), (3, 3)],
                                     dimension_numbers=dn)
    h = jnp.maximum(h + b, 0.0).astype(x.dtype)
    return jax.lax.reduce_window(
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def pallas_path(x, k7, b):
    return fused_stem(s2d_repack(x), s2d_weights(k7), b)


def measure(fn, x, args, tag):
    @jax.jit
    def run(x, *args):
        def step(c, _):
            xx = (x + c.astype(x.dtype)).astype(x.dtype)
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
    ms = float(np.median(ts)) / N * 1000
    print(f"{tag:12s}: {ms:7.3f} ms/batch (G={G})", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, 224, 224, 3)) * 0.5, dt)
    k7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 64)) * 0.01, jnp.float32)

    ref = np.asarray(xla_current(x[:4], k7, b), np.float32)
    got = np.asarray(pallas_path(x[:4], k7, b), np.float32)
    print(f"maxdiff vs s2d-xla: {float(np.abs(got - ref).max()):.5f} "
          f"(scale {float(np.abs(ref).max()):.2f})", flush=True)
    ref7 = np.asarray(xla_7x7(x[:4], k7, b), np.float32)
    print(f"maxdiff s2d vs 7x7: {float(np.abs(ref7 - ref).max()):.5f}",
          flush=True)

    measure(xla_7x7, x, (k7, b), "xla_7x7")
    measure(xla_current, x, (k7, b), "xla_s2d")
    measure(pallas_path, x, (k7, b), "pallas_fused")


if __name__ == "__main__":
    main()
