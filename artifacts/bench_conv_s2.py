"""Stride-2 3x3 conv reformulations (ResNet50 stage2/3/4 block0 conv2).

The direct lax.conv stride-2 runs at 26% MFU (1.16 ms for the stage2
shape vs 0.31 ms FLOP floor — profile_comp_t128.log fusion.200). The
same linear map can run as a stride-1 2x2 conv over a space-to-depth
packed input: y[i,j] = sum_{u,v} w[u,v] x[2i+u, 2j+v] with u = 2a+p
becomes a 2x2 conv (a,b) over x'[i,j,(p,q,c)] with kernel
w'[a,b,(p,q,c),co] = w[2a+p,2b+q,c,co] (zero where the tap exceeds 2).
1.78x the FLOPs but every shape lane-aligned and stride-1.

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/bench_conv_s2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 24

SHAPES = [
    # (tag, B, S, Cin, Cout)  — input [B,S,S,Cin], 3x3 s2 SAME -> [B,S/2,S/2,Cout]
    ("stage2", 256, 56, 128, 128),
    ("stage3", 256, 28, 256, 256),
    ("stage4", 256, 14, 512, 512),
]


def direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def s2d_form(x, w4):
    """x [B,S,S,C]; w4 [2,2,4C,Co] prepacked. Pad to S+2, space-to-depth
    to [(S+2)/2, (S+2)/2, 4C], VALID 2x2 stride-1 conv."""
    B, S, _, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    Sp = S + 2
    xs = xp.reshape(B, Sp // 2, 2, Sp // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, Sp // 2, Sp // 2, 4 * C)
    return jax.lax.conv_general_dilated(
        xs, w4, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def pack_w(w):
    """w [3,3,C,Co] -> w4 [2,2,4C,Co] with layout (p,q,c) packed."""
    C, Co = w.shape[2], w.shape[3]
    w4 = np.zeros((2, 2, 2, 2, C, Co), np.float32)  # [a,b,p,q,c,co]
    for u in range(3):
        for v in range(3):
            a, p = divmod(u, 2)
            b_, q = divmod(v, 2)
            w4[a, b_, p, q] = w[u, v]
    return w4.reshape(2, 2, 4 * C, Co)


def measure(fn, x, w, tag):
    @jax.jit
    def run(x, w):
        def step(c, _):
            y = fn(x, w * (1 + c).astype(w.dtype))
            return jnp.sum(y[:2, :2, :2, :8].astype(jnp.float32)) * 1e-6, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(x, w))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x, w))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"  {tag:12s}: {ms:7.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    for tag, B, S, Cin, Cout in SHAPES:
        x = jnp.asarray(rng.normal(size=(B, S, S, Cin)) * 0.5, jnp.bfloat16)
        w = rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32) * 0.05
        wj = jnp.asarray(w, jnp.bfloat16)
        w4 = jnp.asarray(pack_w(w), jnp.bfloat16)
        ref = np.asarray(jax.jit(direct)(x, wj), np.float32)
        got = np.asarray(jax.jit(s2d_form)(x, w4), np.float32)
        d = float(np.abs(got - ref).max())
        print(f"{tag} [B{B} {S}x{S}x{Cin}->{Cout}] maxdiff {d:.4f} "
              f"(scale {float(np.abs(ref).max()):.1f})", flush=True)
        measure(direct, x, wj, "direct s2")
        measure(s2d_form, x, w4, "s2d 2x2 s1")


if __name__ == "__main__":
    main()
