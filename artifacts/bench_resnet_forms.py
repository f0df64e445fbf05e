"""Compare formulations of the ResNet50 inference forward on TPU.

Variants (all numerically equivalent to the flax model modulo bf16
rounding; BN folded in f32 before the bf16 cast):
  flax      : ResNet50Encoder.apply (current production path)
  fold      : hand-rolled forward, BN folded into conv weights, convs
              via lax.conv_general_dilated
  fold+dot  : same but 1x1 convs as lax.dot_general (matmul emitter)
  fold+dotA : dot for 1x1 AND im2col+dot for the 3x3s

Run on the real chip: python artifacts/bench_resnet_forms.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.models.resnet import ResNet50Encoder

B = 256
N = 32
DT = jnp.bfloat16


def fold_bn(params, batch_stats):
    """Fold every BN (scale,bias,mean,var) into the preceding conv:
    returns {path: (w_folded_bf16, b_folded_f32)} keyed by conv name."""
    out = {}

    def walk(p, s, prefix):
        for k, v in p.items():
            if k.startswith("bn") or k == "stem_bn" or k.endswith("_bn"):
                continue
            if isinstance(v, dict) and "kernel" in v:
                # find sibling bn
                bn_name = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
                           "downsample_conv": "downsample_bn",
                           "stem_conv": "stem_bn"}[k]
                bn_p = p[bn_name]
                bn_s = s[bn_name]
                gamma = bn_p["scale"].astype(jnp.float32)
                beta = bn_p["bias"].astype(jnp.float32)
                mean = bn_s["mean"].astype(jnp.float32)
                var = bn_s["var"].astype(jnp.float32)
                inv = gamma * jax.lax.rsqrt(var + 1e-5)
                w = v["kernel"].astype(jnp.float32) * inv
                b = beta - mean * inv
                out[prefix + (k,)] = (w.astype(DT), b.astype(jnp.float32))
            elif isinstance(v, dict):
                walk(v, s[k], prefix + (k,))

    walk(params, batch_stats, ())
    return out


def _conv(x, w, b, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def _dot1x1(x, w, b, stride):
    if stride != 1:
        x = x[:, ::stride, ::stride]
    y = jax.lax.dot_general(x, w.reshape(w.shape[2], w.shape[3]),
                            (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + b).astype(x.dtype)


def _dot3x3(x, w, b, stride):
    # im2col: pad then 9 shifted slices stacked on channels
    Bx, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + H:stride, dx:dx + W:stride]
            for dy in range(3) for dx in range(3)]
    xc = jnp.concatenate(cols, axis=-1)
    wf = w.transpose(0, 1, 2, 3).reshape(9 * C, w.shape[3])
    y = jax.lax.dot_general(xc, wf, (((3,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (y + b).astype(x.dtype)


def make_forward(folded, use_dot1, use_dot3):
    stage_sizes = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)

    def c(x, path, k, stride):
        w, b = folded[path]
        if k == 1 and use_dot1:
            return _dot1x1(x, w, b, stride)
        if k == 3 and use_dot3 and stride == 1:
            return _dot3x3(x, w, b, stride)
        return _conv(x, w, b, stride, k // 2)

    def fwd(x):
        x = x.astype(DT)
        w, b = folded[("stem_conv",)]
        y = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jnp.maximum(y + b.astype(y.dtype), 0.0).astype(DT)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        for i, (nb, wdt) in enumerate(zip(stage_sizes, widths)):
            for bi in range(nb):
                stride = 2 if (bi == 0 and i > 0) else 1
                pre = (f"stage{i + 1}_block{bi}",)
                r = x
                o = jnp.maximum(c(x, pre + ("conv1",), 1, 1), 0.0)
                o = jnp.maximum(c(o, pre + ("conv2",), 3, stride), 0.0)
                o = c(o, pre + ("conv3",), 1, 1)
                if r.shape[-1] != wdt * 4 or stride != 1:
                    r = c(x, pre + ("downsample_conv",), 1, stride)
                x = jnp.maximum(o + r, 0.0)
        return jnp.mean(x, axis=(1, 2))

    return fwd


def measure(fn, x):
    @jax.jit
    def run(x):
        def step(c, _):
            o = fn(x + c.astype(x.dtype))
            return jnp.sum(o[:, :8].astype(jnp.float32)) * 1e-9, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot

    float(run(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / N * 1000


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32), DT)

    model = ResNet50Encoder(dtype=DT)
    vs = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3), DT),
                    train=True)
    params, stats = vs["params"], vs["batch_stats"]
    folded = fold_bn(params, stats)

    flax_fwd = functools.partial(
        lambda v, x: model.apply(v, x, train=False)[0],
        {"params": params, "batch_stats": stats})

    fold_fwd = make_forward(folded, False, False)
    dot_fwd = make_forward(folded, True, False)
    dota_fwd = make_forward(folded, True, True)

    # numerics check (vs flax, small batch)
    xs = x[:8]
    ref = np.asarray(flax_fwd(xs), np.float32)
    for name, fn in [("fold", fold_fwd), ("fold+dot", dot_fwd),
                     ("fold+dotA", dota_fwd)]:
        got = np.asarray(fn(xs), np.float32)
        scale = np.abs(ref).max()
        print(f"{name:10s} maxdiff {np.abs(got - ref).max():.5f} "
              f"(ref scale {scale:.3f})", flush=True)

    for name, fn in [("flax", flax_fwd), ("fold", fold_fwd),
                     ("fold+dot", dot_fwd), ("fold+dotA", dota_fwd)]:
        t = measure(fn, x)
        print(f"{name:10s}: {t:7.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
