"""BERT tower formulations at the T=96 serving bucket, BERT-only.

The T=96 pathology is XLA's layout assignment around the attention
core: the [B,96,3,12,64] qkv dot output gets a batch-minor layout and
the q/k/v extractions become ~0.34 ms relayout copies x36
(artifacts/round3/profile_comp_t96_classic.log: bert/attn 13.7 ms/step
vs 2.33 at T=128). This measures layer-stack formulations that keep
every projection a 2-D {1,0} matmul and only *view* the tensors as
[B,T,h,d] for the score/AV einsums:

  classic96   BertLayer structure as in models/bert.py @ T=96 (control)
  classic128  same @ T=128 (the current serving bucket, control)
  flatv2      2-D residual stream, qkv as one [M,2304] dot, q/k/v as
              minor-dim 2-D slices, reshape views around the einsums
  flatv2_pad  flatv2 + lane-pad the einsums to T=128 (pad k/v/q after
              the 2-D slice, slice ctx rows back in 2-D)
  flatv2_3dot flatv2 with three separate [768,768] q/k/v dots

All variants use the production fused FFN+LN Pallas kernel and share
one set of weights; numerics are checked against classic96 (bf16
reassociation tolerance). Carry-chained scan, N=12 layers per step.

Run: PYTHONPATH=/root/repo:/root/.axon_site python artifacts/bench_bert_t96_v2.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.ops.pallas.ffn import fused_ffn_ln

B, H, F, NH, D = 256, 768, 3072, 12, 64
L = 12
EPS = 1e-12
_SQRT1_2 = np.float32(0.7071067811865476)


def make_params(rng):
    p = {}
    p["wqkv"] = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.02, jnp.bfloat16)
    p["bqkv"] = jnp.asarray(rng.normal(size=(3 * H,)) * 0.01, jnp.bfloat16)
    p["wo"] = jnp.asarray(rng.normal(size=(H, H)) * 0.02, jnp.bfloat16)
    p["bo"] = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.bfloat16)
    p["g1"] = jnp.asarray(1 + rng.normal(size=(H,)) * 0.05, jnp.float32)
    p["o1"] = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    p["w1"] = jnp.asarray(rng.normal(size=(H, F)) * 0.02, jnp.bfloat16)
    p["b1"] = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
    p["w2"] = jnp.asarray(rng.normal(size=(F, H)) * 0.02, jnp.bfloat16)
    p["b2"] = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    p["g2"] = jnp.asarray(1 + rng.normal(size=(H,)) * 0.05, jnp.float32)
    p["o2"] = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    return p


def ln(z, g, o):
    zf = z.astype(jnp.float32)
    mu = jnp.mean(zf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(zf), axis=-1, keepdims=True)
                      - jnp.square(mu), 0.0)
    return ((zf - mu) * jax.lax.rsqrt(var + EPS) * g + o).astype(jnp.bfloat16)


def attn_core(q, k, v, bias):
    # q/k/v [B,T,h,d]; bias [B,1,1,S]
    s = jnp.einsum("bthd,bshd->bhts", q, k) / np.float32(np.sqrt(D)).astype(q.dtype)
    s = s + bias
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def layer_classic(x3, p, bias, T):
    qkv = (x3 @ p["wqkv"] + p["bqkv"]).reshape(B, T, 3, NH, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ctx = attn_core(q, k, v, bias).reshape(B, T, H)
    h1 = ln(x3 + (ctx @ p["wo"] + p["bo"]), p["g1"], p["o1"])
    y = fused_ffn_ln(h1.reshape(B * T, H), p["w1"], p["b1"], p["w2"],
                     p["b2"], p["g2"], p["o2"], eps=EPS)
    return y.reshape(B, T, H)


def layer_flatv2(x2, p, bias, T, pad=False, three_dot=False):
    M = B * T
    if three_dot:
        q2 = x2 @ p["wqkv"][:, :H] + p["bqkv"][:H]
        k2 = x2 @ p["wqkv"][:, H:2 * H] + p["bqkv"][H:2 * H]
        v2 = x2 @ p["wqkv"][:, 2 * H:] + p["bqkv"][2 * H:]
    else:
        qkv2 = x2 @ p["wqkv"] + p["bqkv"]  # [M, 2304] {1,0}
        q2, k2, v2 = qkv2[:, :H], qkv2[:, H:2 * H], qkv2[:, 2 * H:]
    q = q2.reshape(B, T, NH, D)
    k = k2.reshape(B, T, NH, D)
    v = v2.reshape(B, T, NH, D)
    if pad and T % 128:
        pt = 128 - T % 128
        q = jnp.pad(q, ((0, 0), (0, pt), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pt), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pt), (0, 0), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pt)),
                       constant_values=-1e9)
        ctx = attn_core(q, k, v, bias)[:, :T]
    else:
        ctx = attn_core(q, k, v, bias)
    ctx2 = ctx.reshape(M, H)
    h1 = ln(x2 + (ctx2 @ p["wo"] + p["bo"]), p["g1"], p["o1"])
    return fused_ffn_ln(h1, p["w1"], p["b1"], p["w2"], p["b2"],
                        p["g2"], p["o2"], eps=EPS)


def build(kind, T, reps):
    """`reps` towers carry-chained inside ONE jit: RTT and dispatch are
    paid once per call, so t(reps=RB)-t(reps=RA) over RB-RA towers is an
    RTT-free per-tower time (the round-1 microbench lesson)."""
    def body(h, _):
        if kind == "classic":
            h3 = h.reshape(B, T, H)
            y = layer_classic(h3, p_g[0], bias_g[0], T).reshape(B * T, H)
        elif kind == "flatv2":
            y = layer_flatv2(h, p_g[0], bias_g[0], T)
        elif kind == "flatv2_pad":
            y = layer_flatv2(h, p_g[0], bias_g[0], T, pad=True)
        elif kind == "flatv2_3dot":
            y = layer_flatv2(h, p_g[0], bias_g[0], T, three_dot=True)
        return y, ()

    p_g, bias_g = [None], [None]

    def tower(x2, p, bias):
        p_g[0], bias_g[0] = p, bias
        y, _ = jax.lax.scan(body, x2, None, length=L * reps)
        return y

    return jax.jit(tower)


def main():
    rng = np.random.default_rng(0)
    for T in (96,):
        M = B * T
        x2 = jnp.asarray(rng.normal(size=(M, H)) * 0.5, jnp.bfloat16)
        lens = rng.integers(70, T + 1, size=B)
        mask = (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)
        bias = jnp.asarray((1.0 - mask)[:, None, None, :] * -1e9,
                           jnp.bfloat16)
        p = make_params(rng)

        ref = None
        for kind in ("classic", "flatv2", "flatv2_pad", "flatv2_3dot"):
            fn1 = build(kind, T, 1)
            y = np.asarray(fn1(x2, p, bias), np.float32)
            if ref is None:
                ref = y
            else:
                print(f"  maxdiff {kind} vs classic: "
                      f"{np.abs(y - ref).max():.5f}", flush=True)
            print(f"T={T} {kind:12s}: "
                  f"{rtt_free_ms(kind, T, x2, p, bias):7.2f} ms / "
                  f"{L}-layer tower", flush=True)

    # control: classic at T=128 (current serving bucket)
    T = 128
    M = B * T
    x2 = jnp.asarray(rng.normal(size=(M, H)) * 0.5, jnp.bfloat16)
    bias = jnp.zeros((B, 1, 1, T), jnp.bfloat16)
    p = make_params(rng)
    print(f"T=128 classic     : "
          f"{rtt_free_ms('classic', T, x2, p, bias):7.2f} ms / "
          f"{L}-layer tower", flush=True)


def rtt_free_ms(kind, T, x2, p, bias, ra=2, rb=10):
    out = []
    for reps in (ra, rb):
        fn = build(kind, T, reps)
        jax.block_until_ready(fn(x2, p, bias))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x2, p, bias))
            ts.append(time.perf_counter() - t0)
        out.append(float(np.median(ts)))
    return (out[1] - out[0]) / (rb - ra) * 1000


if __name__ == "__main__":
    main()
