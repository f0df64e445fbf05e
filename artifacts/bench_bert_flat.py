"""Flat-2D residual stream experiment for the BERT tower at T=96.

Finding so far (profile_trace3 + step_hlo_96 vs step_hlo_128): with a
[B, T, H] residual stream at T=96, XLA picks a permuted {2,0,1} layout
(B in sublanes) for some ops and {2,1,0} for others → 4.85 ms of
relayout copies, and the FFN output projections lower as convolutions
running at ~37% MFU (1.58 ms convert_reduce_fusions, 17.4 ms/step
total). At T=128 the layouts are uniform and the dots are near-roofline.
An optimization_barrier before each LN measured WORSE (40.98 vs 39.05
ms BERT-only) — the slowness is the dot lowering, not the LN fusion.

Hypothesis: keep the residual stream 2D [B*T, H] so every big dot is an
unambiguous [24576, K] x [K, N] matmul; reshape to [B, T, ...] only
around the attention einsums. Numerically identical (pure reshapes).

This script runs BOTH functional variants (3D control / 2D flat) from
the same param tree, checks they agree, and times them with the
carry-chained harness. Run on chip: python artifacts/bench_bert_flat.py
"""

import os
import time

import jax

if os.environ.get("MRD_CPU") == "1":
    # The image pre-configures jax_platforms='axon,cpu'; the env var
    # alone doesn't override it (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.models.bert import BertEncoder

B = int(os.environ.get("BENCH_B", "256"))
T = int(os.environ.get("BENCH_T", "96"))
N = 16
H, L, NH, I = 768, int(os.environ.get("BENCH_L", "12")), 12, 3072
D = H // NH
DT = jnp.bfloat16


def _ln(x, scale, bias, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(DT)


def _gelu(x):
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jax.lax.erf(
        xf * np.float32(0.7071067811865476)))).astype(x.dtype)


def _embed(p, ids, mask):
    e = p["word_embeddings"]["embedding"].astype(DT)[ids]
    e = e + p["position_embeddings"]["embedding"].astype(DT)[
        jnp.arange(ids.shape[1])][None]
    e = e + p["token_type_embeddings"]["embedding"].astype(DT)[0][None, None]
    e = _ln(e, p["embeddings_ln"]["scale"], p["embeddings_ln"]["bias"])
    bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
    return e, bias.astype(DT)


def _attn_core(q, k, v, abias):
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.float32(np.sqrt(D)).astype(DT)
    scores = scores + abias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(DT)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def forward_3d(p, ids, mask):
    h, abias = _embed(p, ids, mask)
    for i in range(L):
        lp = p[f"layer{i}"]
        qkv = jnp.einsum("bth,hxnd->btxnd", h,
                         lp["attention"]["qkv"]["kernel"].astype(DT)) \
            + lp["attention"]["qkv"]["bias"].astype(DT)
        ctx = _attn_core(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], abias)
        att = jnp.einsum("btnd,ndh->bth", ctx,
                         lp["attention"]["output"]["kernel"].astype(DT)) \
            + lp["attention"]["output"]["bias"].astype(DT)
        h = _ln(h + att, lp["attention_ln"]["scale"], lp["attention_ln"]["bias"])
        f = jnp.einsum("bth,hi->bti", h,
                       lp["intermediate"]["kernel"].astype(DT)) \
            + lp["intermediate"]["bias"].astype(DT)
        f = _gelu(f)
        f = jnp.einsum("bti,ih->bth", f, lp["output"]["kernel"].astype(DT)) \
            + lp["output"]["bias"].astype(DT)
        h = _ln(h + f, lp["output_ln"]["scale"], lp["output_ln"]["bias"])
    return h[:, 0]


def forward_2d(p, ids, mask):
    h3, abias = _embed(p, ids, mask)
    Bs, Ts, _ = h3.shape
    h = h3.reshape(Bs * Ts, H)
    for i in range(L):
        lp = p[f"layer{i}"]
        wqkv = lp["attention"]["qkv"]["kernel"].astype(DT).reshape(H, 3 * H)
        qkv = (h @ wqkv + lp["attention"]["qkv"]["bias"].astype(DT).reshape(3 * H)
               ).reshape(Bs, Ts, 3, NH, D)
        ctx = _attn_core(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], abias)
        wo = lp["attention"]["output"]["kernel"].astype(DT).reshape(H, H)
        att = ctx.reshape(Bs * Ts, H) @ wo \
            + lp["attention"]["output"]["bias"].astype(DT)
        h = _ln(h + att, lp["attention_ln"]["scale"], lp["attention_ln"]["bias"])
        f = h @ lp["intermediate"]["kernel"].astype(DT) \
            + lp["intermediate"]["bias"].astype(DT)
        f = _gelu(f)
        f = f @ lp["output"]["kernel"].astype(DT) \
            + lp["output"]["bias"].astype(DT)
        h = _ln(h + f, lp["output_ln"]["scale"], lp["output_ln"]["bias"])
    return h.reshape(Bs, Ts, H)[:, 0]


def forward_chunked(p, ids, mask):
    """Fake-T'=128 re-chunked stream: [B, T, H] -> [B*T/128, 128, H].

    Every position-wise op (QKV/FFN dots, LayerNorms, GELU) sees the
    exact tensor shapes of the fast T=128 case, so XLA's layout
    assignment reproduces the 93%-MFU T=128 lowering; only the
    attention core reshapes back to the real [B, T] geometry (pure
    contiguity-preserving reshapes: both views flatten row-major to
    [B*T, ...])."""
    h3, abias = _embed(p, ids, mask)
    Bs, Ts, _ = h3.shape
    C = 128
    R = (Bs * Ts) // C
    assert Bs * Ts == R * C
    h = h3.reshape(R, C, H)
    for i in range(L):
        lp = p[f"layer{i}"]
        qkv = jnp.einsum("rch,hxnd->rcxnd", h,
                         lp["attention"]["qkv"]["kernel"].astype(DT)) \
            + lp["attention"]["qkv"]["bias"].astype(DT)
        qkv = qkv.reshape(Bs, Ts, 3, NH, D)
        ctx = _attn_core(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], abias)
        ctx = ctx.reshape(R, C, NH, D)
        att = jnp.einsum("rcnd,ndh->rch", ctx,
                         lp["attention"]["output"]["kernel"].astype(DT)) \
            + lp["attention"]["output"]["bias"].astype(DT)
        h = _ln(h + att, lp["attention_ln"]["scale"], lp["attention_ln"]["bias"])
        f = jnp.einsum("rch,hi->rci", h,
                       lp["intermediate"]["kernel"].astype(DT)) \
            + lp["intermediate"]["bias"].astype(DT)
        f = _gelu(f)
        f = jnp.einsum("rci,ih->rch", f, lp["output"]["kernel"].astype(DT)) \
            + lp["output"]["bias"].astype(DT)
        h = _ln(h + f, lp["output_ln"]["scale"], lp["output_ln"]["bias"])
    return h.reshape(Bs, Ts, H)[:, 0]


def bench(fn, p, ids, mask, tag):
    @jax.jit
    def run(p, ids, mask):
        def step(c, _):
            # the carry must have REAL data dependence on the forward's
            # output (float * 1e-12), else XLA dead-code-eliminates the
            # whole tower: an earlier `* 0` int carry measured 1.7 ms
            # for the full 12-layer BERT (impossible; dot floor ~21 ms)
            ids2 = jnp.where(c > jnp.float32(1e30),
                             jnp.zeros_like(ids), ids)
            out = fn(p, ids2, mask)
            return jnp.sum(out.astype(jnp.float32)) * 1e-12 + c, ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                              length=N)
        return tot
    int(run(p, ids, mask))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        int(run(p, ids, mask))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) / N * 1000
    print(f"{tag}: {ms:.2f} ms/step (B={B}, T={T})", flush=True)
    return ms


def main():
    enc = BertEncoder(num_layers=L, dtype=DT)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 28996, (B, T), dtype=np.int32))
    mask = jnp.ones((B, T), jnp.int32)
    v = enc.init(jax.random.key(0), ids[:1], mask[:1], train=False)
    p = jax.tree_util.tree_map(
        lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, v["params"])

    if os.environ.get("CHECK", "0") == "1":
        # numerics: run on CPU (compile is cheap there with BENCH_L=2)
        a = jax.jit(forward_3d)(p, ids[:8], mask[:8])
        b = jax.jit(forward_2d)(p, ids[:8], mask[:8])
        c = jax.jit(forward_chunked)(p, ids[:16], mask[:16])
        print("3d vs chunked max|d|:", float(jnp.max(jnp.abs(
            jax.jit(forward_3d)(p, ids[:16], mask[:16]).astype(jnp.float32)
            - c.astype(jnp.float32)))), flush=True)
        ref = enc.apply({"params": v["params"]}, ids[:8], mask[:8],
                        train=False, cls_only_final=False)["cls"]
        print("3d vs 2d max|d|:", float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))), flush=True)
        print("3d vs module max|d|:", float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - ref.astype(jnp.float32)))), flush=True)
        return

    bench(forward_chunked, p, ids, mask, "chunked_128")
    bench(forward_2d, p, ids, mask, "flat_2d")
    bench(forward_3d, p, ids, mask, "ctrl_3d")


if __name__ == "__main__":
    main()
