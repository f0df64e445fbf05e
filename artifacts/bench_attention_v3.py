"""SUPERSEDED — RTT-floor-limited like bench_attention.py; valid
re-measurements live in bench_attention_v4.py.

Attention kernel v3 candidates vs XLA, varying-input scan harness.

Diagnosis so far (v5e, B=256 T=128 H=12 D=64, bf16):
  xla_f32      ~3.6 ms/layer-batch   (f32 softmax materialized in HBM)
  pallas_v2    ~4.2 ms  (grid=(B,), per-head lane slices; ~14us/step fixed)
  jax flash    ~6.0 ms  (per-(b,h) grid drowns at these shapes)
Floor: ~0.25 ms HBM qkv+out traffic, ~0.07 ms MXU.

v3 hypotheses:
  a) batch G elements per grid step, batched dot_general over G
     (12 dots/step instead of 12*G) -> fewer steps, bigger dots.
  b) the h*64 lane-offset slices force Mosaic relayouts; pre-transposing
     to [B*H, T, D] outside the kernel (4 extra HBM passes ~0.25ms) and
     batching G2 problems per step may win despite the transposes.

Run: PYTHONPATH=/root/repo python artifacts/bench_attention_v3.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, H, D = 256, 128, 12, 64
K = 8


def xla_f32(q, k, v, bias):
    s = jnp.einsum("bthd,bshd->bhts", q, k) / (D ** 0.5) \
        + bias[:, :, None].astype(q.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


# --- v3a: grid=(B//G,), native [G,T,H*D] blocks, G-batched dots per head ---

def _kernel_v3a(q_ref, k_ref, v_ref, bias_ref, o_ref, *, G):
    b = bias_ref[:, 0, :][:, None, :].astype(jnp.float32)     # [G,1,T]
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[:, :, sl]                                    # [G,T,D]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # [G,T,T]
        s = s * (1.0 / D ** 0.5) + b
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[:, :, sl] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_v3a(G):
    def fn(q, k, v, bias):
        qf, kf, vf = (x.reshape(B, T, H * D) for x in (q, k, v))
        spec = pl.BlockSpec((G, T, H * D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((G, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_v3a, G=G), grid=(B // G,),
            in_specs=[spec, spec, spec, bspec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, T, H * D), q.dtype),
        )(qf, kf, vf, bias)
        return out.reshape(B, T, H, D)
    return fn


# --- v3b: pre-transposed [B*H, T, D]; G2 problems per step, batched dot ---

def _kernel_v3b(q_ref, k_ref, v_ref, bias_ref, o_ref):
    b = bias_ref[:, 0, :][:, None, :].astype(jnp.float32)      # [G2,1,T]
    s = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # [G2,T,T]
    s = s * (1.0 / D ** 0.5) + b
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def make_v3b(G2):
    def fn(q, k, v, bias):
        def tr(x):
            return x.transpose(0, 2, 1, 3).reshape(B * H, T, D)
        qf, kf, vf = tr(q), tr(k), tr(v)
        # bias per (b,h) problem: repeat each batch bias H times
        bias_bh = jnp.repeat(bias, H, axis=0)                  # [B*H,1,T]
        spec = pl.BlockSpec((G2, T, D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((G2, 1, T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            _kernel_v3b, grid=(B * H // G2,),
            in_specs=[spec, spec, spec, bspec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        )(qf, kf, vf, bias_bh)
        return out.reshape(B, H, T, D).transpose(0, 2, 1, 3)
    return fn


def measure(fn, qs, ks, vs, bias):
    @jax.jit
    def run(qs, ks, vs, bias):
        def step(c, xs):
            return c + jnp.sum(fn(*xs, bias).astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), (qs, ks, vs))
        return tot

    float(run(qs, ks, vs, bias))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(qs, ks, vs, bias))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / K * 1000


def main():
    rng = np.random.default_rng(0)
    qs = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    ks = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(K, B, T, H, D)), jnp.bfloat16)
    bias = jnp.zeros((B, 1, T), jnp.float32)

    ref = np.asarray(xla_f32(qs[0], ks[0], vs[0], bias), np.float32)
    cases = [("xla_f32", xla_f32)]
    for G in (4, 8):
        cases.append((f"v3a_G{G}", make_v3a(G)))
    for G2 in (16, 32, 64):
        cases.append((f"v3b_G{G2}", make_v3b(G2)))
    for name, fn in cases:
        try:
            t = measure(fn, qs, ks, vs, bias)
            d = float(np.abs(np.asarray(fn(qs[0], ks[0], vs[0], bias),
                                        np.float32) - ref).max())
            print(f"{name:10s}: {t:7.3f} ms/layer-batch  maxdiff {d:.2e}",
                  flush=True)
        except Exception as e:
            print(f"{name:10s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
