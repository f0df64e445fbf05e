"""Fused FFN+LayerNorm Pallas sublayer (ops/pallas/ffn.py).

CPU tier: interpret-mode kernel numerics vs the XLA reference, and the
BertLayer dispatch (fused vs classic paths produce the same outputs from
the same param tree). Compiled-vs-interpret parity on the real chip
lives in tests/test_tpu_kernels.py (`-m tpu`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rare_disease_tpu.ops.pallas import ffn as ffn_mod
from multimodal_rare_disease_tpu.ops.pallas.ffn import (
    ffn_ln_fusible,
    ffn_ln_reference,
    fused_ffn_ln,
)

pytestmark = pytest.mark.smoke


def _make(M, H, F, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dtype)
    w1 = jnp.asarray(rng.normal(size=(H, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, H)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    g = jnp.asarray(1.0 + rng.normal(size=(H,)) * 0.05, jnp.float32)
    o = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    return x, (w1, b1, w2, b2, g, o)


def test_interpret_matches_reference_f32():
    x, args = _make(64, 256, 512, jnp.float32)
    got = np.asarray(fused_ffn_ln(x, *args, interpret=True))
    ref = np.asarray(ffn_ln_reference(x, *args))
    # erf polynomial (|err|<=1.5e-7) + two-pass vs fast variance
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_interpret_matches_reference_bf16():
    x, args = _make(64, 256, 512, jnp.bfloat16, seed=1)
    got = np.asarray(fused_ffn_ln(x, *args, interpret=True), np.float32)
    ref = np.asarray(ffn_ln_reference(x, *args), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-2)


def test_interpret_matches_reference_folded_ln_f32():
    """pre_gamma path: the kernel takes the UNNORMALIZED residual z and
    folds the attention LayerNorm in — must equal LN0(z) fed through the
    plain reference. (Previously covered only by the on-TPU tier.)"""
    z, args = _make(64, 256, 512, jnp.float32, seed=3)
    rng = np.random.default_rng(4)
    g0 = jnp.asarray(1.0 + rng.normal(size=(256,)) * 0.05, jnp.float32)
    o0 = jnp.asarray(rng.normal(size=(256,)) * 0.01, jnp.float32)
    got = np.asarray(fused_ffn_ln(z, *args, interpret=True,
                                  pre_gamma=g0, pre_beta=o0))
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    h = ((z - mu) * jax.lax.rsqrt(var + 1e-12) * g0 + o0).astype(z.dtype)
    ref = np.asarray(ffn_ln_reference(h, *args))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_interpret_matches_reference_folded_ln_bf16():
    z, args = _make(64, 256, 512, jnp.bfloat16, seed=5)
    rng = np.random.default_rng(6)
    g0 = jnp.asarray(1.0 + rng.normal(size=(256,)) * 0.05, jnp.float32)
    o0 = jnp.asarray(rng.normal(size=(256,)) * 0.01, jnp.float32)
    got = np.asarray(fused_ffn_ln(z, *args, interpret=True,
                                  pre_gamma=g0, pre_beta=o0), np.float32)
    zf = z.astype(jnp.float32)
    mu = jnp.mean(zf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(zf - mu), axis=-1, keepdims=True)
    h = ((zf - mu) * jax.lax.rsqrt(var + 1e-12) * g0 + o0).astype(z.dtype)
    ref = np.asarray(ffn_ln_reference(h, *args), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-2)


def test_block_rows_cover_serving_buckets():
    # every (batch bucket x length bucket) M plus the cls-only layer
    # M=B must either tile or fall back via the fusibility gate
    for B in (1, 8, 32, 256):
        for T in (32, 64, 128, 256):
            m = B * T
            if ffn_ln_fusible(m, 768, 3072):
                assert m % ffn_mod._pick_block_rows(m) == 0
        if ffn_ln_fusible(B, 768, 3072):
            assert B % ffn_mod._pick_block_rows(B) == 0
    assert not ffn_ln_fusible(8, 768, 3072)      # tiny cls-only falls back
    assert not ffn_ln_fusible(512, 100, 3072)    # unaligned H falls back


def test_bert_layer_fused_matches_classic():
    """Same params, fused vs classic dispatch — outputs must agree."""
    from multimodal_rare_disease_tpu.models.bert import BertEncoder

    B, T, H, F, heads = 2, 16, 128, 256, 2
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 50, (B, T)), jnp.int32)
    mask = jnp.asarray((np.arange(T)[None] < [[12], [16]]).astype(np.int32))

    kw = dict(vocab_size=50, hidden_size=H, num_layers=2, num_heads=heads,
              intermediate_size=F, max_position_embeddings=T,
              dtype=jnp.float32)
    classic = BertEncoder(fused_ffn=False, **kw)
    fused = BertEncoder(fused_ffn=True, **kw)
    variables = classic.init(jax.random.key(0), ids, mask)

    ref = classic.apply(variables, ids, mask)["last_hidden_state"]
    ffn_mod.FORCE_INTERPRET = True
    try:
        got = fused.apply(variables, ids, mask)["last_hidden_state"]
    finally:
        ffn_mod.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_bert_layer_fused_param_tree_identical():
    """fused_ffn=True must init the exact same param tree (checkpoint
    interchangeability), even when the fused branch traces."""
    from multimodal_rare_disease_tpu.models.bert import BertEncoder

    B, T = 2, 16
    ids = jnp.zeros((B, T), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    kw = dict(vocab_size=50, hidden_size=128, num_layers=1, num_heads=2,
              intermediate_size=256, max_position_embeddings=T,
              dtype=jnp.float32)
    v_classic = BertEncoder(fused_ffn=False, **kw).init(
        jax.random.key(0), ids, mask)
    ffn_mod.FORCE_INTERPRET = True
    try:
        v_fused = BertEncoder(fused_ffn=True, **kw).init(
            jax.random.key(0), ids, mask)
    finally:
        ffn_mod.FORCE_INTERPRET = False

    t1 = jax.tree.structure(v_classic)
    t2 = jax.tree.structure(v_fused)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(v_classic), jax.tree.leaves(v_fused)):
        assert a.shape == b.shape and a.dtype == b.dtype
