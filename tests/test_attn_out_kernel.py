"""Fused attention-output sublayer (ops/pallas/attn_out.py) and the
attention lane-padding fast path (models/bert.py).

CPU tier: interpret-mode kernel numerics vs the XLA reference, the
BertLayer dispatch (fused vs classic outputs from one param tree), and
exactness of the T%128 lane-padding (padded keys' -1e9 bias underflows
to exactly 0 in the f32 softmax, so the forward is bit-identical).
Compiled-vs-interpret parity on the real chip lives in
tests/test_tpu_kernels.py (`-m tpu`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_rare_disease_tpu.ops.pallas import attn_out as ao_mod
from multimodal_rare_disease_tpu.ops.pallas.attn_out import (
    attn_out_ln_fusible,
    attn_out_ln_reference,
    fused_attn_out_ln,
)

pytestmark = pytest.mark.smoke


def _make(M, H, dtype, seed=0):
    rng = np.random.default_rng(seed)
    ctx = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dtype)
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dtype)
    wo = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    g = jnp.asarray(1.0 + rng.normal(size=(H,)) * 0.05, jnp.float32)
    o = jnp.asarray(rng.normal(size=(H,)) * 0.01, jnp.float32)
    return ctx, x, (wo, bo, g, o)


def test_interpret_matches_reference_f32():
    ctx, x, args = _make(64, 256, jnp.float32)
    got = np.asarray(fused_attn_out_ln(ctx, x, *args, interpret=True))
    ref = np.asarray(attn_out_ln_reference(ctx, x, *args))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_interpret_matches_reference_bf16():
    ctx, x, args = _make(64, 256, jnp.bfloat16, seed=1)
    got = np.asarray(fused_attn_out_ln(ctx, x, *args, interpret=True),
                     np.float32)
    ref = np.asarray(attn_out_ln_reference(ctx, x, *args), np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-2)


def test_fusible_gate():
    assert attn_out_ln_fusible(32 * 128, 768)
    assert not attn_out_ln_fusible(8, 768)     # tiny batch falls back
    assert not attn_out_ln_fusible(512, 100)   # unaligned H falls back


def test_bert_layer_fused_attn_out_matches_classic():
    """Same params, fused_attn_out vs classic dispatch."""
    from multimodal_rare_disease_tpu.models.bert import BertEncoder

    B, T, H, F, heads = 2, 16, 128, 256, 2
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 50, (B, T)), jnp.int32)
    mask = jnp.asarray((np.arange(T)[None] < [[12], [16]]).astype(np.int32))

    kw = dict(vocab_size=50, hidden_size=H, num_layers=2, num_heads=heads,
              intermediate_size=F, max_position_embeddings=T,
              fused_ffn=False, dtype=jnp.float32)
    classic = BertEncoder(fused_attn_out=False, **kw)
    fused = BertEncoder(fused_attn_out=True, **kw)
    variables = classic.init(jax.random.key(0), ids, mask)

    ref = classic.apply(variables, ids, mask)["last_hidden_state"]
    ao_mod.FORCE_INTERPRET = True
    try:
        v_fused = fused.init(jax.random.key(0), ids, mask)
        assert jax.tree.structure(v_fused) == jax.tree.structure(variables)
        got = fused.apply(variables, ids, mask)["last_hidden_state"]
    finally:
        ao_mod.FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_attention_lane_padding_is_exact():
    """T=96 inference pads the attention core to 128 internally; the
    result must be bit-identical to tokenizer-level padding to 128
    (the previous serving behavior for these texts)."""
    from multimodal_rare_disease_tpu.models.bert import BertEncoder

    B, H, heads = 3, 128, 2
    rng = np.random.default_rng(3)
    enc = BertEncoder(vocab_size=60, hidden_size=H, num_layers=2,
                      num_heads=heads, intermediate_size=256,
                      max_position_embeddings=256, fused_ffn=False, dtype=jnp.float32)
    T = 96
    ids = np.asarray(rng.integers(1, 60, (B, T)), np.int32)
    lens = np.array([50, 96, 77])
    mask = (np.arange(T)[None] < lens[:, None]).astype(np.int32)
    v = enc.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))
    a = np.asarray(enc.apply(v, jnp.asarray(ids), jnp.asarray(mask))["cls"])

    ids128 = np.zeros((B, 128), np.int32)
    ids128[:, :T] = ids
    mask128 = np.zeros((B, 128), np.int32)
    mask128[:, :T] = mask
    b = np.asarray(enc.apply(v, jnp.asarray(ids128),
                             jnp.asarray(mask128))["cls"])
    np.testing.assert_array_equal(a, b)
