"""Pallas fused MHA: numerics parity with the XLA softmax path."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.ops.pallas.attention import fused_mha


def _reference_mha(q, k, v, mask):
    d = q.shape[-1]
    bias = (1.0 - mask[:, None, None, :].astype(np.float32)) * -1e9
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(d) + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs.astype(q.dtype), v)


def test_fused_mha_matches_xla_f32():
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 128, 4, 64
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    mask = np.ones((B, T), np.int32)
    mask[0, 100:] = 0
    mask = jnp.asarray(mask)
    out = fused_mha(q, k, v, mask)
    ref = _reference_mha(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_mha_bf16():
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 64, 2, 32
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)
    out = fused_mha(q, k, v, mask)
    ref = _reference_mha(q, k, v, mask)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_padding_fully_ignored():
    """Garbage K/V under the mask must not change the output."""
    rng = np.random.default_rng(2)
    B, T, H, D = 1, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = np.asarray(rng.normal(size=(B, T, H, D)), np.float32)
    v = np.asarray(rng.normal(size=(B, T, H, D)), np.float32)
    mask = np.ones((B, T), np.int32)
    mask[0, 20:] = 0
    o1 = fused_mha(q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    k[0, 20:] = 99.0
    v[0, 20:] = -99.0
    o2 = fused_mha(q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o1)[:, :20], np.asarray(o2)[:, :20],
                               atol=1e-5)


def test_bert_encoder_pallas_vs_xla_path():
    """Full BertEncoder: fused_attention=True must equal =False exactly in
    inference (same math, different scheduling)."""
    from multimodal_rare_disease_tpu.models.bert import BertEncoder

    ids = jnp.asarray(np.random.default_rng(3).integers(0, 100, (2, 32)),
                      jnp.int32)
    mask = jnp.asarray((np.arange(32)[None, :] < np.array([[32], [20]])
                        ).astype(np.int32))
    kw = dict(vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
              intermediate_size=128, dropout=0.0)
    enc_fused = BertEncoder(fused_attention=True, **kw)
    enc_xla = BertEncoder(fused_attention=False, **kw)
    variables = enc_fused.init(jax.random.key(0), ids, mask)
    out_f = enc_fused.apply(variables, ids, mask)
    out_x = enc_xla.apply(variables, ids, mask)
    np.testing.assert_allclose(np.asarray(out_f["cls"]),
                               np.asarray(out_x["cls"]), atol=1e-5)
