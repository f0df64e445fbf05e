"""Golden-regression tests: fixed-seed tiny-model forwards pinned to
stored values (SURVEY.md §4's golden-parity strategy, applied to our own
outputs since the reference ships no checkpoints). Catches silent
numerics drift from refactors. Tolerances are loose enough to survive
compiler updates but tight enough to catch real changes."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.models import create_model
from multimodal_rare_disease_tpu.ops.preprocess import (
    eval_preprocess,
    train_preprocess,
)

from tests.test_trainer import small_cfg


def test_golden_multimodal_forward():
    cfg = small_cfg()
    model = create_model(cfg, mode="multimodal", dtype=jnp.float32)
    T = cfg.data.max_text_length
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (2, 64, 64, 3)) / 255.0,
                         jnp.float32)
    ids = jnp.asarray(rng.integers(0, 100, (2, T)), jnp.int32)
    mask = jnp.ones((2, T), jnp.int32)
    variables = model.init(jax.random.key(42), images, ids, mask)
    out = model.apply(variables, images, ids, mask)
    probs = np.asarray(out["probs"])

    # pinned from the first verified implementation (2026-08-16)
    golden_row0 = np.array(
        [0.10361765, 0.05636425, 0.04153683, 0.10691006, 0.12991865,
         0.09428056, 0.16161568, 0.12364437, 0.14166114, 0.04045079],
        np.float32)
    if not np.allclose(probs[0], golden_row0, atol=5e-4):
        raise AssertionError(
            f"golden drift:\n got {probs[0].tolist()}\n want "
            f"{golden_row0.tolist()}")


def test_golden_eval_preprocess():
    cfg = resolve_config()
    u8 = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (1, 256, 256, 3),
                                          dtype=np.uint8))
    out = np.asarray(eval_preprocess(u8, cfg, use_pallas=False))
    # pinned statistics of the deterministic resize_crop+normalize
    # (repinned 2026-08-16 when eval geometry became PIL-exact
    # Resize(234)+CenterCrop(224) with antialiasing)
    assert abs(float(out.mean()) - 0.22729) < 2e-3, float(out.mean())
    assert abs(float(out.std()) - 0.79366) < 2e-2, float(out.std())


def test_golden_train_preprocess_seeded():
    cfg = resolve_config()
    u8 = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (1, 256, 256, 3),
                                          dtype=np.uint8))
    out = np.asarray(train_preprocess(u8, jax.random.key(7), cfg))
    assert out.shape == (1, 224, 224, 3)
    # the invariant: deterministic across runs for the same (data, key)
    out2 = np.asarray(train_preprocess(u8, jax.random.key(7), cfg))
    np.testing.assert_array_equal(out, out2)
