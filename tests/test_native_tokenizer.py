"""C++ WordPiece core: byte-exactness vs the Python reference + speed."""

import time

import numpy as np
import pytest

from multimodal_rare_disease_tpu.config import resolve_config
from multimodal_rare_disease_tpu.data.clinical_text import (
    ClinicalTextAugmenter,
    load_clinical_descriptions,
)
from multimodal_rare_disease_tpu.data.tokenizer import (
    BertWordPieceTokenizer,
    build_wordpiece_vocab,
)
from multimodal_rare_disease_tpu.native import wordpiece_lib


@pytest.fixture(scope="module")
def clinical_texts():
    cfg = resolve_config()
    desc = load_clinical_descriptions(cfg)
    aug = ClinicalTextAugmenter(desc, np.random.default_rng(0))
    texts = []
    for name in cfg.syndrome_names:
        for lvl in range(4):
            for _ in range(4):
                texts.append(aug.augment(name, lvl))
    return texts


@pytest.fixture(scope="module")
def tok(clinical_texts):
    return BertWordPieceTokenizer(build_wordpiece_vocab(clinical_texts))


def test_native_lib_builds():
    assert wordpiece_lib() is not None, "g++ build failed"


def test_native_matches_python_on_clinical_corpus(tok, clinical_texts):
    ids_n, mask_n, _ = tok.encode_batch(clinical_texts, 128, use_native=True)
    ids_p, mask_p, _ = tok.encode_batch(clinical_texts, 128, use_native=False)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_native_matches_python_random_ascii(tok):
    rng = np.random.default_rng(1)
    alphabet = list("abcdefghijklmnopqrstuvwxyz  ,.;:!()-'\"0123456789")
    texts = ["".join(rng.choice(alphabet, size=rng.integers(5, 200)))
             for _ in range(100)]
    ids_n, mask_n, _ = tok.encode_batch(texts, 64, use_native=True)
    ids_p, mask_p, _ = tok.encode_batch(texts, 64, use_native=False)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_native_truncation_and_empty(tok):
    texts = ["", "synophrys " * 100]
    ids_n, mask_n, _ = tok.encode_batch(texts, 16, use_native=True)
    ids_p, mask_p, _ = tok.encode_batch(texts, 16, use_native=False)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)
    assert mask_n[0].sum() == 2  # [CLS] [SEP]
    assert mask_n[1].sum() == 16


def test_cjk_falls_back_to_python(tok):
    texts = ["syndrome 中文 text"]
    # native path must decline; result still correct via fallback
    out = tok._native_encode_batch(texts, 32)
    assert out is None
    ids, mask, _ = tok.encode_batch(texts, 32)
    assert mask[0].sum() >= 4


def test_any_non_ascii_falls_back_to_python(tok):
    # the C++ core classifies whitespace/punct with ASCII tables only:
    # en-dash, NBSP, smart quotes, accents must all route to Python so
    # training and inference tokenize identically
    for t in ["micro–gnathia", "cleft palate", "café lesion",
              "“broad” forehead"]:
        assert not tok._native_ok([t]), t
        assert tok._native_encode_batch([t], 32) is None
    assert tok._native_ok(["plain ascii text."])


def test_native_speedup(tok, clinical_texts):
    texts = clinical_texts * 30  # ~4800 texts
    t0 = time.perf_counter()
    tok.encode_batch(texts, 128, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    tok.encode_batch(texts, 128, use_native=False)
    t_python = time.perf_counter() - t0
    speedup = t_python / t_native
    rate = len(texts) / t_native
    print(f"\nnative: {t_native*1e3:.0f} ms ({rate:,.0f} texts/s), "
          f"python: {t_python*1e3:.0f} ms, speedup {speedup:.1f}x")
    assert speedup > 3, speedup
