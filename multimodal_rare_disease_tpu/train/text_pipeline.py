"""Text-corpus pipeline: FGDD patient phenotype texts (or any
(texts, labels) set) → fixed-shape batches.

Capability parity with the reference's real-data path
(`src/train.py:628-873`): FGDD.csv's one-hot HP:* phenotype columns
become "Patient presents with: …" narratives labeled by the top-10 most
frequent diseases; here they feed the same unified Trainer in text_only
mode (and optionally multimodal mode via the reference's cycle-pairing of
texts onto corpus images — a documented non-semantic pairing,
`src/train.py:797-811`).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_rare_disease_tpu.config import Config
from multimodal_rare_disease_tpu.data.tokenizer import (
    BertWordPieceTokenizer,
    build_wordpiece_vocab,
)
from multimodal_rare_disease_tpu.utils.rng import RngStreams


class TextDataPipeline:
    """Trainer-compatible pipeline over (texts, labels)."""

    def __init__(
        self,
        cfg: Config,
        texts: Sequence[str],
        labels: Sequence[int],
        class_names: Optional[Sequence[str]] = None,
        tokenizer: Optional[BertWordPieceTokenizer] = None,
        rngs: Optional[RngStreams] = None,
        val_fraction: Optional[float] = None,
    ):
        assert len(texts) == len(labels)
        self.cfg = cfg
        self.rngs = rngs or RngStreams(cfg.seed)
        self.class_names = list(class_names) if class_names else None
        num_classes = cfg.classifier.num_classes

        self.tokenizer = tokenizer or BertWordPieceTokenizer(
            build_wordpiece_vocab(texts, vocab_size=8192))

        T = cfg.data.max_text_length
        ids, mask, _ = self.tokenizer.encode_batch(list(texts), T)
        labels = np.asarray(labels, np.int32)

        # stratified split
        rng = self.rngs.host("split")
        vf = val_fraction if val_fraction is not None else cfg.data.val_ratio
        train_idx, val_idx = [], []
        for c in range(num_classes):
            rows = np.nonzero(labels == c)[0]
            if len(rows) == 0:
                continue
            perm = rng.permutation(len(rows))
            n_val = max(1, int(round(len(rows) * vf))) if len(rows) > 1 else 0
            val_idx.extend(rows[perm[:n_val]])
            train_idx.extend(rows[perm[n_val:]])
        self.train_idx = np.asarray(sorted(train_idx))
        self.val_idx = np.asarray(sorted(val_idx))

        self.ids, self.mask, self.labels = ids, mask, labels

        counts = np.bincount(labels[self.train_idx], minlength=num_classes)
        total = counts.sum()
        self.class_weights = np.where(
            counts > 0, total / (num_classes * np.maximum(counts, 1)), 0.0
        ).astype(np.float32)

        self._sampler_rng = self.rngs.host("sampler")

    @property
    def train_samples(self) -> np.ndarray:  # Trainer logging parity
        return self.train_idx

    @property
    def val_samples(self) -> np.ndarray:
        return self.val_idx

    @property
    def steps_per_epoch(self) -> int:
        B = self.cfg.training.batch_size
        n = len(self.train_idx) * max(1, self.cfg.data.augmentation_factor)
        return max(1, n // B)

    def train_batches(self) -> Iterator[Dict[str, np.ndarray]]:
        B = self.cfg.training.batch_size
        n_draw = len(self.train_idx) * max(1, self.cfg.data.augmentation_factor)
        if self.cfg.data.use_weighted_sampling:
            w = self.class_weights[self.labels[self.train_idx]]
            p = w / w.sum()
            order = self._sampler_rng.choice(len(self.train_idx),
                                             size=n_draw, replace=True, p=p)
        else:
            order = self._sampler_rng.permutation(
                np.tile(np.arange(len(self.train_idx)),
                        max(1, self.cfg.data.augmentation_factor)))[:n_draw]
        rows = self.train_idx[order]
        for s in range(len(rows) // B):
            sl = rows[s * B:(s + 1) * B]
            yield {
                "input_ids": self.ids[sl],
                "attention_mask": self.mask[sl],
                "labels": self.labels[sl],
                "valid": np.ones(B, np.float32),
            }

    def val_batches(self, batch_size: Optional[int] = None
                    ) -> Iterator[Dict[str, np.ndarray]]:
        B = batch_size or self.cfg.evaluation.eval_batch_size
        rows = self.val_idx
        for s in range(0, len(rows), B):
            sl = rows[s:s + B]
            pad = B - len(sl)
            valid = np.ones(len(sl), np.float32)
            if pad:
                sl = np.concatenate([sl, np.zeros(pad, np.int64)])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            yield {
                "input_ids": self.ids[sl],
                "attention_mask": self.mask[sl],
                "labels": self.labels[sl],
                "valid": valid,
            }


def fgdd_text_pipeline(cfg: Config, fgdd_dir: Optional[str] = None,
                       top_k_diseases: int = 10) -> TextDataPipeline:
    """Build the FGDD text_only pipeline (ref `src/train.py:628-710`)."""
    from multimodal_rare_disease_tpu.data.parsers import load_fgdd

    data = load_fgdd(cfg, fgdd_dir=fgdd_dir, top_k_diseases=top_k_diseases)
    if data is None:
        raise FileNotFoundError("FGDD corpus not found in data roots")
    return TextDataPipeline(cfg, data["texts"], data["labels"],
                            class_names=data["disease_names"])


def fgdd_multimodal_pipeline(cfg: Config, fgdd_dir: Optional[str] = None,
                             image_dir: Optional[str] = None,
                             top_k_diseases: int = 10):
    """FGDD→multimodal cycle-pairing (ref `src/train.py:797-811`).

    The reference pairs each corpus image (global position i) with FGDD
    text (i mod n_texts) and takes labels FROM THE IMAGES — a documented
    non-semantic pairing (the FGDD diseases and the 10 image syndromes do
    not overlap). Reproduced behaviorally on top of the image
    `DataPipeline`: the class-level clinical text pool is replaced with a
    per-sample FGDD text pool, gathered on device through the trainer's
    pool[labels, levels, variants] indexing with variants = pos mod N.
    """
    from multimodal_rare_disease_tpu.config import (
        SYNDROME_NAMES,
        find_image_dir,
    )
    from multimodal_rare_disease_tpu.data.images import scan_image_corpus
    from multimodal_rare_disease_tpu.data.parsers import load_fgdd
    from multimodal_rare_disease_tpu.train.pipeline import (
        DataPipeline,
        TextPool,
    )

    data = load_fgdd(cfg, fgdd_dir=fgdd_dir, top_k_diseases=top_k_diseases)
    if data is None:
        raise FileNotFoundError("FGDD corpus not found in data roots")

    d = image_dir or find_image_dir(cfg)
    if d is None:
        raise FileNotFoundError("no image directory found in data roots")
    samples = list(scan_image_corpus(d))
    orig_pos = {s.path: i for i, s in enumerate(samples)}

    texts: List[str] = list(data["texts"])
    tok = BertWordPieceTokenizer(build_wordpiece_vocab(texts, 8192))

    pipe = DataPipeline(cfg, mode="multimodal", image_dir=d,
                        tokenizer=tok, samples=samples)

    T = cfg.data.max_text_length
    ids, mask, _ = tok.encode_batch(texts, T)
    n_texts = len(texts)
    C = len(SYNDROME_NAMES)
    # per-sample pool shaped for the trainer's on-device
    # pool[labels, levels, variants] gather: class axis broadcast (text
    # choice is independent of the image label in this pairing)
    pool_ids = np.broadcast_to(
        ids[None, None].astype(np.int32), (C, 1, n_texts, T)).copy()
    pool_mask = np.broadcast_to(
        mask[None, None].astype(np.int32), (C, 1, n_texts, T)).copy()
    pipe.text_pool = TextPool(pool_ids, pool_mask)

    train_tidx = np.asarray([orig_pos[s.path] % n_texts
                             for s in pipe.train_samples], np.int32)
    val_tidx = np.asarray([orig_pos[s.path] % n_texts
                           for s in pipe.val_samples], np.int32)

    def train_index_batches():
        B = cfg.training.batch_size
        idx = pipe._indices_for_epoch()
        for s in range(len(idx) // B):
            rows = idx[s * B:(s + 1) * B].astype(np.int32)
            yield {"rows": rows,
                   "levels": np.zeros(B, np.int32),
                   "variants": train_tidx[rows]}

    def val_index_batches(batch_size: Optional[int] = None):
        B = batch_size or cfg.evaluation.eval_batch_size
        n = len(pipe.val_samples)
        for s in range(0, n, B):
            rows = np.arange(s, min(s + B, n), dtype=np.int32)
            pad = B - len(rows)
            valid = np.ones(len(rows), np.float32)
            if pad:
                rows = np.concatenate([rows, np.zeros(pad, np.int32)])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            yield {"rows": rows, "valid": valid,
                   "levels": np.zeros(B, np.int32),
                   "variants": val_tidx[rows]}

    def _attach_paired_text(batch, rows):
        batch["input_ids"] = ids[train_tidx[rows]].astype(np.int32)
        batch["attention_mask"] = mask[train_tidx[rows]].astype(np.int32)

    def train_batches():
        B = cfg.training.batch_size
        idx = pipe._indices_for_epoch()
        for s in range(len(idx) // B):
            rows = idx[s * B:(s + 1) * B]
            labels = pipe.train_labels[rows]
            batch = {"labels": labels, "valid": np.ones(B, np.float32),
                     "images": pipe.train_images[rows]}
            _attach_paired_text(batch, rows)
            yield batch

    def val_batches(batch_size: Optional[int] = None):
        B = batch_size or cfg.evaluation.eval_batch_size
        n = len(pipe.val_samples)
        for s in range(0, n, B):
            rows = np.arange(s, min(s + B, n))
            pad = B - len(rows)
            labels = pipe.val_labels[rows]
            valid = np.ones(len(rows), np.float32)
            if pad:
                rows = np.concatenate([rows, np.zeros(pad, np.int64)])
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            batch = {"labels": labels, "valid": valid,
                     "images": pipe.val_images[rows]}
            tix = val_tidx[np.minimum(rows, n - 1)]  # pad rows reuse row 0
            batch["input_ids"] = ids[tix].astype(np.int32)
            batch["attention_mask"] = mask[tix].astype(np.int32)
            yield batch

    pipe.train_index_batches = train_index_batches
    pipe.val_index_batches = val_index_batches
    pipe.train_batches = train_batches
    pipe.val_batches = val_batches
    pipe.fgdd_n_texts = n_texts
    return pipe
