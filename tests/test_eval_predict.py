"""Evaluator + predictor integration over a tiny trained model."""

from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # one-epoch trainings: minutes on CPU

from multimodal_rare_disease_tpu.evaluation import Evaluator, compare_models
from multimodal_rare_disease_tpu.inference import load_predictor
from multimodal_rare_disease_tpu.train import Trainer
from multimodal_rare_disease_tpu.train.pipeline import DataPipeline

from tests.test_trainer import REF_IMAGES, small_cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One-epoch image_only training on the real corpus, shared by tests."""
    if not REF_IMAGES.is_dir():
        pytest.skip("reference corpus absent")
    workdir = tmp_path_factory.mktemp("ckpt")
    cfg = small_cfg()
    pipeline = DataPipeline(cfg, mode="image_only", image_dir=str(REF_IMAGES))
    trainer = Trainer(cfg, mode="image_only", pipeline=pipeline,
                      workdir=str(workdir))
    trainer.train(num_epochs=1)
    return cfg, trainer, pipeline, workdir


def test_evaluator_full_artifacts(trained, tmp_path):
    cfg, trainer, pipeline, _ = trained
    ev = Evaluator(cfg, trainer.model, trainer.state.params,
                   trainer.state.batch_stats, mode="image_only")
    collected = ev.collect_predictions(pipeline.val_batches())
    assert len(collected["labels"]) == len(pipeline.val_samples)
    assert collected["probabilities"].shape[1] == 10

    metrics = ev.save_results(collected, tmp_path)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert "per_class" in metrics and len(metrics["per_class"]) == 10
    for f in ["image_only_metrics.json", "image_only_predictions.npz",
              "image_only_confusion_matrix.png", "image_only_roc_curves.png",
              "image_only_per_class_metrics.png",
              "image_only_classification_report.txt"]:
        assert (tmp_path / f).exists(), f

    npz = np.load(tmp_path / "image_only_predictions.npz")
    np.testing.assert_array_equal(npz["labels"], collected["labels"])

    table = compare_models({"image_only": metrics}, tmp_path)
    assert "image_only" in table
    assert (tmp_path / "model_comparison.json").exists()
    assert (tmp_path / "model_comparison.png").exists()


def test_predictor_json_contract(trained):
    cfg, trainer, pipeline, workdir = trained
    pred = load_predictor(workdir / "image_only_best")
    img_path = pipeline.val_samples[0].path
    result = pred.predict(image=img_path, top_k=5)

    assert set(result) == {"predictions", "top_prediction",
                           "all_probabilities"}
    assert len(result["predictions"]) == 5
    p0 = result["predictions"][0]
    assert set(p0) == {"syndrome", "class_id", "confidence",
                       "probability_percent"}
    assert result["top_prediction"] == p0
    assert len(result["all_probabilities"]) == 10
    total = sum(result["all_probabilities"].values())
    assert total == pytest.approx(1.0, abs=1e-3)
    # descending confidence
    confs = [p["confidence"] for p in result["predictions"]]
    assert confs == sorted(confs, reverse=True)

    report = pred.format_report(result, patient_id="T-1")
    assert "RARE DISEASE DIAGNOSIS REPORT" in report
    assert p0["syndrome"] in report


def test_predictor_batch_and_embeddings(trained):
    cfg, trainer, pipeline, workdir = trained
    pred = load_predictor(workdir / "image_only_best")
    paths = [s.path for s in pipeline.val_samples[:3]]
    results = pred.predict_batch(images=paths, top_k=3,
                                 return_embeddings=True)
    assert len(results) == 3
    for r in results:
        assert len(r["predictions"]) == 3
        assert "embeddings" in r and "image" in r["embeddings"]


def test_predictor_accepts_array_input(trained):
    cfg, trainer, pipeline, workdir = trained
    pred = load_predictor(workdir / "image_only_best")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    result = pred.predict(image=arr, top_k=1)
    assert result["top_prediction"]["class_id"] in range(10)


def test_predictor_wrong_modality_raises(trained):
    cfg, trainer, pipeline, workdir = trained
    pred = load_predictor(workdir / "image_only_best")
    with pytest.raises(ValueError):
        pred.predict_batch(images=None, texts=["hello"])
