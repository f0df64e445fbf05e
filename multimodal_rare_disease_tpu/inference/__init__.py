from multimodal_rare_disease_tpu.inference.predictor import (  # noqa: F401
    MultimodalPredictor,
    load_predictor,
)
