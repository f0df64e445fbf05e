from multimodal_rare_disease_tpu.utils import rng  # noqa: F401
