from multimodal_rare_disease_tpu.models.resnet import ResNet50Encoder  # noqa: F401
from multimodal_rare_disease_tpu.models.efficientnet import EfficientNetB0Encoder  # noqa: F401
from multimodal_rare_disease_tpu.models.cnn_encoder import CNNEncoder, create_cnn_encoder  # noqa: F401
from multimodal_rare_disease_tpu.models.bert import BertEncoder, TextEncoder, create_text_encoder  # noqa: F401
from multimodal_rare_disease_tpu.models.fusion import (  # noqa: F401
    ConcatenationFusion,
    AttentionFusion,
    GatedFusion,
    create_fusion_module,
)
from multimodal_rare_disease_tpu.models.classifier import (  # noqa: F401
    ClassificationHead,
    MultimodalClassifier,
    ImageOnlyClassifier,
    TextOnlyClassifier,
    create_model,
)
