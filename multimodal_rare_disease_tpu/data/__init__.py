from multimodal_rare_disease_tpu.data.tokenizer import (  # noqa: F401
    BertWordPieceTokenizer,
    build_wordpiece_vocab,
    get_tokenizer,
)
