from difashion_tpu.data.datasets import (
    FashionData,
    HistLatentStore,
    OutfitTable,
    TrainLoader,
    load_npy_dict,
)
from difashion_tpu.data.prompts import (
    EVAL_SPECIAL_CATES,
    TRAIN_SPECIAL_CATES,
    build_eval_prompts,
    build_train_prompts,
    eval_prompt,
    train_prompt,
)
from difashion_tpu.data.tokenizer import (
    CLIPBPETokenizer,
    HashTokenizer,
    load_tokenizer,
)

__all__ = [
    "FashionData",
    "HistLatentStore",
    "OutfitTable",
    "TrainLoader",
    "load_npy_dict",
    "EVAL_SPECIAL_CATES",
    "TRAIN_SPECIAL_CATES",
    "build_eval_prompts",
    "build_train_prompts",
    "eval_prompt",
    "train_prompt",
    "CLIPBPETokenizer",
    "HashTokenizer",
    "load_tokenizer",
]
