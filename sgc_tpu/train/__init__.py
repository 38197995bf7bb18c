from sgc_tpu.train.metrics import accuracy, f1, f1_weighted, optimized_precision
from sgc_tpu.train.optim import torch_adam, lbfgs_minimize
from sgc_tpu.train.loops import train_regression, train_linear, eval_linear

__all__ = [
    "accuracy",
    "f1",
    "f1_weighted",
    "optimized_precision",
    "torch_adam",
    "lbfgs_minimize",
    "train_regression",
    "train_linear",
    "eval_linear",
]

from sgc_tpu.train.sequence import (  # noqa: F401
    SeqTrainConfig,
    predict_sequence,
    train_sequence_classifier,
)
from sgc_tpu.train.finetune import FinetuneConfig, finetune_pretrained  # noqa: F401

__all__ += [
    "SeqTrainConfig",
    "predict_sequence",
    "train_sequence_classifier",
    "FinetuneConfig",
    "finetune_pretrained",
]
