"""Trainer zoo (ref: semi_seg/trainers/__init__.py:7-15)."""
from .ft import FineTuneTrainer
from .mixup import MixUpTrainer
from .mt import MTTrainer
from .pretrain import (PretrainDecoderTrainer, PretrainEncoderTrainer,
                       build_pretrain_step, feature_until_from_hooks,
                       get_contrastive_loader)
from .semi import SemiTrainer

trainer_zoo = {
    "semi": SemiTrainer,
    "ft": FineTuneTrainer,
    "mt": MTTrainer,
    "mixup": MixUpTrainer,
    "pretrain": PretrainEncoderTrainer,
    "pretrain_decoder": PretrainDecoderTrainer,
}

__all__ = ["FineTuneTrainer", "MixUpTrainer", "MTTrainer",
           "PretrainDecoderTrainer", "PretrainEncoderTrainer",
           "build_pretrain_step", "feature_until_from_hooks",
           "get_contrastive_loader", "SemiTrainer", "trainer_zoo"]
