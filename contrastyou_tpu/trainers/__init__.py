"""Trainer zoo (ref: semi_seg/trainers/__init__.py:7-15)."""
from .adv import AdversarialTrainer
from .dmt import DMTTrainer
from .ft import FineTuneTrainer
from .mixup import MixUpTrainer
from .mt import MTTrainer
from .pretrain import (PretrainDecoderTrainer, PretrainEncoderTrainer,
                       build_pretrain_step, feature_until_from_hooks,
                       get_contrastive_loader)
from .multicore import MulticoreTrainer
from .semi import SemiTrainer

trainer_zoo = {
    "semi": SemiTrainer,
    "ft": FineTuneTrainer,
    "mt": MTTrainer,
    "dmt": DMTTrainer,
    "mixup": MixUpTrainer,
    "pretrain": PretrainEncoderTrainer,
    "pretrain_decoder": PretrainDecoderTrainer,
    "adv": AdversarialTrainer,
    "multicore": MulticoreTrainer,
}

__all__ = ["AdversarialTrainer", "DMTTrainer", "MulticoreTrainer", "FineTuneTrainer", "MixUpTrainer", "MTTrainer",
           "PretrainDecoderTrainer", "PretrainEncoderTrainer",
           "build_pretrain_step", "feature_until_from_hooks",
           "get_contrastive_loader", "SemiTrainer", "trainer_zoo"]
