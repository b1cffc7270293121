"""Trainer zoo (ref: semi_seg/trainers/__init__.py:7-15)."""
from .ft import FineTuneTrainer
from .semi import SemiTrainer

trainer_zoo = {
    "semi": SemiTrainer,
    "ft": FineTuneTrainer,
}

__all__ = ["FineTuneTrainer", "SemiTrainer", "trainer_zoo"]
