"""MixUp trainer: labeled-only training with the mixup hook active
(ref: semi_seg/trainers/trainer.py:207-212 + epochers/comparable.py:14-90)."""
from __future__ import annotations

from .semi import SemiTrainer


class MixUpTrainer(SemiTrainer):
    train_mode = "ft"
    activate_hooks = True
