"""Fine-tune trainer: labeled-only supervised training, hooks deactivated
(ref: semi_seg/trainers/trainer.py:199-204 ``FineTuneTrainer`` +
epochers/epocher.py:380-418 ``FineTuneEpocher``)."""
from __future__ import annotations

from .semi import SemiTrainer


class FineTuneTrainer(SemiTrainer):
    train_mode = "ft"
    activate_hooks = False
