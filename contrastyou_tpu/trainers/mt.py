"""Mean-teacher trainer: semi-supervised training that EVALUATES on the
teacher model (ref: semi_seg/trainers/trainer.py:125-167 ``MTTrainer``)."""
from __future__ import annotations

from ..hooks.mt import MeanTeacherTrainerHook
from .semi import SemiTrainer


class MTTrainer(SemiTrainer):
    def init(self) -> None:
        super().init()
        mt = next((h for h in self._active_hooks
                   if isinstance(h, MeanTeacherTrainerHook)), None)
        if mt is None:
            raise RuntimeError("MTTrainer requires a MeanTeacher-family hook")
        self.set_model4inference(mt)
