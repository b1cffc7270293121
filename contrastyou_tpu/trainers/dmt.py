"""DMT trainer (ref: semi_seg/trainers/trainer.py:170-196 ``DMTTrainer``):
semi-supervised training with the differentiable-mean-teacher hook, evaluating
on the meta-optimized teacher."""
from __future__ import annotations

from ..hooks.dmt import DifferentiableMeanTeacherTrainerHook
from .semi import SemiTrainer


class DMTTrainer(SemiTrainer):
    def init(self) -> None:
        super().init()
        dmt = next((h for h in self._active_hooks
                    if isinstance(h, DifferentiableMeanTeacherTrainerHook)),
                   None)
        if dmt is None:
            raise RuntimeError("DMTTrainer requires a DifferentiableMeanTeacher hook")
        self.set_model4inference(dmt)
