"""Multicore (multi-prototype) trainer: the model predicts ``true_classes *
multiplier`` prototype channels; supervision and evaluation collapse them back
to true classes via MultiCoreKL.reduced_simplex.

Capability match for semi_seg/trainers/features/multicore.py:11-35 +
epochers/features/multicore_epocher.py:13-91 + main_multicore.py:41-80.
"""
from __future__ import annotations

from ..losses.multicore import MultiCoreKL
from .semi import SemiTrainer


def prototype_groups(true_num_classes: int, multiplier: int) -> list[list[int]]:
    """Contiguous prototype blocks per true class (ref main_multicore.py)."""
    return [list(range(c * multiplier, (c + 1) * multiplier))
            for c in range(true_num_classes)]


class MulticoreTrainer(SemiTrainer):
    def __init__(self, *, true_num_classes: int, multiplier: int = 2, **kwargs):
        groups = prototype_groups(true_num_classes, multiplier)
        self._multicore_criterion = MultiCoreKL(groups)
        super().__init__(
            criterion=self._multicore_criterion,
            prob_transform=self._multicore_criterion.reduced_simplex,
            target_num_classes=true_num_classes, **kwargs)

    @property
    def criterion(self) -> MultiCoreKL:
        return self._multicore_criterion
