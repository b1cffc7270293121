"""Streaming average meters (ref: contrastyou/meters/averagemeter.py:12-48)."""
from __future__ import annotations

import math
from collections import OrderedDict

import numpy as np

from .metric import Metric


def _to_float(v) -> float:
    return float(np.asarray(v))


class AverageValueMeter(Metric[float]):
    """Weighted streaming mean of scalars (jax scalars accepted; converted lazily)."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._sum = 0.0
        self._weight = 0.0
        self._pending: list = []

    def add(self, value, n: int = 1) -> None:
        # defer float() conversion to summary so device scalars don't force a sync
        self._pending.append((value, n))

    def _drain(self) -> None:
        for value, n in self._pending:
            self._sum += _to_float(value) * n
            self._weight += n
        self._pending.clear()

    def summary(self) -> float:
        self._drain()
        if self._weight == 0:
            return math.nan
        return self._sum / self._weight


class AverageValueDictionaryMeter(Metric[dict]):
    """Dict-of-scalars variant; each key gets its own streaming mean."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._meters: "OrderedDict[str, AverageValueMeter]" = OrderedDict()

    def add(self, **kwargs) -> None:
        for k, v in kwargs.items():
            if k not in self._meters:
                self._meters[k] = AverageValueMeter()
            self._meters[k].add(v)

    def summary(self) -> dict:
        return {k: m.summary() for k, m in self._meters.items()}


class AverageValueListMeter(AverageValueDictionaryMeter):
    """Positional variant (e.g. per-group learning rates)."""

    def add(self, *args, **kwargs) -> None:  # noqa: D102
        for i, v in enumerate(args):
            super().add(**{f"lr_{i}": v})
        if kwargs:
            super().add(**kwargs)
