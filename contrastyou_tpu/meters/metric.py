"""Metric protocol (ref: contrastyou/meters/metric.py:7 — add/reset/summary/join)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Generic, TypeVar

Result = TypeVar("Result")


class Metric(ABC, Generic[Result]):
    """Epoch-scoped accumulator. ``add`` per batch, ``summary`` at epoch end."""

    @abstractmethod
    def reset(self) -> None: ...

    @abstractmethod
    def add(self, *args: Any, **kwargs: Any) -> None: ...

    @abstractmethod
    def summary(self) -> Result: ...

    def join(self) -> None:
        """Barrier for meters with async/device-pending work (default: no-op)."""
