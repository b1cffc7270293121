"""TensorBoard writer with a global writer stack.

Capability match for contrastyou/writer.py:19-73: ``with writer:`` pushes the
writer on a global stack; ``get_tb_writer()`` lets any hook fetch the live
writer without threading it through call chains;
``add_scalars_from_meter_interface`` flattens nested meter statistics into
scalar tags, pruning ``_``-prefixed groups. Built on tensorboardX.
"""
from __future__ import annotations

from pathlib import Path
from typing import List

from tensorboardX import SummaryWriter as _TBWriter

__all__ = ["SummaryWriter", "get_tb_writer"]

_writer_stack: List["SummaryWriter"] = []


class SummaryWriter(_TBWriter):
    def __init__(self, log_dir: str):
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        super().__init__(logdir=str(Path(log_dir) / "tensorboard"))

    def add_scalars_from_meter_interface(self, *, epoch: int, **stages) -> None:
        """stages: tra={group: {meter: value-or-dict}}, val={...}."""
        for stage, groups in stages.items():
            for group, meters in dict(groups).items():
                if group.startswith("_"):
                    continue
                for name, value in dict(meters).items():
                    tag = f"{stage}/{group}/{name}"
                    if isinstance(value, dict):
                        for sub, v in value.items():
                            self._safe_add_scalar(f"{tag}/{sub}", v, epoch)
                    else:
                        self._safe_add_scalar(tag, value, epoch)

    def _safe_add_scalar(self, tag: str, value, step: int) -> None:
        try:
            self.add_scalar(tag, float(value), global_step=step)
        except (TypeError, ValueError):
            pass

    def __enter__(self):
        _writer_stack.append(self)
        return self

    def __exit__(self, *exc):
        assert _writer_stack and _writer_stack[-1] is self
        _writer_stack.pop()
        self.flush()


def get_tb_writer() -> SummaryWriter:
    """Fetch the innermost live writer (ref: writer.py:67)."""
    if not _writer_stack:
        raise RuntimeError("no SummaryWriter active; use `with writer:`")
    return _writer_stack[-1]
