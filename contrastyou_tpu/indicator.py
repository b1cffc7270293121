"""Progress indicator: tqdm with flattened meter postfix and a final stats
line through the logger (capability match for contrastyou/mytqdm/mytqdm.py:
17-131 — ``set_postfix_statics2`` flattening with update-frequency caching and
``log_result`` on close)."""
from __future__ import annotations

import typing as t

from tqdm import tqdm as _tqdm

from .loggers import logger
from .utils.general import flatten_dict


def _fmt(value) -> str:
    try:
        v = float(value)
    except (TypeError, ValueError):
        return str(value)
    if v == 0:
        return "0"
    if abs(v) < 1e-3 or abs(v) >= 1e4:
        return f"{v:.2e}"
    return f"{v:.3f}"


class Indicator(_tqdm):
    """tqdm that understands nested meter statistics."""

    def __init__(self, *args, update_every: int = 20, **kwargs):
        kwargs.setdefault("leave", False)
        kwargs.setdefault("dynamic_ncols", True)
        super().__init__(*args, **kwargs)
        self._update_every = max(int(update_every), 1)
        self._count = 0
        self._last_stats: dict = {}

    def set_postfix_statics(self, statistics: t.Mapping, *,
                            force_update: bool = False) -> None:
        """statistics: nested {group: {meter: value-or-dict}}; flattened and
        cached — the postfix recomputes only every ``update_every`` calls."""
        self._count += 1
        if not force_update and self._count % self._update_every != 1:
            return
        flat = flatten_dict(dict(statistics))
        self._last_stats = flat
        shown = {k.split("/")[-1] if len(k.split("/")) < 3 else k: _fmt(v)
                 for k, v in flat.items() if not isinstance(v, str)}
        self.set_postfix(dict(list(shown.items())[:8]))

    def log_result(self, prefix: str = "") -> None:
        if self._last_stats:
            parts = ", ".join(f"{k}={_fmt(v)}" for k, v in
                              self._last_stats.items())
            logger.info(f"{prefix}{parts}")

    def close(self):
        super().close()
