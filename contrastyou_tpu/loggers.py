"""Structured logging for the framework.

The reference uses loguru (contrastyou/__init__.py:29, utils/utils.py:188); loguru is
not in this image, so this module provides a small stdlib-based logger with the same
practical surface: TRACE/DEBUG/INFO/SUCCESS/WARNING/ERROR levels, colored console
output, env-controlled level (``LOG_LEVEL``/``LOGURU_LEVEL``), and per-run file sinks.
"""
from __future__ import annotations

import logging
import os
import sys
from pathlib import Path

TRACE = 5
SUCCESS = 25
logging.addLevelName(TRACE, "TRACE")
logging.addLevelName(SUCCESS, "SUCCESS")

_COLORS = {
    "TRACE": "\x1b[36m", "DEBUG": "\x1b[34m", "INFO": "\x1b[37m",
    "SUCCESS": "\x1b[32m", "WARNING": "\x1b[33m", "ERROR": "\x1b[31m",
    "CRITICAL": "\x1b[41m",
}
_RESET = "\x1b[0m"


class _Formatter(logging.Formatter):
    def __init__(self, colored: bool):
        super().__init__()
        self._colored = colored

    def format(self, record: logging.LogRecord) -> str:
        base = (f"{self.formatTime(record, '%Y-%m-%d %H:%M:%S')} | "
                f"{record.levelname:<8} | {record.name}:{record.lineno} - "
                f"{record.getMessage()}")
        if self._colored:
            color = _COLORS.get(record.levelname, "")
            return f"{color}{base}{_RESET}"
        return base


class Logger:
    """loguru-flavoured facade over ``logging`` (trace/success/opt-depth supported)."""

    def __init__(self, name: str = "contrastyou_tpu"):
        self._logger = logging.getLogger(name)
        self._logger.setLevel(TRACE)
        self._configured = False
        self._file_handlers: list[logging.Handler] = []

    def _ensure_console(self):
        if self._configured:
            return
        handler = logging.StreamHandler(sys.stderr)
        level = os.environ.get("LOG_LEVEL", os.environ.get("LOGURU_LEVEL", "INFO"))
        handler.setLevel(level if not level.isdigit() else int(level))
        handler.setFormatter(_Formatter(colored=sys.stderr.isatty()))
        self._logger.addHandler(handler)
        self._logger.propagate = False
        self._configured = True

    def add_file_sink(self, save_dir: str, filename: str = "loguru.log") -> None:
        """Attach a plain-text sink inside ``save_dir``
        (ref: contrastyou/utils/utils.py:188 ``adding_writable_sink``)."""
        self._ensure_console()
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        handler = logging.FileHandler(str(Path(save_dir) / filename))
        handler.setLevel(TRACE)
        handler.setFormatter(_Formatter(colored=False))
        self._logger.addHandler(handler)
        self._file_handlers.append(handler)

    def remove_file_sinks(self) -> None:
        for h in self._file_handlers:
            self._logger.removeHandler(h)
            h.close()
        self._file_handlers.clear()

    def _log(self, level: int, msg, *args, depth: int = 0):
        self._ensure_console()
        if self._logger.isEnabledFor(level):
            self._logger.log(level, msg, *args, stacklevel=3 + depth)

    def trace(self, msg, *args, **kw):    self._log(TRACE, msg, *args, **kw)
    def debug(self, msg, *args, **kw):    self._log(logging.DEBUG, msg, *args, **kw)
    def info(self, msg, *args, **kw):     self._log(logging.INFO, msg, *args, **kw)
    def success(self, msg, *args, **kw):  self._log(SUCCESS, msg, *args, **kw)
    def warning(self, msg, *args, **kw):  self._log(logging.WARNING, msg, *args, **kw)
    def error(self, msg, *args, **kw):    self._log(logging.ERROR, msg, *args, **kw)
    def exception(self, msg, *args):
        self._ensure_console()
        self._logger.exception(msg, *args, stacklevel=3)


logger = Logger()
