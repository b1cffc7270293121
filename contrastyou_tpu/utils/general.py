"""General utilities (ref: contrastyou/utils/{utils,general}.py subset that the
rebuild still needs; seed context managers are superseded by explicit PRNG keys)."""
from __future__ import annotations

import os
import shutil
import tempfile
from itertools import repeat
from pathlib import Path
from typing import Iterable, Mapping


def class_name(obj) -> str:
    return obj.__class__.__name__


def ntuple(n: int):
    def parse(x):
        if isinstance(x, Iterable) and not isinstance(x, str):
            return tuple(x)
        return tuple(repeat(x, n))
    return parse


def path2Path(path) -> Path:
    return path if isinstance(path, Path) else Path(path)


def safe_save(save_fn, target_path: str | Path) -> None:
    """Write via a temp file then atomic move (ref: trainer/_utils.py:43-50)."""
    target_path = path2Path(target_path)
    target_path.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=str(target_path.parent), suffix=".tmp")
    os.close(fd)
    try:
        save_fn(tmp)
        shutil.move(tmp, str(target_path))
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


class ignore_exception:
    """Context manager swallowing listed exception types
    (ref: contrastyou/utils/utils.py ``ignore_exception``)."""

    def __init__(self, *exceptions, log: bool = False):
        self._exceptions = exceptions or (Exception,)
        self._log = log

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and issubclass(exc_type, self._exceptions):
            if self._log:
                from ..loggers import logger
                logger.warning(f"ignored {exc_type.__name__}: {exc}")
            return True
        return False


def flatten_dict(d: Mapping, parent_key: str = "", sep: str = "/") -> dict:
    items: list = []
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else str(k)
        if isinstance(v, Mapping):
            items.extend(flatten_dict(v, new_key, sep).items())
        else:
            items.append((new_key, v))
    return dict(items)
