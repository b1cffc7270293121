"""contrastyou_tpu — TPU-native semi-supervised medical segmentation framework.

Capability rebuild of jizongFox/Contrast-You (reference: /root/reference) as an
idiomatic JAX/XLA/pjit/Pallas stack.  Package-level responsibilities mirror
reference contrastyou/__init__.py:1-137 (paths, logging setup, git capture,
success marker) without the Compute-Canada specifics.
"""
from __future__ import annotations

import os
import subprocess
from pathlib import Path

__version__ = "0.1.0"

PROJECT_PATH = str(Path(__file__).resolve().parents[1])
DATA_PATH = os.environ.get("CONTRASTYOU_DATA_PATH", str(Path(PROJECT_PATH) / ".data"))
RUN_PATH = os.environ.get("CONTRASTYOU_RUN_PATH", str(Path(PROJECT_PATH) / "runs"))
CONFIG_PATH = str(Path(PROJECT_PATH) / "config")
OPT_PATH = str(Path(PROJECT_PATH) / "opt")

Path(DATA_PATH).mkdir(parents=True, exist_ok=True)
Path(RUN_PATH).mkdir(parents=True, exist_ok=True)

# Persistent XLA compile cache — the axon remote-compile tunnel makes cold
# compiles minutes-long; must be configured before backend init (perf.py).
from .perf import enable_compile_cache as _enable_compile_cache  # noqa: E402

_enable_compile_cache()


def get_git_hash_tag() -> str:
    """Current git short hash, for run provenance (ref: contrastyou/__init__.py:40)."""
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=PROJECT_PATH,
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:  # pragma: no cover - git absent
        return "unknown"


def success(save_dir: str) -> None:
    """Write a `.success` marker consumed by run-pruning tools
    (ref: contrastyou/__init__.py:128-130)."""
    (Path(save_dir) / ".success").touch()
