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

from ..loggers import logger

__all__ = ["save_checkpoint", "load_checkpoint", "restore_train_state",
           "extract_model_params"]


def save_checkpoint(path: str | Path, *, train_state, host_state: Dict[str, Any]
                    ) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = Path(tempfile.mkdtemp(dir=str(path.parent)))
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
