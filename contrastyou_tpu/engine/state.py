"""TrainState PyTree — the single object holding everything the jitted step
reads and writes. Mirrors the reference's hierarchical ModuleBase.state_dict
grouping (contrastyou/nn.py:129-168: module weights / hook modules / optimizer
/ buffers) as one flax struct so orbax checkpoints restore training exactly.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Any                 # model params
    batch_stats: Any            # BN running stats
    hook_params: Any            # {hook_name: learnable params} (optimized)
    hook_states: Any            # {hook_name: teacher params / buffers}
    opt_state: Any
    step: jnp.ndarray           # int32 global step

    @property
    def trainables(self):
        return (self.params, self.hook_params)
