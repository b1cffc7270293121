"""ModelBundle: a model (flax module) plus its initialized variables and
convenience apply helpers — the object hooks receive at init so they can build
projectors against tap channel dims and run teacher forwards.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclass
class ModelBundle:
    model: Any                      # flax module (UNet-compatible protocol)
    params: Any
    batch_stats: Any
    input_shape: Tuple[int, ...]    # (H, W, C) of one sample

    @classmethod
    def create(cls, model, rng: jax.Array, input_shape: Tuple[int, ...],
               batch: int = 2) -> "ModelBundle":
        variables = model.init(rng, jnp.zeros((batch, *input_shape)), train=False)
        return cls(model=model, params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   input_shape=tuple(input_shape))

    # --- metadata -------------------------------------------------------
    @property
    def num_classes(self) -> int:
        return self.model.num_classes

    def get_channel_dim(self, name: str) -> int:
        return self.model.get_channel_dim(name)

    # --- functional applies (params passed explicitly; jit-safe) -------
    def apply_train(self, params, batch_stats, x, *, until=None, taps=(),
                    update_stats: bool = True, bn_groups=None,
                    bn_update=None, fwd_only: bool = False):
        """-> ((out, taps_dict), new_batch_stats). ``bn_groups``/``bn_update``
        request per-group BN statistics (fused two-stage; models advertise
        support via ``supports_bn_groups``). ``fwd_only``: hint that this
        pass is never differentiated (teacher forwards under stop_gradient)
        — forwarded to models advertising ``supports_fwd_only`` so
        forward-only kernel layouts can engage."""
        kw = {}
        if bn_groups is not None:
            kw = dict(bn_groups=tuple(bn_groups),
                      bn_update=tuple(bn_update) if bn_update else None)
        if fwd_only and getattr(self.model, "supports_fwd_only", False):
            kw["fwd_only"] = True
        out, mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, until=until,
            taps=taps, train=True, mutable=["batch_stats"], **kw)
        new_stats = mutated["batch_stats"] if update_stats else batch_stats
        return out, new_stats

    def apply_eval(self, params, batch_stats, x, *, until=None, taps=()):
        return self.model.apply({"params": params, "batch_stats": batch_stats},
                                x, until=until, taps=taps, train=False)
