"""Trainable-parameter masks — the functional replacement for the reference's
``switch_grad`` context manager (contrastyou/arch/unet.py:192-213).

Freezing a contiguous range of named layers becomes an optax ``masked``
transform: ``trainable_mask`` returns a params-shaped bool PyTree where True
means "optimizer updates this leaf".
"""
from __future__ import annotations

from typing import Mapping, Optional, Sequence

import jax

from ._base import check_range_params, complete_arch_start2end


def mask_from_layer_predicate(params: Mapping, predicate) -> Mapping:
    """Bool PyTree: every leaf under top-level group `name` gets predicate(name)."""
    return {name: jax.tree.map(lambda _: bool(predicate(name)), sub)
            for name, sub in params.items()}


def trainable_mask(params: Mapping, *, elements: Sequence[str],
                   enable: bool = False, start: Optional[str] = None,
                   end: Optional[str] = None, include_start: bool = True,
                   include_end: bool = True) -> Mapping:
    """Layers in [start, end] (bound-inclusive flags as in the reference) get
    ``enable``; everything else stays trainable (True).

    e.g. pretrain freeze-after-hooked-layer (main.py:96):
    ``trainable_mask(params, elements=UNet.arch_elements, enable=False,
    start=until, include_start=False)``.
    """
    check_range_params(start, end, include_start, include_end, elements=elements)
    start = start or elements[0]
    end = end or elements[-1]
    selected = set(complete_arch_start2end(
        start, end, elements=elements,
        include_start=include_start, include_end=include_end))
    return mask_from_layer_predicate(
        params, lambda name: enable if name in selected else True)


def masked_optimizer(tx, mask: Mapping):
    """Optimizer that applies ``tx`` where mask is True and zeroes updates where
    False (actual freezing — note plain ``optax.masked`` would pass the masked
    updates through unchanged)."""
    import optax
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def merge_masks(*masks: Mapping) -> Mapping:
    """AND-combine masks (a leaf trains only if every mask allows it)."""
    out = masks[0]
    for m in masks[1:]:
        out = jax.tree.map(lambda a, b: a and b, out, m)
    return out
