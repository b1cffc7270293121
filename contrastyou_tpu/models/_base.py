"""Layer-name range algebra for named-layer architectures.

Capability match for contrastyou/arch/_base.py:8-82: map layer names to
topological indices, sort, and expand (start, end) ranges with optional
inclusive bounds. Operates on plain name tuples (no live module needed — in
JAX the "model" is a params PyTree keyed by these names).
"""
from __future__ import annotations

from typing import Dict, List, Protocol, Sequence


class NetworkSpec(Protocol):
    encoder_names: Sequence[str]
    decoder_names: Sequence[str]
    arch_elements: Sequence[str]
    layer_dimension: Dict[str, int]


def arch_order(name: str, *, elements: Sequence[str]) -> int:
    if name not in elements:
        raise ValueError(f"unknown layer '{name}' (have {', '.join(elements)})")
    return list(elements).index(name)


def sort_arch(names: Sequence[str], reverse: bool = False, *,
              elements: Sequence[str]) -> List[str]:
    return sorted(names, key=lambda n: arch_order(n, elements=elements), reverse=reverse)


def check_range_params(start, end, include_start, include_end, *,
                       elements: Sequence[str]) -> None:
    if start is None and not include_start:
        raise ValueError("include_start must be True when start is None")
    if end is None and not include_end:
        raise ValueError("include_end must be True when end is None")
    if isinstance(start, str):
        arch_order(start, elements=elements)
    if isinstance(end, str):
        arch_order(end, elements=elements)
    if isinstance(start, str) and isinstance(end, str):
        if arch_order(start, elements=elements) > arch_order(end, elements=elements):
            raise ValueError(f"start '{start}' after end '{end}'")


def complete_arch_start2end(start: str, end: str, *, elements: Sequence[str],
                            include_start: bool = True,
                            include_end: bool = True) -> List[str]:
    i0 = arch_order(start, elements=elements)
    i1 = arch_order(end, elements=elements)
    assert i0 <= i1, (start, end)
    lo = i0 if include_start else i0 + 1
    hi = i1 + 1 if include_end else i1
    return list(elements[lo:hi])
