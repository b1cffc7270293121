"""Group-wise (per-3D-scan) Dice meter.

Capability match for the reference ``UniversalDice``
(contrastyou/meters/general_dice_meter.py:17-129): 2D slice batches are
accumulated into per-*group* (= per 3D scan) intersection/union counts so the
epoch summary reports true volumetric Dice, mean/std over scans, as ``DSC{i}``
per reported class plus ``DSC_mean``.

TPU-native split of work: the per-pixel reduction (one-hot intersection/union
sums over H,W) runs jitted on device; only a [B, C] pair of small count vectors
crosses to host per batch, where a python dict keyed by scan name accumulates.
Device→host transfer is deferred until ``summary()`` so meter adds never force
a sync inside the hot loop.
"""
from __future__ import annotations

import math
import typing as t
from collections import defaultdict
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .metric import Metric


@partial(jax.jit, static_argnames=("num_classes",))
def slice_intersection_union(pred: jnp.ndarray, target: jnp.ndarray, *,
                             num_classes: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample per-class intersection and union counts.

    pred/target: integer class maps of shape [B, ...spatial].
    Returns (intersection [B, C], union [B, C]) with union = |pred| + |target|
    (the reference's convention, general_dice_meter.py:100-111).
    """
    reduce_axes = tuple(range(1, pred.ndim))
    onehot_p = jax.nn.one_hot(pred, num_classes, dtype=jnp.int32)
    onehot_t = jax.nn.one_hot(target, num_classes, dtype=jnp.int32)
    inter = jnp.sum(onehot_p * onehot_t, axis=reduce_axes)
    union = jnp.sum(onehot_p + onehot_t, axis=reduce_axes)
    return inter, union


class UniversalDice(Metric[t.Dict[str, float]]):
    def __init__(self, C: int, report_axis: t.Iterable[int] | None = None):
        if report_axis is not None and max(report_axis) >= C:
            raise ValueError(f"report_axis {list(report_axis)} incompatible with C={C}")
        self._C = C
        self._report_axis = list(report_axis) if report_axis is not None else list(range(C))
        self.reset()

    def reset(self) -> None:
        self._pending: list[tuple[jnp.ndarray, jnp.ndarray, list[str]]] = []
        self._inter: dict[str, np.ndarray] = defaultdict(lambda: np.zeros(self._C, np.int64))
        self._union: dict[str, np.ndarray] = defaultdict(lambda: np.zeros(self._C, np.int64))
        self._n = 0

    def add(self, pred, target, *, group_name: t.Union[str, t.Sequence[str], None] = None,
            mask=None) -> None:
        """pred/target: integer class maps [B, ...]; probabilities should be
        argmax'ed before calling (device-side). ``mask``: optional [B] bool of
        valid samples (used for padded eval batches)."""
        pred = jnp.asarray(pred)
        target = jnp.asarray(target)
        if pred.shape != target.shape:
            raise ValueError(f"shape mismatch {pred.shape} vs {target.shape}")
        B = pred.shape[0]
        if group_name is None:
            names = [f"{self._n}_{i:03d}" for i in range(B)]
        elif isinstance(group_name, str):
            names = [group_name] * B
        else:
            names = list(group_name)
            if len(names) != B:
                raise ValueError(f"group_name has {len(names)} entries for batch of {B}")
        inter, union = slice_intersection_union(pred, target, num_classes=self._C)
        if mask is not None:
            m = jnp.asarray(mask).astype(jnp.int32)[:, None]
            inter, union = inter * m, union * m
            names = [n if bool(v) else None for n, v in zip(names, np.asarray(mask))]
        self._pending.append((inter, union, names))
        self._n += 1

    def add_counts(self, inter, union, *,
                   group_name: t.Sequence[t.Optional[str]] | None = None,
                   group_ids=None,
                   id_table: t.Sequence[str] | None = None) -> None:
        """Ingest precomputed per-sample [B, C] intersection/union counts (the
        jitted train/eval step returns these so no pixel maps cross to host).
        Entries whose group name is None are ignored (padded slots).

        Pass either host ``group_name`` strings OR a DEVICE ``group_ids``
        int vector + a host ``id_table`` — the ids are only pulled to host at
        ``join()`` (one sync per epoch instead of one per step)."""
        if group_ids is not None:
            names = (group_ids, list(id_table))
        else:
            names = list(group_name)
            assert jnp.asarray(inter).shape[0] == len(names)
        self._pending.append((jnp.asarray(inter), jnp.asarray(union), names))
        self._n += 1

    def join(self) -> None:
        """Drain device-pending counts into the host per-scan accumulators."""
        for inter, union, names in self._pending:
            if isinstance(names, tuple):
                ids, table = names
                # ids outside [0, len(table)) mark padded slots -> skipped,
                # mirroring the None-padding semantics of the name path
                # (python negative indexing would silently alias a scan).
                names = [table[i] if 0 <= i < len(table) else None
                         for i in np.asarray(ids).reshape(-1)]
            inter_h, union_h = np.asarray(inter), np.asarray(union)
            for i, name in enumerate(names):
                if name is None:
                    continue
                self._inter[name] += inter_h[i]
                self._union[name] += union_h[i]
        self._pending.clear()

    @property
    def group_names(self) -> list[str]:
        self.join()
        return sorted(self._inter.keys())

    def compute_dice_by_group(self) -> np.ndarray | None:
        self.join()
        if not self._inter:
            return None
        names = self.group_names
        inter = np.stack([self._inter[g] for g in names]).astype(np.float64)
        union = np.stack([self._union[g] for g in names]).astype(np.float64)
        return (2 * inter + 1e-16) / (union + 1e-16)

    def summary(self) -> dict[str, float]:
        dices = self.compute_dice_by_group()
        if dices is None:
            report = {f"DSC{i}": math.nan for i in self._report_axis}
            report["DSC_mean"] = math.nan
            return report
        means = dices.mean(axis=0)
        report = {f"DSC{i}": float(means[i]) for i in self._report_axis}
        report["DSC_mean"] = float(np.mean(list(report.values())))
        return report

    def __repr__(self):
        return f"UniversalDice(C={self._C}, report_axis={self._report_axis}): {self.summary()}"
