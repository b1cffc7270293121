"""Surface-distance meter: Hausdorff / HD95 / average surface distance.

Capability match for contrastyou/meters/{surface_meter.py:12-126,
surface_distance.py}: per-scan boundary distance metrics computed host-side
with scipy distance transforms (these run once per eval volume; not a hot path).
"""
from __future__ import annotations

import math
import typing as t
from collections import defaultdict

import numpy as np
from scipy.ndimage import binary_erosion, distance_transform_edt

from .metric import Metric


def _surface_points(mask: np.ndarray) -> np.ndarray:
    """Boolean boundary map of a binary mask (mask minus its erosion)."""
    if mask.sum() == 0:
        return np.zeros_like(mask, dtype=bool)
    eroded = binary_erosion(mask, iterations=1, border_value=0)
    return mask & ~eroded


def surface_distances(pred: np.ndarray, target: np.ndarray,
                      voxelspacing=None) -> np.ndarray:
    """Distances from pred-surface voxels to the target surface (one direction)."""
    pred_surface = _surface_points(pred.astype(bool))
    target_surface = _surface_points(target.astype(bool))
    if pred_surface.sum() == 0 or target_surface.sum() == 0:
        return np.array([np.inf])
    dt = distance_transform_edt(~target_surface, sampling=voxelspacing)
    return dt[pred_surface]


def hausdorff_distance(pred, target, percentile: float = 100.0, voxelspacing=None) -> float:
    d_pt = surface_distances(pred, target, voxelspacing)
    d_tp = surface_distances(target, pred, voxelspacing)
    if percentile >= 100.0:
        return float(max(d_pt.max(), d_tp.max()))
    return float(max(np.percentile(d_pt, percentile), np.percentile(d_tp, percentile)))


def average_surface_distance(pred, target, voxelspacing=None) -> float:
    d_pt = surface_distances(pred, target, voxelspacing)
    d_tp = surface_distances(target, pred, voxelspacing)
    return float((d_pt.mean() + d_tp.mean()) / 2.0)


class SurfaceMeter(Metric[t.Dict[str, float]]):
    """Accumulates slices per scan (group) and reports mean metric over scans.

    mode: "hausdorff" | "hd95" | "asd" (ref surface_meter.py:12 supports the
    same family under names ``hausdorff``/``average_surface``).
    """

    def __init__(self, C: int, report_axis: t.Iterable[int] | None = None,
                 metername: str = "asd"):
        assert metername in ("hausdorff", "hd95", "asd"), metername
        self._C = C
        self._report_axis = list(report_axis) if report_axis is not None else list(range(1, C))
        self._metername = metername
        self.reset()

    def reset(self) -> None:
        self._pred_slices: dict[str, list[np.ndarray]] = defaultdict(list)
        self._target_slices: dict[str, list[np.ndarray]] = defaultdict(list)

    def add(self, pred, target, *, group_name: t.Sequence[str]) -> None:
        pred = np.asarray(pred)
        target = np.asarray(target)
        for i, g in enumerate(list(group_name)):
            if g is None:
                continue
            self._pred_slices[g].append(pred[i])
            self._target_slices[g].append(target[i])

    def _metric(self, pred_vol: np.ndarray, target_vol: np.ndarray) -> float:
        if self._metername == "hausdorff":
            return hausdorff_distance(pred_vol, target_vol)
        if self._metername == "hd95":
            return hausdorff_distance(pred_vol, target_vol, percentile=95.0)
        return average_surface_distance(pred_vol, target_vol)

    def summary(self) -> dict[str, float]:
        per_class: dict[int, list[float]] = defaultdict(list)
        for g in sorted(self._pred_slices):
            pred_vol = np.stack(self._pred_slices[g])
            target_vol = np.stack(self._target_slices[g])
            for c in self._report_axis:
                val = self._metric(pred_vol == c, target_vol == c)
                if math.isfinite(val):
                    per_class[c].append(val)
        prefix = {"hausdorff": "HD", "hd95": "HD95", "asd": "ASD"}[self._metername]
        report = {f"{prefix}{c}": (float(np.mean(per_class[c])) if per_class[c] else math.nan)
                  for c in self._report_axis}
        vals = [v for v in report.values() if not math.isnan(v)]
        report[f"{prefix}_mean"] = float(np.mean(vals)) if vals else math.nan
        return report
