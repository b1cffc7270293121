"""Synthetic dataset generator — writes the exact folder layout the concrete
datasets expect (root/<folder>/<mode>/{img,gt}/<scan>_<slice>.png) so every
data-path component (regex grouping, partitions, splits, samplers, loaders)
is exercised without downloads. Volumes contain simple geometric structures
(concentric blobs per class) that a small UNet can actually learn, making
end-to-end dice-improvement smoke tests meaningful.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

__all__ = ["synthesize_acdc_like", "make_synthetic_root"]


def _make_volume(rng: np.random.Generator, slices: int, size: int,
                 num_classes: int):
    """Per-scan volume: background + (num_classes-1) nested ellipses whose
    center drifts across slices."""
    imgs = np.zeros((slices, size, size), np.uint8)
    gts = np.zeros((slices, size, size), np.uint8)
    cy, cx = rng.uniform(0.35, 0.65, 2) * size
    base_r = rng.uniform(0.18, 0.28) * size
    yy, xx = np.mgrid[0:size, 0:size]
    for s in range(slices):
        drift = (s - slices / 2) / max(slices, 1)
        r = base_r * (1.0 - 0.4 * abs(drift))
        dy, dx = yy - (cy + drift * 6), xx - (cx - drift * 4)
        dist = np.sqrt(dy ** 2 + dx ** 2)
        gt = np.zeros((size, size), np.uint8)
        for c in range(1, num_classes):
            radius = r * (num_classes - c) / (num_classes - 1)
            gt[dist < radius] = c
        img = (gt.astype(np.float32) / max(num_classes - 1, 1)) * 0.6
        img += rng.normal(0, 0.05, img.shape)
        img += 0.2 * np.sin(xx / size * 3.1 + rng.uniform(0, 3))
        imgs[s] = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        gts[s] = gt
    return imgs, gts


def synthesize_acdc_like(root_dir: str | Path, *, folder_name: str = "ACDC_contrast",
                         scan_prefix: str = "patient", num_train_scans: int = 10,
                         num_val_scans: int = 4, slices_per_scan: int = 10,
                         size: int = 64, num_classes: int = 4, seed: int = 0,
                         two_part_names: bool = True) -> Path:
    """Create root_dir/folder_name/{train,val}/{img,gt}/*.png.

    File stems follow the ACDC convention ``patient%03d_00_%02d`` so the scan
    regex ``patient\\d+_\\d+`` and slice-index partitioning work unchanged.
    """
    root = Path(root_dir) / folder_name
    rng = np.random.default_rng(seed)
    scan_idx = 0
    for mode, n_scans in (("train", num_train_scans), ("val", num_val_scans)):
        img_dir = root / mode / "img"
        gt_dir = root / mode / "gt"
        img_dir.mkdir(parents=True, exist_ok=True)
        gt_dir.mkdir(parents=True, exist_ok=True)
        for _ in range(n_scans):
            scan_idx += 1
            stem_base = (f"{scan_prefix}{scan_idx:03d}_00" if two_part_names
                         else f"{scan_prefix}{scan_idx:03d}")
            imgs, gts = _make_volume(rng, slices_per_scan, size, num_classes)
            for s in range(slices_per_scan):
                stem = f"{stem_base}_{s:02d}"
                Image.fromarray(imgs[s]).save(img_dir / f"{stem}.png")
                Image.fromarray(gts[s]).save(gt_dir / f"{stem}.png")
    return root


def make_synthetic_root(tmp_dir: str | Path, **kwargs) -> str:
    """Convenience for tests: synthesize and return the data root (the parent
    that dataset classes expect as ``root_dir``)."""
    synthesize_acdc_like(tmp_dir, **kwargs)
    return str(tmp_dir)
