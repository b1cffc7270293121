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


#: per-dataset realistic layout recipes (VERDICT r4 #6): stem pattern,
#: native slice H×W ranges (real archives have varying in-plane sizes),
#: typical odd slice-count ranges, mode-prefixed folders for MMWHS, and the
#: archive's metadata file name. Stems follow the real archives so the
#: grouping regexes in data/datasets.py exercise their true match behavior
#: (e.g. MMWHS group_re r"\d+" extracting the scan number from
#: ``ct_train_1007_12``).
_LAYOUTS = {
    "acdc": dict(stem=lambda i, s: f"patient{i:03d}_00_{s:02d}",
                 scan_key=lambda i: f"patient{i:03d}_00",
                 sizes=(154, 256), slices=(6, 18), info="acdc_info.npy",
                 modes=("train", "val"), subs=("img", "gt"), classes=4),
    "prostate": dict(stem=lambda i, s: f"Case{i:02d}_{s:02d}",
                     scan_key=lambda i: f"Case{i:02d}",
                     sizes=(256, 384), slices=(15, 54),
                     info="prostate_info.npy",
                     modes=("train", "val"), subs=("img", "gt"), classes=2),
    "prostate_md": dict(stem=lambda i, s: f"prostate_{i:02d}_{s:02d}",
                        scan_key=lambda i: f"prostate_{i:02d}",
                        sizes=(256, 384), slices=(11, 24),
                        info="prostate_info.npy",
                        modes=("train", "val"), subs=("t2", "gt"), classes=2),
    "mmwhsct": dict(stem=lambda i, s: f"ct_train_{1000 + i}_{s:02d}",
                    scan_key=lambda i: str(1000 + i),
                    sizes=(240, 320), slices=(80, 130), info="meta_ct.npy",
                    modes=("ct_train", "ct_val"), subs=("img", "gt"),
                    classes=5),
    "mmwhsmr": dict(stem=lambda i, s: f"mr_train_{1000 + i}_{s:02d}",
                    scan_key=lambda i: str(1000 + i),
                    sizes=(200, 288), slices=(70, 120), info="meta_mr.npy",
                    modes=("mr_train", "mr_val"), subs=("img", "gt"),
                    classes=5),
    "spleen": dict(stem=lambda i, s: f"spleen_{i:02d}_{s:02d}",
                   scan_key=lambda i: f"spleen_{i:02d}",
                   sizes=(512, 512), slices=(31, 100),
                   info="spleen_info.npy",
                   modes=("train", "val"), subs=("img", "gt"), classes=2),
    "hippocampus": dict(stem=lambda i, s: f"hippocampus_{i:03d}_{s:02d}",
                        scan_key=lambda i: f"hippocampus_{i:03d}",
                        sizes=(31, 68), slices=(24, 48),
                        info="hippocampus_info.npy",
                        modes=("train", "val"), subs=("img", "gt"),
                        classes=3),
}


def synthesize_dataset(root_dir: str | Path, name: str, *,
                       num_train_scans: int = 4, num_val_scans: int = 2,
                       seed: int = 0, write_info: bool = True,
                       write_ordering: bool = True,
                       max_slices: int | None = 12) -> Path:
    """Write a realistic fake archive for dataset ``name`` under
    ``root_dir/<folder_name>``: true folder/sub-folder names, mode-prefixed
    folders (MMWHS), per-scan VARYING native H×W, odd per-scan slice counts,
    the dataset's class count, the ``*_info.npy`` metadata file the real
    archive ships (scan -> slice count, the reference's partition source),
    and an ``{name}_ordering.json`` labeled-split ordering.

    ``max_slices`` caps the per-scan slice count (the real MMWHS scans have
    ~100 slices — too slow for unit tests; pass None for archive-realistic
    counts)."""
    from .datasets import data_zoo

    lay = _LAYOUTS[name if not name.startswith("acdc") else "acdc"]
    cls = data_zoo[name]
    root = Path(root_dir) / cls.folder_name
    rng = np.random.default_rng(seed)
    info: dict = {}
    scan_idx = 0
    train_scans = []
    for mode, n_scans in ((lay["modes"][0], num_train_scans),
                          (lay["modes"][1], num_val_scans)):
        dirs = [root / mode / sub for sub in lay["subs"]]
        for d in dirs:
            d.mkdir(parents=True, exist_ok=True)
        for _ in range(n_scans):
            scan_idx += 1
            lo, hi = lay["slices"]
            n_slices = int(rng.integers(lo, hi + 1))
            if max_slices is not None:
                n_slices = min(n_slices, max_slices)
            size = int(rng.integers(lay["sizes"][0], lay["sizes"][1] + 1))
            imgs, gts = _make_volume(rng, n_slices, size, lay["classes"])
            for s in range(n_slices):
                stem = lay["stem"](scan_idx, s)
                Image.fromarray(imgs[s]).save(dirs[0] / f"{stem}.png")
                Image.fromarray(gts[s]).save(dirs[1] / f"{stem}.png")
            key = lay["scan_key"](scan_idx)
            info[key] = n_slices
            if mode == lay["modes"][0]:
                train_scans.append(key)
    if write_info:
        np.save(root / lay["info"], np.asarray(info, dtype=object))
    if write_ordering:
        import json
        lookup = "acdc" if name.startswith("acdc_") else name
        (root / f"{lookup}_ordering.json").write_text(json.dumps(train_scans))
    return root
