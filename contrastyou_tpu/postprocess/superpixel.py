"""Superpixel generation (SLIC) for superpixel-guided contrastive training.

Capability match for semi_seg/postprocess/superpixel.py +
script/create_superpixel.py (which used skimage.slic; skimage is not in this
image, so this is a self-contained numpy SLIC: k-means in (intensity, x, y)
space with localized search windows).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def slic(image: np.ndarray, n_segments: int = 40, compactness: float = 0.05,
         n_iter: int = 10, sigma: float = 0.0) -> np.ndarray:
    """image: f32 [H, W] in [0,1] -> int32 [H, W] superpixel labels."""
    H, W = image.shape
    if sigma > 0:
        from scipy.ndimage import gaussian_filter
        image = gaussian_filter(image, sigma)
    S = max(int(np.sqrt(H * W / n_segments)), 1)
    ys = np.arange(S // 2, H, S)
    xs = np.arange(S // 2, W, S)
    cy, cx = np.meshgrid(ys, xs, indexing="ij")
    centers = np.stack([cy.ravel().astype(np.float64),
                        cx.ravel().astype(np.float64)], axis=1)
    k = len(centers)
    cvals = image[centers[:, 0].astype(int), centers[:, 1].astype(int)]

    yy, xx = np.mgrid[0:H, 0:W]
    labels = np.zeros((H, W), np.int32)
    dist = np.full((H, W), np.inf)
    ratio = compactness / S
    for _ in range(n_iter):
        dist[:] = np.inf
        for i in range(k):
            y0, x0 = centers[i]
            ys0, ys1 = max(int(y0) - 2 * S, 0), min(int(y0) + 2 * S, H)
            xs0, xs1 = max(int(x0) - 2 * S, 0), min(int(x0) + 2 * S, W)
            patch = image[ys0:ys1, xs0:xs1]
            dy = yy[ys0:ys1, xs0:xs1] - y0
            dx = xx[ys0:ys1, xs0:xs1] - x0
            d = (patch - cvals[i]) ** 2 + (ratio ** 2) * (dy ** 2 + dx ** 2)
            better = d < dist[ys0:ys1, xs0:xs1]
            dist[ys0:ys1, xs0:xs1] = np.where(better, d, dist[ys0:ys1, xs0:xs1])
            labels[ys0:ys1, xs0:xs1] = np.where(better, i,
                                                labels[ys0:ys1, xs0:xs1])
        for i in range(k):
            mask = labels == i
            if mask.any():
                centers[i, 0] = yy[mask].mean()
                centers[i, 1] = xx[mask].mean()
                cvals[i] = image[mask].mean()
    return labels


def generate_superpixels(dataset_root: str | Path, *, mode: str = "train",
                         n_segments: int = 40, compactness: float = 0.05
                         ) -> int:
    """Write root/mode/superpixel/*.png next to the img folder (the layout the
    superpixel InfoNCE dataset expects)."""
    root = Path(dataset_root) / mode
    img_dir = root / "img"
    out_dir = root / "superpixel"
    out_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    for path in sorted(img_dir.iterdir()):
        if path.suffix not in (".png", ".jpg"):
            continue
        with Image.open(path) as img:
            arr = np.asarray(img.convert("L"), np.float32) / 255.0
        labels = slic(arr, n_segments=n_segments, compactness=compactness)
        Image.fromarray(labels.astype(np.uint8)).save(out_dir / path.name)
        count += 1
    return count
