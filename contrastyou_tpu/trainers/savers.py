"""Inference prediction savers (ref: semi_seg/epochers/helper.py:74-115
``InferenceSaver``/``write_predict``/``write_img_target``): per-slice PNG dumps
of image, ground truth and colored prediction during inference."""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image

from ..utils.colors import label2colored_image, overlay_segmentation


class InferenceSaver:
    def __init__(self, save_dir: str, folder_name: str = "predictions"):
        self.root = Path(save_dir) / folder_name
        (self.root / "img").mkdir(parents=True, exist_ok=True)
        (self.root / "gt").mkdir(parents=True, exist_ok=True)
        (self.root / "pred").mkdir(parents=True, exist_ok=True)
        (self.root / "overlay").mkdir(parents=True, exist_ok=True)

    def save_batch(self, *, image, target, pred, filenames, mask=None) -> None:
        image = np.asarray(image)
        target = np.asarray(target)
        pred = np.asarray(pred)
        for i, stem in enumerate(filenames):
            if mask is not None and not bool(np.asarray(mask)[i]):
                continue
            img = (np.clip(image[i, ..., 0], 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(self.root / "img" / f"{stem}.png")
            Image.fromarray(label2colored_image(target[i])).save(
                self.root / "gt" / f"{stem}.png")
            Image.fromarray(label2colored_image(pred[i])).save(
                self.root / "pred" / f"{stem}.png")
            Image.fromarray(overlay_segmentation(image[i, ..., 0], pred[i])
                            ).save(self.root / "overlay" / f"{stem}.png")
