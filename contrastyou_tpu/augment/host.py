"""Host-side per-item transforms (numpy/PIL): geometric canonicalization of
each slice to a fixed shape, with image and label transformed by the SAME
sampled geometry (image bilinear, label nearest).

Capability split vs the reference: the reference does per-item PIL two-view
augmentation (contrastyou/augment/{pil_augment.py,synchronize.py}) plus GPU
batch affine. The TPU rebuild keeps only shape canonicalization + label
remapping on host (cheap, parallel with device compute) and moves all
stochastic view generation (affine/mirror/gamma/noise) on-device
(ops/affine.py) where it is exactly replayable inside jit. The seeded
img/target synchronization of ``SequentialWrapper`` (synchronize.py:76-165)
is preserved by passing one RNG to both.

Dataset canonical geometry mirrors semi_seg/augment.py:18-282: acdc 224 crop,
prostate resize 224, spleen resize 320 -> crop 256, hippocampus crop 64, and
the acdc_lv/rv/myo label remaps.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image


class HostTransform:
    """A transform maps (image f32 [H,W], label i32 [H,W]|None, rng) -> same."""

    def __call__(self, image: np.ndarray, label: Optional[np.ndarray],
                 rng: np.random.Generator):
        raise NotImplementedError


class Compose(HostTransform):
    def __init__(self, *transforms: HostTransform):
        self._transforms = transforms

    def __call__(self, image, label, rng):
        for t in self._transforms:
            image, label = t(image, label, rng)
        return image, label


def _pad_to(image: np.ndarray, size: Tuple[int, int], value=0.0) -> np.ndarray:
    H, W = image.shape[:2]
    ph, pw = max(size[0] - H, 0), max(size[1] - W, 0)
    if ph == 0 and pw == 0:
        return image
    return np.pad(image, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)),
                  constant_values=value)


class RandomCrop(HostTransform):
    def __init__(self, size: int | Tuple[int, int], pad_if_needed: bool = True):
        self._size = (size, size) if isinstance(size, int) else tuple(size)
        self._pad = pad_if_needed

    def __call__(self, image, label, rng):
        if self._pad:
            image = _pad_to(image, self._size)
            if label is not None:
                label = _pad_to(label, self._size)
        H, W = image.shape[:2]
        th, tw = self._size
        y = int(rng.integers(0, H - th + 1))
        x = int(rng.integers(0, W - tw + 1))
        image = image[y:y + th, x:x + tw]
        if label is not None:
            label = label[y:y + th, x:x + tw]
        return image, label


class CenterCrop(HostTransform):
    def __init__(self, size: int | Tuple[int, int]):
        self._size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, image, label, rng):
        image = _pad_to(image, self._size)
        if label is not None:
            label = _pad_to(label, self._size)
        H, W = image.shape[:2]
        th, tw = self._size
        y, x = (H - th) // 2, (W - tw) // 2
        image = image[y:y + th, x:x + tw]
        if label is not None:
            label = label[y:y + th, x:x + tw]
        return image, label


class Resize(HostTransform):
    def __init__(self, size: int | Tuple[int, int]):
        self._size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, image, label, rng):
        th, tw = self._size
        from ..data.wire import normalize_u8
        img = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
        image = normalize_u8(np.asarray(img.resize((tw, th), Image.BILINEAR),
                                        dtype=np.uint8))
        if label is not None:
            lab = Image.fromarray(label.astype(np.uint8))
            label = np.asarray(lab.resize((tw, th), Image.NEAREST),
                               dtype=np.int32)
        return image, label


class SobelProcess(HostTransform):
    """Replace the intensity image with its Sobel edge magnitude
    (ref: pil_augment.py ``SobelProcess``)."""

    def __call__(self, image, label, rng):
        from scipy.ndimage import sobel
        dx = sobel(image, axis=0)
        dy = sobel(image, axis=1)
        mag = np.sqrt(dx ** 2 + dy ** 2)
        mag = mag / (mag.max() + 1e-8)
        return mag.astype(np.float32), label


class LabelRemap(HostTransform):
    """Class remapping for binary sub-tasks (ref: pil_augment ``ToLabel(mapping)``
    used by acdc_lv/rv/myo, semi_seg/augment.py:314-325)."""

    def __init__(self, mapping: Dict[int, int]):
        self._mapping = dict(mapping)

    def __call__(self, image, label, rng):
        if label is not None:
            out = np.zeros_like(label)
            for src, dst in self._mapping.items():
                out[label == src] = dst
            label = out
        return image, label


@dataclass
class TransformSpec:
    """Per-dataset host pipelines: {train, val} (two-view generation is
    on-device, so ``pretrain``/``label``/``trainval`` of the reference
    collapse into ``train``)."""
    train: HostTransform
    val: HostTransform
    crop_size: Tuple[int, int]
    mapping: Optional[Dict[int, int]] = None
    extra: List[str] = field(default_factory=list)


def _with_remap(t: HostTransform, mapping) -> HostTransform:
    return Compose(t, LabelRemap(mapping)) if mapping else t


def make_acdc_transforms(mapping=None) -> TransformSpec:
    return TransformSpec(
        train=_with_remap(RandomCrop(224), mapping),
        val=_with_remap(CenterCrop(224), mapping),
        crop_size=(224, 224), mapping=mapping)


def make_prostate_transforms() -> TransformSpec:
    return TransformSpec(train=Resize(224), val=Resize(224), crop_size=(224, 224))


def make_spleen_transforms() -> TransformSpec:
    return TransformSpec(train=Compose(Resize(320), RandomCrop(256)),
                         val=Compose(Resize(320), CenterCrop(256)),
                         crop_size=(256, 256))


def make_hippocampus_transforms() -> TransformSpec:
    return TransformSpec(train=RandomCrop(64), val=CenterCrop(64),
                         crop_size=(64, 64))


transform_zoo = {
    "acdc": lambda: make_acdc_transforms(None),
    "acdc_superpixel": lambda: make_acdc_transforms(None),
    "acdc_lv": lambda: make_acdc_transforms({0: 0, 1: 0, 2: 0, 3: 1}),
    "acdc_rv": lambda: make_acdc_transforms({0: 0, 1: 1, 2: 0, 3: 0}),
    "acdc_myo": lambda: make_acdc_transforms({0: 0, 1: 0, 2: 1, 3: 0}),
    "prostate": make_prostate_transforms,
    "prostate_md": make_prostate_transforms,
    "mmwhsct": lambda: make_acdc_transforms(None),
    "mmwhsmr": lambda: make_acdc_transforms(None),
    "spleen": make_spleen_transforms,
    "hippocampus": make_hippocampus_transforms,
}
