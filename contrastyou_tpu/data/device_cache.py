"""Device-resident dataset cache: the whole train split lives in HBM and each
train step samples + crops its batch IN-GRAPH — zero host->device transfers in
the hot loop.

Rationale (round-1 finding): the compiled train step sustains ~10x more
slices/s than the host input pipeline can feed (BENCH_NOTES.md). The
reference's whole loop is host-driven (semi_seg/epochers/epocher.py:269-295,
PIL transforms + DataLoader workers); on TPU the right design for RAM-scale
medical datasets (ACDC at 224^2 f32 is ~100 MB) is to stage the raw slices
into device memory ONCE and make batch assembly part of the XLA program:
random index gather + per-sample dynamic-slice crop, fused into the step.

The equivalent host path stays available (data/loader.py) for datasets that
don't fit; ``DeviceDataCache.fits(dataset)`` is the size gate.
"""
from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
import numpy as np
from ..perf import get as perf_knob

__all__ = ["DeviceDataCache"]

#: keep well under one v5e chip's 16 GB HBM: cache + model + activations
DEFAULT_BYTE_BUDGET = 4 << 30


class DeviceDataCache:
    """HBM-resident slices + jittable uniform sampler with random crop.

    ``sample(key, batch_size)`` is a pure function of device arrays — safe to
    close over inside a jitted train step (the arrays become constants of the
    compiled program, staged to HBM once).
    """

    def __init__(self, images: np.ndarray, targets: np.ndarray, *,
                 partition: np.ndarray, patient: np.ndarray,
                 cycle: np.ndarray, scan_id: np.ndarray,
                 scan_names: t.Sequence[str], crop: int):
        n, h, w = images.shape
        assert crop <= h and crop <= w, (crop, h, w)
        # u8 wire staging (data/wire.py): slices are exact k/255 grids, so
        # the cache can live in HBM as uint8 (4x smaller stage transfer +
        # resident footprint); sample() restores f32/255 after the crop —
        # bit-identical to staging f32
        from .wire import pack_array
        imgs = pack_array(np.ascontiguousarray(images, np.float32))
        tgts = pack_array(np.ascontiguousarray(targets, np.int64))
        self._images = jnp.asarray(imgs)
        self._targets = (jnp.asarray(tgts) if tgts.dtype != np.int64
                         else jnp.asarray(targets, jnp.int32))
        self._partition = jnp.asarray(partition, jnp.int32)
        self._patient = jnp.asarray(patient, jnp.int32)
        self._cycle = jnp.asarray(cycle, jnp.int32)
        self._scan_id = jnp.asarray(scan_id, jnp.int32)
        self.scan_names = list(scan_names)
        self._crop = int(crop)
        self._n = int(n)
        self._mesh = None
        self._axis = None

    # --- construction -----------------------------------------------------
    @staticmethod
    def fits(dataset, *, byte_budget: int = DEFAULT_BYTE_BUDGET) -> bool:
        """True when the raw split fits the HBM budget (f32 image + i32 target
        per slice at the dataset's native size)."""
        if len(dataset) == 0:
            return False
        item = dataset[0]
        h, w = item["image"].shape[:2]
        return len(dataset) * h * w * 8 <= byte_budget

    @classmethod
    def from_dataset(cls, dataset, *, crop: int) -> "DeviceDataCache":
        """Stage a SliceDataset's RAW (untransformed) slices. Host transforms
        are bypassed — crop happens in-graph; intensity/geometric augmentation
        already runs on device in the train step (ops/affine.py)."""
        subs = dataset._sub_folders  # noqa: SLF001 — deliberate raw access
        image_sub, target_sub = subs[0], None
        for sub, is_img in zip(subs[1:], dataset._is_image[1:]):  # noqa: SLF001
            if not is_img:
                target_sub = sub
                break
        n = len(dataset)
        images, targets = [], []
        partition, patient, cycle, scan_id = [], [], [], []
        scan_names = []
        scan_index: dict[str, int] = {}
        from .base import get_stem
        for i in range(n):
            from .wire import normalize_u8
            img = normalize_u8(dataset._raw(image_sub, i))  # noqa: SLF001
            tgt = (dataset._raw(target_sub, i).astype(np.int32)  # noqa: SLF001
                   if target_sub else np.zeros(img.shape, np.int32))
            images.append(img)
            targets.append(tgt)
            stem = get_stem(dataset._memory[image_sub][i])  # noqa: SLF001
            scan = dataset.get_scan_name(stem)
            if scan not in scan_index:
                scan_index[scan] = len(scan_names)
                scan_names.append(scan)
            scan_id.append(scan_index[scan])
            partition.append(dataset.get_partition(stem))
            pat, cyc = dataset.get_patient_cycle(scan)
            patient.append(pat)
            cycle.append(cyc)

        # pad raw slices to a common canvas (real scans vary a little in size)
        hmax = max(im.shape[0] for im in images)
        wmax = max(im.shape[1] for im in images)

        def pad(a, fill):
            ph, pw = hmax - a.shape[0], wmax - a.shape[1]
            return np.pad(a, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)),
                          constant_values=fill)

        return cls(np.stack([pad(i, 0.0) for i in images]),
                   np.stack([pad(tg, 0) for tg in targets]),
                   partition=np.asarray(partition), patient=np.asarray(patient),
                   cycle=np.asarray(cycle), scan_id=np.asarray(scan_id),
                   scan_names=scan_names, crop=min(crop, hmax, wmax))

    # --- multi-chip placement ---------------------------------------------
    def place_on_mesh(self, mesh, axis: str = "data") -> "DeviceDataCache":
        """Commit the cache to ``mesh`` and make :meth:`sample` emit
        batch-SHARDED arrays over ``axis``.

        The raw split tensors are replicated (RAM-scale medical splits fit
        every chip's HBM; a replicated gather needs no collectives), while the
        sampled batch carries a ``with_sharding_constraint`` over its batch
        dim — so the step compiled around :meth:`sample` is data-parallel
        end-to-end with zero host involvement (SURVEY.md §2 DP row: the
        host-sharded input pipeline becomes a device-sharded one)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        rep = NamedSharding(mesh, P())
        for name in ("_images", "_targets", "_partition", "_patient",
                     "_cycle", "_scan_id"):
            setattr(self, name, jax.device_put(getattr(self, name), rep))
        self._mesh, self._axis = mesh, axis
        return self

    def _constrain(self, batch: dict) -> dict:
        if self._mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        def cons(x):
            spec = P(self._axis, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self._mesh, spec))

        return {k: cons(v) for k, v in batch.items()}

    # --- jittable sampling -------------------------------------------------
    def __len__(self) -> int:
        return self._n

    @property
    def crop(self) -> int:
        return self._crop

    def sample(self, key: jax.Array, batch_size: int,
               center: bool = False) -> dict:
        """Uniform batch with per-sample random (or center) crop — pure jnp.

        CONTRASTYOU_MXU_CROP=1 runs the random crop as two one-hot MXU
        matmuls (:func:`_crop_matmul`, bit-exact) instead of the vmapped
        ``dynamic_slice``. Round-3 measurement: the DS+DUS crop lowering
        is only ~0.01 ms/step on this toolchain and the bench is identical
        either way (351.6 slices/s) — the slice form stays the default;
        the knob is kept for toolchains where vmapped dynamic_slice
        serializes badly."""
        c = self._crop
        h, w = self._images.shape[1:3]
        ki, ky, kx = jax.random.split(key, 3)
        idx = jax.random.randint(ki, (batch_size,), 0, self._n)
        if center or (h == c and w == c):
            # static offsets: XLA folds these to plain slices
            oy = jnp.full((batch_size,), (h - c) // 2, jnp.int32)
            ox = jnp.full((batch_size,), (w - c) // 2, jnp.int32)
            img, tgt = _crop_slices(self._images[idx], self._targets[idx],
                                    oy, ox, c)
        else:
            oy = jax.random.randint(ky, (batch_size,), 0, h - c + 1)
            ox = jax.random.randint(kx, (batch_size,), 0, w - c + 1)
            crop_fn = (_crop_matmul if _mxu_crop_enabled() else _crop_slices)
            img, tgt = crop_fn(self._images[idx], self._targets[idx],
                               oy, ox, c)
        from .wire import unwire
        return self._constrain(unwire(
            {"image": img[..., None], "target": tgt,
             "partition": self._partition[idx],
             "patient": self._patient[idx], "cycle": self._cycle[idx],
             "scan_id": self._scan_id[idx]}))


def _mxu_crop_enabled() -> bool:
    """One-hot-matmul random crop knob (CONTRASTYOU_MXU_CROP=1 opts in;
    measured NEUTRAL end-to-end on this toolchain — see sample())."""
    import os
    return perf_knob("MXU_CROP") == "1"


def _crop_slices(imgs, tgts, oy, ox, c):
    """Per-sample dynamic-slice crop (the XLA-native form)."""
    def crop_one(im, tg, y, x):
        return (jax.lax.dynamic_slice(im, (y, x), (c, c)),
                jax.lax.dynamic_slice(tg, (y, x), (c, c)))

    return jax.vmap(crop_one)(imgs, tgts, oy, ox)


def _one_hot_windows(off, c, n):
    """[B, c, n] f32 selection: row i of sample b is one-hot at off[b]+i."""
    pos = off[:, None, None] + jnp.arange(c, dtype=jnp.int32)[None, :, None]
    return (pos == jnp.arange(n, dtype=jnp.int32)[None, None, :]
            ).astype(jnp.float32)


def _crop_matmul(imgs, tgts, oy, ox, c):
    """Random crop as two one-hot MXU contractions (rows, then columns).

    BIT-exact: every output pixel is a 1-term sum of the f32-upcast input
    (f32 holds the cache's f32/bf16 images and small int class ids
    losslessly), so the matmul form reproduces the slice crop exactly."""
    B, h, w = imgs.shape
    rows = _one_hot_windows(oy, c, h)
    cols = _one_hot_windows(ox, c, w)

    def crop(x):
        t = jnp.einsum("bch,bhw->bcw", rows, x.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return jnp.einsum("bcw,bdw->bcd", t, cols,
                          preferred_element_type=jnp.float32)

    img = crop(imgs).astype(imgs.dtype)
    tgt = jnp.rint(crop(tgts)).astype(tgts.dtype)
    return img, tgt
