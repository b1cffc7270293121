"""Batch assembly + background prefetch.

The reference uses torch DataLoader worker processes (config num_workers=5).
The TPU rebuild assembles fixed-shape numpy batches on host threads (PIL/numpy
release the GIL for the heavy parts) and prefetches into a bounded queue so
the device never waits on input (BASELINE.md north-star requires the input
pipeline to overlap with the MXU).

Batch protocol (all fixed shapes, jit-friendly):
  image:     f32 [B, H, W, 1] in [0, 1]
  target:    i32 [B, H, W]
  partition: i32 [B]
  scan_id:   i32 [B]        (dense id into dataset.get_scan_list())
  mask:      bool [B]       (False for padded slots of partial batches)
  scan:      list[str]      (host-side names, for per-scan dice grouping)
  filename:  list[str]
"""
from __future__ import annotations

import itertools
import queue
import threading
import typing as t

import numpy as np

__all__ = ["BatchLoader", "collate"]


def collate(items: t.Sequence[dict], batch_size: int,
            scan_to_id: t.Mapping[str, int]) -> dict:
    """Stack item dicts, padding to ``batch_size`` by repeating the last item
    with mask=False."""
    n = len(items)
    assert 1 <= n <= batch_size, (n, batch_size)
    pad = batch_size - n
    items = list(items) + [items[-1]] * pad
    batch = {
        "image": np.stack([i["image"] for i in items]).astype(np.float32),
        "target": np.stack([i["target"] for i in items]).astype(np.int32),
        "partition": np.asarray([i["partition"] for i in items], np.int32),
        "patient": np.asarray([i.get("patient", 0) for i in items], np.int32),
        "cycle": np.asarray([i.get("cycle", 0) for i in items], np.int32),
        "scan_id": np.asarray([scan_to_id.get(i["scan"], -1) for i in items],
                              np.int32),
        "mask": np.asarray([True] * n + [False] * pad),
        "scan": [(i["scan"] if k < n else None) for k, i in enumerate(items)],
        "filename": [i["filename"] for i in items],
    }
    for key in items[0]:
        if key not in ("image", "target", "partition", "scan", "filename"):
            if isinstance(items[0][key], np.ndarray):
                batch[key] = np.stack([i[key] for i in items])
    return batch


class BatchLoader:
    """Iterable over collated batches.

    modes:
      - ``sampler`` (per-index iterator, possibly infinite) + ``batch_size``;
      - ``batch_sampler`` (yields index lists) -> batches padded to
        ``pad_to`` (default: the sampler's max batch size).
    """

    def __init__(self, dataset, *, sampler: t.Iterable[int] | None = None,
                 batch_size: int | None = None,
                 batch_sampler: t.Iterable[t.List[int]] | None = None,
                 pad_to: int | None = None, seed: int = 0,
                 prefetch: int = 4, infinite: bool | None = None,
                 fast_crop: t.Tuple[int, int, str] | None = None,
                 num_threads: int = 4):
        assert (sampler is None) != (batch_sampler is None), \
            "provide exactly one of sampler/batch_sampler"
        self._dataset = dataset
        self._sampler = sampler
        self._batch_sampler = batch_sampler
        self._batch_size = batch_size
        self._pad_to = pad_to
        self._seed = seed
        self._prefetch = prefetch
        self._infinite = infinite if infinite is not None else (
            sampler is not None and batch_size is not None)
        scans = dataset.get_scan_list()
        self.scan_to_id = {s: i for i, s in enumerate(scans)}
        self.num_scans = len(scans)
        self._counter = itertools.count()
        # native fast path: (out_h, out_w, "random"|"center") crop+collate of
        # RAM-preloaded uint8 slices through the C++ kernel, bypassing the
        # per-item Python transform pipeline
        self._fast_crop = fast_crop
        self._num_threads = num_threads
        if fast_crop is not None:
            from .. import native
            assert native.available(), "native library unavailable for fast_crop"
            assert dataset._preload is not None, \
                "fast_crop needs dataset.preload()"
            self._fast_rng = np.random.default_rng(seed ^ 0x5F5E1)
            stems = dataset.get_stem_list()
            self._fast_meta = []
            for stem in stems:
                scan = dataset.get_scan_name(stem)
                patient, cycle = dataset.get_patient_cycle(scan)
                self._fast_meta.append(
                    (stem, scan, dataset.get_partition(stem), patient, cycle))

    def _fast_batch(self, idxs: t.List[int]) -> dict:
        from .. import native
        out_h, out_w, mode = self._fast_crop
        pre = self._dataset._preload
        img_sub, gt_sub = self._dataset._sub_folders[:2]
        images = [pre[img_sub][i] for i in idxs]
        labels = [pre[gt_sub][i] for i in idxs]
        in_h, in_w = images[0].shape
        n = len(idxs)
        if mode == "random":
            ys = self._fast_rng.integers(0, max(in_h - out_h, 0) + 1, n)
            xs = self._fast_rng.integers(0, max(in_w - out_w, 0) + 1, n)
        else:
            ys = np.full(n, max((in_h - out_h) // 2, 0))
            xs = np.full(n, max((in_w - out_w) // 2, 0))
        out_img, out_lab = native.fast_collate_crop(
            images, labels, ys, xs, out_h, out_w,
            num_threads=self._num_threads)
        meta = [self._fast_meta[i] for i in idxs]
        return {
            "image": out_img[..., None],
            "target": out_lab,
            "partition": np.asarray([m[2] for m in meta], np.int32),
            "patient": np.asarray([m[3] for m in meta], np.int32),
            "cycle": np.asarray([m[4] for m in meta], np.int32),
            "scan_id": np.asarray([self.scan_to_id.get(m[1], -1)
                                   for m in meta], np.int32),
            "mask": np.ones(n, bool),
            "scan": [m[1] for m in meta],
            "filename": [m[0] for m in meta],
        }

    @property
    def dataset(self):
        return self._dataset

    @property
    def item_shape(self) -> tuple:
        """Shape of one image item, WITHOUT consuming sampler/rng state (for
        model-shape probing; a throwaway rng keeps the loader deterministic)."""
        if self._fast_crop is not None:
            out_h, out_w, _ = self._fast_crop
            return (out_h, out_w, 1)
        item = self._dataset[(0, np.random.default_rng(0))]
        return tuple(item["image"].shape)

    @property
    def batch_size(self) -> int:
        if self._batch_size is not None:
            return self._batch_size
        if self._pad_to is not None:
            return self._pad_to
        return self._batch_sampler.max_batch_size  # type: ignore[union-attr]

    def _item(self, index: int) -> dict:
        rng = np.random.default_rng(
            (self._seed * 0x9E3779B1 + next(self._counter)) % (2 ** 32))
        return self._dataset[(index, rng)]

    def _batches(self) -> t.Iterator[dict]:
        if self._sampler is not None:
            it = iter(self._sampler)
            while True:
                idxs = list(itertools.islice(it, self._batch_size))
                if not idxs:
                    return
                if len(idxs) < self._batch_size and self._infinite:
                    return
                if self._fast_crop is not None:
                    yield self._fast_batch(idxs)
                    continue
                yield collate([self._item(i) for i in idxs], self._batch_size,
                              self.scan_to_id)
        else:
            pad_to = self.batch_size
            for idxs in self._batch_sampler:  # type: ignore[union-attr]
                if not idxs:
                    continue
                idxs = idxs[:pad_to]
                yield collate([self._item(i) for i in idxs], pad_to,
                              self.scan_to_id)

    def __iter__(self) -> t.Iterator[dict]:
        """Iterate with a background prefetch thread."""
        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        sentinel = object()
        error: list[BaseException] = []
        stop = threading.Event()

        def worker():
            try:
                for batch in self._batches():
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 - propagate to consumer
                error.append(e)
            finally:
                try:
                    q.put(sentinel, timeout=5)
                except queue.Full:
                    pass

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is sentinel:
                    if error:
                        raise error[0]
                    return
                yield batch
        finally:
            stop.set()
