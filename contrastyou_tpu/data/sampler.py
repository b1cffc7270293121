"""Index samplers (framework-agnostic generators over dataset indices).

Capability match for contrastyou/data/sampler.py:16-288 and
semi_seg/data/rearr.py:35-101:
- ``InfiniteRandomSampler``: endless reshuffled index stream (train loaders are
  zipped against ``range(num_batches)``);
- ``ScanBatchSampler``: one batch = all slices of one 3D scan (eval/inference);
- ``ContrastBatchSampler``: sample m scans x k slices per anatomical partition
  so contrastive batches align with partition/patient labels.
"""
from __future__ import annotations

import typing as t

import numpy as np

__all__ = ["InfiniteRandomSampler", "ScanBatchSampler", "ContrastBatchSampler"]


class InfiniteRandomSampler:
    """Endless reshuffled index stream.

    Multi-host: pass ``process_index``/``process_count`` (or leave None to
    read them from ``jax``) and each process consumes a DISJOINT stride of
    the same seeded permutation — the host-sharded input pipeline for the
    data mesh (every process feeds its local devices a different global-batch
    shard; the reference's DDP analogue is torch DistributedSampler).
    """

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0,
                 process_index: int | None = None,
                 process_count: int | None = None):
        self._size = size
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._pi = process_index
        self._pc = process_count

    def _process_slice(self) -> t.Tuple[int, int]:
        if self._pi is not None or self._pc is not None:
            return int(self._pi or 0), int(self._pc or 1)
        import jax
        return jax.process_index(), jax.process_count()

    def __iter__(self) -> t.Iterator[int]:
        pi, pc = self._process_slice()
        while True:
            order = (self._rng.permutation(self._size) if self._shuffle
                     else np.arange(self._size))
            yield from order[pi::pc].tolist()


class ScanBatchSampler:
    """Yields one index-list per 3D scan, slices in file order."""

    def __init__(self, dataset, shuffle: bool = False, seed: int = 0):
        stems = dataset.get_stem_list()
        scans: dict[str, list[int]] = {}
        for i, stem in enumerate(stems):
            scans.setdefault(dataset.get_scan_name(stem), []).append(i)
        self._batches = [scans[k] for k in sorted(scans)]
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    @property
    def max_batch_size(self) -> int:
        return max(len(b) for b in self._batches)

    def __len__(self) -> int:
        return len(self._batches)

    def __iter__(self) -> t.Iterator[t.List[int]]:
        order = (self._rng.permutation(len(self._batches)) if self._shuffle
                 else range(len(self._batches)))
        for i in order:
            yield list(self._batches[i])


class ContrastBatchSampler:
    """Batch = for each of ``scan_sample_num`` random scans, up to
    ``partition_sample_num`` random slices from every partition."""

    def __init__(self, dataset, scan_sample_num: int = 4,
                 partition_sample_num: int = 1, shuffle: bool = False,
                 seed: int = 0):
        stems = dataset.get_stem_list()
        self._scan2index: dict[str, list[int]] = {}
        self._partition2index: dict[int, list[int]] = {}
        for i, stem in enumerate(stems):
            self._scan2index.setdefault(dataset.get_scan_name(stem), []).append(i)
            self._partition2index.setdefault(dataset.get_partition(stem), []).append(i)
        assert 1 <= scan_sample_num <= len(self._scan2index), scan_sample_num
        self._scan_sample_num = scan_sample_num
        self._partition_sample_num = partition_sample_num
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._scans = sorted(self._scan2index)
        self._partition_sets = {p: set(v) for p, v in self._partition2index.items()}

    @property
    def batch_size(self) -> int:
        """Nominal batch size (actual batches can be smaller when a partition
        has no slice for a scan)."""
        return self._scan_sample_num * len(self._partition2index) * self._partition_sample_num

    def __iter__(self) -> t.Iterator[t.List[int]]:
        while True:
            batch: list[int] = []
            chosen = self._rng.choice(len(self._scans), self._scan_sample_num,
                                      replace=False)
            for si in chosen:
                scan_indices = set(self._scan2index[self._scans[si]])
                for p in sorted(self._partition_sets):
                    pool = sorted(scan_indices & self._partition_sets[p])
                    if len(pool) < self._partition_sample_num:
                        continue
                    picked = self._rng.choice(len(pool),
                                              self._partition_sample_num,
                                              replace=False)
                    batch.extend(pool[i] for i in picked)
            if self._shuffle:
                self._rng.shuffle(batch)
            yield batch
