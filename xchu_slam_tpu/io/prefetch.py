"""Host→device scan staging: packed transfers + threaded prefetch.

The per-scan device compute is ~0.1-0.2 ms (see bench.py), so the end-to-end
rate is bounded by host→device transfer of the raw scan. Two measures keep the
link off the critical path — the TPU-native analogue of the reference's
producer/consumer split between the rosbag reader and the filter/odom nodes
(`filter_node.cpp:47-51`, SURVEY.md §2d P2):

1. **Packed staging** (`ScanStager`): one [capacity,4] float32 array
   (xyz+intensity) + a valid-count scalar per scan — a single h2d transfer
   instead of three (xyz/intensity/mask), with the mask/split done by a tiny
   device program.
2. **Threaded prefetch** (`DeviceScanPrefetcher`): N staging threads transfer
   scans k+1..k+depth while the device computes scan k; scans are delivered
   strictly in order. A ring of host buffers (depth + threads + 2) keeps
   staging allocation-free.
"""

from __future__ import annotations

import functools
import threading
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from xchu_slam_tpu.types import Cloud


@jax.jit
def _unpack(packed, n_valid):
    """[C,4] packed scan + count → Cloud (device-side split + mask)."""
    mask = jnp.arange(packed.shape[0]) < n_valid
    xyz = jnp.where(mask[:, None], packed[:, :3], 0.0)
    return Cloud(xyz=xyz, intensity=packed[:, 3], mask=mask)


def _stage_array(buf: np.ndarray) -> jnp.ndarray:
    """Move a reusable host ring buffer to the device, such that the caller
    may overwrite `buf` the moment this returns.

    On an accelerator backend that is a real h2d copy: block until the
    transfer commits, then the slot is free (overlap comes from running
    several stager threads, not from racing a mutable buffer against an
    in-flight transfer). On the CPU backend `jnp.asarray` can alias the host
    memory ZERO-COPY — blocking doesn't help because the consuming
    computation runs later — so hand the array an OWNED copy instead
    (observed otherwise as a rare chunked-vs-per-scan mismatch under heavy
    host contention: a lagging unpack read a buffer the next stage() call
    was overwriting)."""
    if jax.default_backend() == "cpu":
        return jnp.asarray(buf.copy())
    packed = jnp.asarray(buf)
    packed.block_until_ready()
    return packed


# Fixed-point staging: 2 mm resolution, int16 range ±65.534 m — comfortably
# beyond the 60 m range crop (reference filter_node.cpp:242-247) and ~10×
# below LiDAR sensor noise, so odometry is unaffected (tests/test_prefetch.py
# checks trajectory parity). Halves the bytes/point on the host↔device link,
# which bounds end-to-end throughput (see bench.py).
_QUANT_SCALE = 500.0
_INTEN_SCALE = 255.0


@functools.partial(jax.jit, static_argnames=("capacity",))
def _unpack_quant(packed, n_valid, capacity: int):
    """int16[C,4] packed scan + count → Cloud, dequantized + padded on
    device. C ≤ capacity (tight transfer buckets, padding is free on-device)."""
    c = packed.shape[0]
    xyz = packed[:, :3].astype(jnp.float32) * (1.0 / _QUANT_SCALE)
    inten = packed[:, 3].astype(jnp.float32) * (1.0 / _INTEN_SCALE)
    if c < capacity:
        xyz = jnp.pad(xyz, ((0, capacity - c), (0, 0)))
        inten = jnp.pad(inten, (0, capacity - c))
    mask = jnp.arange(capacity) < n_valid
    return Cloud(xyz=jnp.where(mask[:, None], xyz, 0.0),
                 intensity=jnp.where(mask, inten, 0.0), mask=mask)


class ScanStager:
    """Reusable pinned host buffer → one packed h2d transfer per scan.

    With `quantize=True` the transfer is int16 fixed-point (2 mm) and sized
    to the smallest `bucket`-multiple ≥ the scan's point count — ~3.5× fewer
    bytes over the link than padded float32 for a typical KITTI scan,
    dequantized/padded by a tiny device program. Each distinct bucket size
    compiles one unpack program (≤ capacity/bucket of them).

    Default is float32 (`quantize=False`): on the axon-relay TPU the link is
    latency-bound, not bandwidth-bound — measured 1150 scans/s float vs 760
    quantized (the host-side fixed-point conversion adds ~1.3 ms to each
    staging thread's critical path and int16 h2d is no faster). Use
    `quantize=True` on genuinely bandwidth-constrained links (e.g. DCN-remote
    feeds) where 3.5× fewer bytes wins."""

    def __init__(self, capacity: int, n_buffers: int = 2,
                 quantize: bool = False, bucket: int = 4096):
        self.capacity = capacity
        self.quantize = quantize
        self.bucket = bucket
        dtype = np.int16 if quantize else np.float32
        self._bufs = [np.zeros((capacity, 4), dtype)
                      for _ in range(n_buffers)]
        self._next = 0

    def stage(self, xyz: np.ndarray, intensity: np.ndarray | None) -> Cloud:
        buf = self._bufs[self._next]
        self._next = (self._next + 1) % len(self._bufs)
        n = min(len(xyz), self.capacity)
        if self.quantize:
            # non-finite → clamp to the int16 rim → range-cropped on device
            q = np.nan_to_num(np.asarray(xyz[:n], np.float32) * _QUANT_SCALE,
                              nan=32767.0, posinf=32767.0, neginf=-32767.0)
            buf[:n, :3] = np.clip(np.rint(q), -32767, 32767)
            if intensity is None:
                buf[:n, 3] = 0
            else:
                qi = np.nan_to_num(
                    np.asarray(intensity[:n], np.float32) * _INTEN_SCALE,
                    nan=0.0, posinf=32767.0, neginf=0.0)
                buf[:n, 3] = np.clip(np.rint(qi), -32767, 32767)
            c = min(-(-max(n, 1) // self.bucket) * self.bucket, self.capacity)
            if n < c:
                buf[n:c] = 0
            packed = _stage_array(buf[:c])
            return _unpack_quant(packed, jnp.int32(n), self.capacity)
        buf[:n, :3] = xyz[:n]
        if intensity is None:
            buf[:n, 3] = 0.0
        else:
            buf[:n, 3] = intensity[:n]
        if n < self.capacity:
            buf[n:] = 0.0
        packed = _stage_array(buf)
        return _unpack(packed, jnp.int32(n))


class DeviceScanPrefetcher:
    """Iterate device-staged Clouds for a sequence of host scans, with
    `threads` staging threads running `depth` scans ahead of consumption."""

    def __init__(self, scans, capacity: int,
                 depth: int = 4, threads: int = 2, quantize: bool = False):
        # any indexable sequence works, including a lazy one (LazyScans) whose
        # __getitem__ reads from disk — the read then happens in the staging
        # threads, overlapping file IO with device compute
        if not (hasattr(scans, "__getitem__") and hasattr(scans, "__len__")):
            scans = list(scans)
        self.scans = scans
        self.capacity = capacity
        self.depth = depth
        self._results: dict[int, Cloud] = {}
        self._cv = threading.Condition()
        self._next_job = 0
        self._consumed = 0
        self._threads = [
            threading.Thread(target=self._work, daemon=True)
            for _ in range(max(1, threads))
        ]
        self._stagers = [ScanStager(capacity, n_buffers=2, quantize=quantize)
                         for _ in self._threads]
        for i, t in enumerate(self._threads):
            t._stager_idx = i  # type: ignore[attr-defined]
            t.start()

    def _work(self) -> None:
        stager = self._stagers[threading.current_thread()._stager_idx]  # type: ignore[attr-defined]
        while True:
            with self._cv:
                while (self._next_job < len(self.scans)
                       and self._next_job >= self._consumed + self.depth):
                    self._cv.wait()
                if self._next_job >= len(self.scans):
                    return
                k = self._next_job
                self._next_job += 1
            scan = self.scans[k]
            xyz, inten = scan if isinstance(scan, tuple) else (scan, None)
            self._results_put(k, stager.stage(xyz, inten))

    def _results_put(self, k: int, cloud: Cloud) -> None:
        with self._cv:
            self._results[k] = cloud
            self._cv.notify_all()

    def __iter__(self) -> Iterator[Cloud]:
        for k in range(len(self.scans)):
            with self._cv:
                while k not in self._results:
                    self._cv.wait()
                cloud = self._results.pop(k)
                self._consumed += 1
                self._cv.notify_all()
            yield cloud

    def __len__(self) -> int:
        return len(self.scans)


# ---------------- chunked staging (multi-scan transfers) ------------------ #

@functools.partial(jax.jit, static_argnames=())
def _unpack_chunk(packed, counts):
    """[C,cap,4] packed chunk + counts[C] → Cloud batch (leading axis C)."""
    cap = packed.shape[1]
    mask = jnp.arange(cap)[None, :] < counts[:, None]
    xyz = jnp.where(mask[:, :, None], packed[:, :, :3], 0.0)
    return Cloud(xyz=xyz, intensity=jnp.where(mask, packed[:, :, 3], 0.0),
                 mask=mask)


@functools.partial(jax.jit, static_argnames=())
def _unpack_chunk_quant(packed, counts):
    cap = packed.shape[1]
    mask = jnp.arange(cap)[None, :] < counts[:, None]
    xyz = packed[:, :, :3].astype(jnp.float32) * (1.0 / _QUANT_SCALE)
    inten = packed[:, :, 3].astype(jnp.float32) * (1.0 / _INTEN_SCALE)
    return Cloud(xyz=jnp.where(mask[:, :, None], xyz, 0.0),
                 intensity=jnp.where(mask, inten, 0.0), mask=mask)


class ChunkStager:
    """Stage `chunk` scans as ONE [chunk,cap,4] transfer.

    The relay link costs ~0.3 ms fixed latency per transfer + ~1.6 GB/s
    (measured, bench.py); per-scan staging caps end-to-end throughput at
    ~1.2k scans/s while the device sustains ~12k steps/s. One chunk transfer
    amortizes the fixed cost over `chunk` scans and pairs with the
    `lax.scan` multi-scan device step (models/odometry.chunk_step,
    models/device_pipeline.device_chunk_step): one dispatch per chunk."""

    def __init__(self, capacity: int, chunk: int, n_buffers: int = 2,
                 quantize: bool = False):
        self.capacity = capacity
        self.chunk = chunk
        self.quantize = quantize
        dtype = np.int16 if quantize else np.float32
        self._bufs = [np.zeros((chunk, capacity, 4), dtype)
                      for _ in range(n_buffers)]
        self._next = 0

    def stage(self, scans: list) -> tuple[Cloud, int]:
        """scans: list of ≤chunk (xyz[,intensity]) tuples/arrays. Returns a
        Cloud batch [chunk,...] and the number of real scans in it (trailing
        slots of a short final chunk are empty: mask all-False)."""
        buf = self._bufs[self._next]
        self._next = (self._next + 1) % len(self._bufs)
        counts = np.zeros((self.chunk,), np.int32)
        for s, scan in enumerate(scans[:self.chunk]):
            xyz, inten = scan if isinstance(scan, tuple) else (scan, None)
            n = min(len(xyz), self.capacity)
            counts[s] = n
            if self.quantize:
                q = np.nan_to_num(
                    np.asarray(xyz[:n], np.float32) * _QUANT_SCALE,
                    nan=32767.0, posinf=32767.0, neginf=-32767.0)
                buf[s, :n, :3] = np.clip(np.rint(q), -32767, 32767)
                if inten is None:
                    buf[s, :n, 3] = 0
                else:
                    qi = np.nan_to_num(
                        np.asarray(inten[:n], np.float32) * _INTEN_SCALE,
                        nan=0.0, posinf=32767.0, neginf=0.0)
                    buf[s, :n, 3] = np.clip(np.rint(qi), -32767, 32767)
            else:
                buf[s, :n, :3] = xyz[:n]
                buf[s, :n, 3] = 0.0 if inten is None else inten[:n]
            if n < self.capacity:
                buf[s, n:] = 0
        for s in range(len(scans), self.chunk):
            buf[s] = 0
        packed = _stage_array(buf)
        unpack = _unpack_chunk_quant if self.quantize else _unpack_chunk
        return unpack(packed, jnp.asarray(counts)), len(scans)


class DeviceChunkPrefetcher:
    """Iterate (Cloud batch [chunk,...], n_real) pairs with threaded staging —
    the chunked counterpart of DeviceScanPrefetcher."""

    def __init__(self, scans, capacity: int, chunk: int = 16,
                 depth: int = 2, threads: int = 2, quantize: bool = False):
        if not (hasattr(scans, "__getitem__") and hasattr(scans, "__len__")):
            scans = list(scans)
        self.scans = scans
        self.chunk = chunk
        self.n_chunks = -(-len(scans) // chunk) if len(scans) else 0
        self._results: dict[int, tuple[Cloud, int]] = {}
        self._cv = threading.Condition()
        self._next_job = 0
        self._consumed = 0
        self.depth = depth
        self._threads = [threading.Thread(target=self._work, daemon=True)
                         for _ in range(max(1, threads))]
        self._stagers = [ChunkStager(capacity, chunk, n_buffers=2,
                                     quantize=quantize)
                         for _ in self._threads]
        for i, t in enumerate(self._threads):
            t._stager_idx = i  # type: ignore[attr-defined]
            t.start()

    def _work(self) -> None:
        stager = self._stagers[threading.current_thread()._stager_idx]  # type: ignore[attr-defined]
        while True:
            with self._cv:
                while (self._next_job < self.n_chunks
                       and self._next_job >= self._consumed + self.depth):
                    self._cv.wait()
                if self._next_job >= self.n_chunks:
                    return
                k = self._next_job
                self._next_job += 1
            lo = k * self.chunk
            group = [self.scans[i]
                     for i in range(lo, min(lo + self.chunk, len(self.scans)))]
            staged = stager.stage(group)
            with self._cv:
                self._results[k] = staged
                self._cv.notify_all()

    def __iter__(self):
        for k in range(self.n_chunks):
            with self._cv:
                while k not in self._results:
                    self._cv.wait()
                item = self._results.pop(k)
                self._consumed += 1
                self._cv.notify_all()
            yield item

    def __len__(self) -> int:
        return self.n_chunks


class LazyScans:
    """Indexable lazy scan sequence: `read(files[k])` on demand, so the
    DeviceScanPrefetcher's staging threads do the disk reads too (KITTI 00 is
    ~9 GB of raw scans — never resident at once)."""

    def __init__(self, files: list, read):
        self.files = files
        self.read = read

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, k: int):
        return self.read(self.files[k])
