"""Process-parallel scan source: serve `scans[k]` from forked OS workers.

The in-thread producer (`DeviceChunkPrefetcher` staging threads) is bounded
by the GIL for numpy-heavy readers: measured on the KITTI-00 stream, 3
staging threads render at 0.91× the SERIAL rate (render ≈7.6 ms/scan is
python/numpy and holds the GIL), leaving the consumer waiting ~300 ms per
16-scan chunk (phase3 `chunk_attribution.mean_wait_ms`, BENCH_r05). Worker
PROCESSES sidestep the GIL the same way the reference isolates its bag
reader / filter producer in its own OS node (filter_node.cpp:38-44,
SURVEY.md §2d P2) — here it is a library data-loader, not a message bus.

Start method is **fork**: workers inherit the scan source (world + poses,
~100 MB) copy-on-write with zero serialization. Workers must never touch
jax — the parent's TPU-tunnel state is inherited but unused; `render_scan`
is pure numpy by design, and workers exit via `os._exit` (after flushing
their result-queue feeder) so inherited atexit hooks never run.

Results flow back over a multiprocessing queue (~0.4 MB/scan pickle,
amortized across workers); the parent collector thread indexes them for
in-order (or mildly out-of-order — the chunked prefetcher's threads
interleave chunks) consumption. Indices already consumed, or requested
after `close()`, fall back to rendering inline in the parent, so repeated
access stays correct (e.g. the warmup probe reads scan 0, then the
continuation `_TailView` never does).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import threading

import numpy as np


def _worker_main(scans, task_q, res_q):
    try:
        while True:
            k = task_q.get()
            if k is None:
                break
            try:
                scan = scans[k]
                xyz, inten = scan if isinstance(scan, tuple) else (scan, None)
                res_q.put((k, np.asarray(xyz, np.float32),
                           None if inten is None
                           else np.asarray(inten, np.float32), None))
            except Exception as e:  # surfaced in the parent's __getitem__
                res_q.put((k, None, None, repr(e)))
    finally:
        res_q.close()
        res_q.join_thread()  # flush buffered puts before the hard exit
        os._exit(0)          # skip inherited atexit (TPU-tunnel teardown)


class ProcessScanSource:
    """Indexable view of `scans` whose items are produced by `workers`
    forked processes, `readahead` items ahead of consumption.

    Contract: same `__len__`/`__getitem__` as the wrapped sequence (items
    come back float32); any index may be requested at most once from the
    parallel path — repeats and post-`close()` requests render inline."""

    def __init__(self, scans, workers: int = 3, readahead: int = 128):
        self.scans = scans
        self._n = len(scans)
        self._readahead = max(readahead, 2 * max(1, workers))
        ctx = mp.get_context("fork")
        self._task_q = ctx.Queue()
        self._res_q = ctx.Queue()
        self._results: dict[int, tuple] = {}
        self._served: set[int] = set()
        self._cv = threading.Condition()
        self._consumed = 0
        self._closed = False
        self._procs = [
            ctx.Process(target=_worker_main,
                        args=(scans, self._task_q, self._res_q), daemon=True)
            for _ in range(max(1, workers))
        ]
        for p in self._procs:
            p.start()
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._collector = threading.Thread(target=self._collect, daemon=True)
        self._feeder.start()
        self._collector.start()

    def _feed(self) -> None:
        for k in range(self._n):
            with self._cv:
                while (not self._closed
                       and k >= self._consumed + self._readahead):
                    self._cv.wait(0.2)
                if self._closed:
                    return
            self._task_q.put(k)
        for _ in self._procs:
            self._task_q.put(None)

    def _collect(self) -> None:
        done = 0
        while done < self._n and not self._closed:
            try:
                k, xyz, inten, err = self._res_q.get(timeout=0.2)
            except Exception:
                continue
            with self._cv:
                self._results[k] = (xyz, inten, err)
                self._cv.notify_all()
            done += 1

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, k: int):
        if k < 0:
            k += self._n
        with self._cv:
            if self._closed or k in self._served or not (0 <= k < self._n):
                fallback = True
            else:
                fallback = False
                while k not in self._results:
                    if self._closed or not any(
                            p.is_alive() for p in self._procs):
                        fallback = True  # workers died: render inline
                        break
                    self._cv.wait(0.2)
                if not fallback:
                    xyz, inten, err = self._results.pop(k)
                    self._served.add(k)
                    self._consumed += 1
                    self._cv.notify_all()
        if fallback:
            return self.scans[k]
        if err is not None:
            raise RuntimeError(f"scan worker failed on index {k}: {err}")
        return xyz if inten is None else (xyz, inten)

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        for p in self._procs:
            p.terminate()  # our own children, by exact PID
        for p in self._procs:
            p.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
