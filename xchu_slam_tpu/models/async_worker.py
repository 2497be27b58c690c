"""Asynchronous loop-closure worker.

The reference runs loop detection and ICP verification in dedicated threads
(`LoopClosure` at 2 Hz + `ICPRefine` busy-loop, `pgo_node.cpp:390-483`)
synchronized by mutexes around shared mutable arrays — including a real data
race on `keyframePosesUpdated` (SURVEY.md §5). Here the worker thread operates
on *immutable snapshots* of the keyframe database (JAX arrays are immutable;
re-binding is atomic under the GIL), and all state WRITES stay on the
pipeline's thread: accepted loops travel back through a queue and are applied
at the next scan boundary. No mutexes, no races, same decoupling.
"""

from __future__ import annotations

import queue
import threading
from typing import NamedTuple


class VerifiedLoop(NamedTuple):
    i: int
    j: int
    T: object       # jnp [4,4]
    fitness: float
    method: str


class AsyncLoopWorker:
    def __init__(self, pipe):
        self.pipe = pipe
        self.jobs: queue.Queue = queue.Queue()
        self.results: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def submit(self, k: int, stamp: float) -> None:
        self.jobs.put((k, stamp))

    def drain(self) -> list[VerifiedLoop]:
        out = []
        while True:
            try:
                out.append(self.results.get_nowait())
            except queue.Empty:
                return out

    def stop(self) -> None:
        self._stop.set()
        self.jobs.put(None)
        self.thread.join(timeout=30)

    # ------------------------------------------------------------------ #
    def _run(self) -> None:
        exiting = False
        while not exiting:
            job = self.jobs.get()
            if job is None:
                return
            # collapse a backlog to the newest job (detection on the freshest
            # keyframe subsumes older ones — the reference's 2 Hz thread drops
            # intermediate frames the same way); a stop sentinel found in the
            # backlog still lets the newest job complete first
            while True:
                try:
                    nxt = self.jobs.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    exiting = True
                    break
                job = nxt
            k, stamp = job
            try:
                rec = self.pipe.detect_and_verify_snapshot(k, stamp)
            except Exception:  # worker must never kill the run
                continue
            if rec is not None:
                self.results.put(rec)
