"""Wave batcher: coalesce per-read alignment requests into batched kernels.

The reference runs its whole pipeline per-thread, one alignment at a time
(CS.cpp:412-503). On TPU the win comes from batching many banded DP
problems into one wavefront launch (ngmlr_tpu.ops.convex.run_batch already
buckets by shape). The per-read control flow (retry loops, SV realignment,
overlap trimming) is inherently sequential *within* a read but independent
*across* reads, so:

  * each read's processing runs in a lightweight worker thread,
  * every `align_banded` call routes through the active `WaveBatcher`,
    blocking its worker,
  * when all live workers are blocked, the coordinator fires ONE
    `run_batch` over every pending BandSpec and wakes the workers.

Wall-clock per read batch ≈ (max sequential alignment depth of any read) ×
(batched kernel launches) instead of (total alignments) × (single launches).
"""

import threading
from typing import Callable, List, Optional

from ..ops.convex import BandSpec, run_batch, WavefrontResult


class WaveBatcher:
    def __init__(self, max_workers: int = 128):
        self.max_workers = max_workers
        self._lock = threading.Condition()
        self._pending: List = []        # (spec, params, slot)
        self._n_active = 0
        self._n_blocked = 0

    # -- worker side -------------------------------------------------------

    def align(self, spec: BandSpec, params) -> WavefrontResult:
        slot = {"result": None, "event": threading.Event()}
        with self._lock:
            self._pending.append((spec, params, slot))
            self._n_blocked += 1
            self._lock.notify_all()
        slot["event"].wait()
        with self._lock:
            self._n_blocked -= 1
        return slot["result"]

    # -- coordinator -------------------------------------------------------

    def map_jobs(self, jobs: List[Callable[[], object]]) -> List[object]:
        """Run jobs (each may call .align() any number of times), batching
        align requests across them. Returns job results in order."""
        results: List[object] = [None] * len(jobs)
        errors: List[Optional[BaseException]] = [None] * len(jobs)
        queue = list(enumerate(jobs))
        threads: List[threading.Thread] = []

        def work(idx, job):
            try:
                results[idx] = job()
            except BaseException as e:      # propagate after join
                errors[idx] = e
            finally:
                with self._lock:
                    self._n_active -= 1
                    self._lock.notify_all()

        with self._lock:
            launch = queue[: self.max_workers]
            queue = queue[self.max_workers:]
            for idx, job in launch:
                t = threading.Thread(target=work, args=(idx, job), daemon=True)
                self._n_active += 1
                threads.append(t)
            for t in threads:
                t.start()

            while True:
                # wait until every live worker is blocked on an align request
                while self._n_active > 0 and self._n_blocked < self._n_active:
                    self._lock.wait()
                if self._n_active == 0 and not queue:
                    break
                if queue and self._n_active < self.max_workers:
                    # top up the worker pool before firing a wave
                    refill = queue[: self.max_workers - self._n_active]
                    queue = queue[len(refill):]
                    for idx, job in refill:
                        t = threading.Thread(target=work, args=(idx, job),
                                             daemon=True)
                        self._n_active += 1
                        threads.append(t)
                        t.start()
                    continue
                if not self._pending:
                    # workers are between wake-up and the blocked-count
                    # decrement; yield briefly instead of spinning
                    self._lock.wait(0.001)
                    continue
                batch = self._pending
                self._pending = []
                self._lock.release()
                try:
                    self._fire(batch)
                finally:
                    self._lock.acquire()

        for t in threads:
            t.join()
        for e in errors:
            if e is not None:
                raise e
        return results

    def _fire(self, batch):
        # group by params (usually all identical)
        by_params = {}
        for spec, params, slot in batch:
            by_params.setdefault(tuple(params), []).append((spec, slot))
        for params, items in by_params.items():
            specs = [spec for spec, _ in items]
            results = run_batch(specs, params=params)
            for (spec, slot), res in zip(items, results):
                slot["result"] = res
                slot["event"].set()


# Active batcher (None = run single alignments synchronously)
_current: Optional[WaveBatcher] = None


def set_current(b: Optional[WaveBatcher]):
    global _current
    _current = b


def current() -> Optional[WaveBatcher]:
    return _current
