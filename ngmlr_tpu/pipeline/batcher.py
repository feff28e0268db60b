"""Wave batcher: coalesce per-read device requests into batched kernels.

The reference runs its whole pipeline per-thread, one alignment at a time
(CS.cpp:412-503). On TPU the win comes from batching many banded DP /
scoring problems into single kernel launches — especially here, where every
host<->device round trip costs ~25 ms over the tunnel. The per-read control
flow (retry loops, SV realignment, overlap trimming) is inherently
sequential *within* a read but independent *across* reads, so:

  * each read's processing runs in a lightweight worker thread,
  * every device request (banded alignment or scoring probe) routes through
    the active `WaveBatcher`, blocking its worker,
  * when all live workers are blocked, the coordinator fires the pending
    requests as a handful of batched kernel launches and wakes the workers.

Wall-clock per read batch ≈ (max sequential request depth of any read) ×
(wave latency) instead of (total requests) × (single-launch latency).
"""

import os
import sys
import threading
from typing import Callable, List, Optional, Sequence

from ..ops.device_engine import AlignProblem, ScoreProblem, DeviceContext


class WaveBatcher:
    # the pool should cover a whole intake batch: a smaller pool refills
    # mid-stream and every refill's first requests form their own tiny
    # wave; far more threads than that just thrash the GIL on a 1-core host
    def __init__(self, ctx: DeviceContext, readbuf=None,
                 max_workers: int = 256):
        self.ctx = ctx
        self.readbuf = readbuf
        self.max_workers = max_workers
        self._lock = threading.Condition()
        self._pending_align: List = []    # (problem, params, event)
        self._pending_score: List = []    # (problems, event)
        self._n_active = 0
        self._n_blocked = 0
        self._wait_s = 0.0                # total worker time blocked on waves

    # -- worker side -------------------------------------------------------

    def align(self, problem: AlignProblem, params) -> AlignProblem:
        import time
        t0 = time.perf_counter()
        ev = threading.Event()
        with self._lock:
            self._pending_align.append((problem, tuple(params), ev))
            self._n_blocked += 1
            self._lock.notify_all()
        ev.wait()
        with self._lock:
            self._n_blocked -= 1
            self._wait_s += time.perf_counter() - t0
        return problem

    def score(self, problems: Sequence[ScoreProblem]) -> None:
        """Blocks until every problem's .result is filled."""
        if not problems:
            return
        import time
        t0 = time.perf_counter()
        ev = threading.Event()
        with self._lock:
            self._pending_score.append((list(problems), ev))
            self._n_blocked += 1
            self._lock.notify_all()
        ev.wait()
        with self._lock:
            self._n_blocked -= 1
            self._wait_s += time.perf_counter() - t0

    def corun(self, thunks):
        """Run independent thunks concurrently as temporary workers of this
        batcher (their device requests coalesce into the same waves as
        everyone else's). The caller registers as wave-blocked while
        waiting, so the coordinator can still fire. Returns a list of
        (result, exception) pairs — the caller decides which errors matter
        (e.g. the reference would never have evaluated a later alignment
        if an earlier one failed its checks)."""
        n = len(thunks)
        if n == 1:
            try:
                return [(thunks[0](), None)]
            except BaseException as e:
                return [(None, e)]
        results = [None] * n
        errors = [None] * n
        done = threading.Event()
        remaining = [n]

        def sub(i, t):
            _tls.batcher = self
            try:
                results[i] = t()
            except BaseException as e:
                errors[i] = e
            finally:
                with self._lock:
                    self._n_active -= 1
                    remaining[0] -= 1
                    if remaining[0] == 0:
                        done.set()
                    self._lock.notify_all()

        with self._lock:
            self._n_active += n
            for i, t in enumerate(thunks):
                threading.Thread(target=sub, args=(i, t), daemon=True).start()
            self._n_blocked += 1
            self._lock.notify_all()
        done.wait()
        with self._lock:
            self._n_blocked -= 1
        return list(zip(results, errors))

    # -- coordinator -------------------------------------------------------

    def map_jobs(self, jobs: List[Callable[[], object]]) -> List[object]:
        """Run jobs (each may issue device requests any number of times),
        batching requests across them. Returns job results in order."""
        results: List[object] = [None] * len(jobs)
        errors: List[Optional[BaseException]] = [None] * len(jobs)
        queue = list(enumerate(jobs))
        threads: List[threading.Thread] = []

        import time as _time

        def work(idx, job):
            t0 = _time.perf_counter()
            _tls.batcher = self
            try:
                results[idx] = job()
            except BaseException as e:      # propagate after join
                errors[idx] = e
            finally:
                with self._lock:
                    self._n_active -= 1
                    self.ctx.stats["job_wall_s"] = (
                        self.ctx.stats.get("job_wall_s", 0.0)
                        + _time.perf_counter() - t0)
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
                while self._n_active > 0 and self._n_blocked < self._n_active:
                    self._lock.wait()
                if self._n_active == 0 and not queue:
                    break
                if queue and self._n_active < self.max_workers:
                    refill = queue[: self.max_workers - self._n_active]
                    queue = queue[len(refill):]
                    for idx, job in refill:
                        t = threading.Thread(target=work, args=(idx, job),
                                             daemon=True)
                        self._n_active += 1
                        threads.append(t)
                        t.start()
                    continue
                if not self._pending_align and not self._pending_score:
                    # workers are between wake-up and the blocked-count
                    # decrement; yield briefly instead of spinning
                    self._lock.wait(0.001)
                    continue
                aligns = self._pending_align
                scores = self._pending_score
                self._pending_align = []
                self._pending_score = []
                self._lock.release()
                try:
                    self._fire(aligns, scores)
                finally:
                    self._lock.acquire()

        for t in threads:
            t.join()
        self.ctx.stats["job_block_s"] = (
            self.ctx.stats.get("job_block_s", 0.0) + self._wait_s)
        for i, e in enumerate(errors):
            if e is not None:
                if os.environ.get("NGMLR_TPU_STRICT"):
                    raise e
                # reference semantics: a failing read logs and the run
                # continues (NGMTask.cpp:19-31, NGM.cpp:262-265); the
                # caller sees None and writes the read as unmapped
                from ..log import Log
                Log.warning("Error while processing read job %d: %r", i, e)
                results[i] = None
        return results

    def _fire(self, aligns, scores):
        """Dispatch every align kernel of the wave before the first fetch
        (dispatch is async); scores fire after. NOTE: a fully combined
        single device_get for the whole wave was tried and REGRESSED both
        CPU tests (3x) and TPU throughput (~15%) — early buckets' results
        feed workers sooner when fetched per kind. When a round has
        several result fetches, they run in parallel threads: device_get
        releases the GIL while blocked on the ~25 ms tunnel round trip,
        so the latencies overlap while per-bucket wakeup order stays."""
        self.ctx.stats["fire_rounds"] = \
            self.ctx.stats.get("fire_rounds", 0) + 1
        by_params = {}
        for problem, params, ev in aligns:
            by_params.setdefault(params, []).append((problem, ev))
        apends = [(items, self.ctx.align_dispatch([p for p, _ in items],
                                                  params,
                                                  readbuf=self.readbuf))
                  for params, items in by_params.items()]
        spend = None
        if scores:
            flat = [p for probs, _ in scores for p in probs]
            spend = self.ctx.score_dispatch(flat, readbuf=self.readbuf)

        def fin_align(items, pend):
            try:
                self.ctx.align_finalize(pend)
            finally:
                # events must fire even on error, or blocked workers hang
                # forever; the workers then see unfilled problems (ok =
                # False) and the per-read failure handling takes over
                for _, ev in items:
                    ev.set()

        def fin_score():
            try:
                self.ctx.score_finalize(spend)
            finally:
                for _, ev in scores:
                    ev.set()

        jobs = [lambda it=items, pe=pend: fin_align(it, pe)
                for items, pend in apends]
        if spend is not None:
            jobs.append(fin_score)
        elif scores:   # all-empty score round: no fetch, just wake
            for _, ev in scores:
                ev.set()
        if len(jobs) <= 1 or os.environ.get("NGMLR_TPU_SERIAL_FETCH"):
            for j in jobs:
                j()
        else:
            errs = []

            def run(j):
                try:
                    j()
                except BaseException as e:   # re-raised in the coordinator
                    errs.append(e)

            ts = [threading.Thread(target=run, args=(j,), daemon=True)
                  for j in jobs[1:]]
            for t in ts:
                t.start()
            run(jobs[0])
            for t in ts:
                t.join()
            if errs:
                raise errs[0]


class SerialBinding:
    """Single-threaded stand-in for WaveBatcher used by the serial
    execution path (--stdout debug modes, NGMLR_TPU_SYNC): requests fire
    immediately, one at a time, against the batch's OWN read buffer.

    Without this binding the serial path fell back to
    ``DeviceContext.readbuf`` — which the pipelined prep thread overwrites
    when it uploads batch N+1's reads mid-batch, so any serial run past
    one intake batch scored batch N against batch N+1's read bytes."""

    serial = True

    def __init__(self, ctx: DeviceContext, readbuf):
        self.ctx = ctx
        self.readbuf = readbuf

    def align(self, problem: AlignProblem, params) -> AlignProblem:
        self.ctx.align_wave([problem], tuple(params), readbuf=self.readbuf)
        return problem

    def score(self, problems: Sequence[ScoreProblem]) -> None:
        if problems:
            self.ctx.score_wave(problems, readbuf=self.readbuf)

    def corun(self, thunks):
        out = []
        for t in thunks:
            try:
                out.append((t(), None))
            except BaseException as e:
                out.append((None, e))
        return out


# Active batcher. Worker threads carry their batcher in thread-local state
# (two batches' waves may be in flight concurrently — the runner overlaps
# batch N's straggler waves with batch N+1's bulk wave); the module global
# remains as a fallback for single-batcher callers and tests.
_tls = threading.local()
_current: Optional[WaveBatcher] = None


def set_current(b: Optional[WaveBatcher]):
    global _current
    _current = b


def set_thread_batcher(b: Optional[WaveBatcher]):
    _tls.batcher = b


def current() -> Optional[WaveBatcher]:
    b = getattr(_tls, "batcher", None)
    return b if b is not None else _current
