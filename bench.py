"""Benchmark: end-to-end read mapping throughput on one chip.

Generates a deterministic synthetic genome + PacBio-CLR-like reads (~15%
error: 10% insertions, 4% deletions, 1% substitutions — the workload class
of the reference's headline number), maps them end-to-end, and reports
reads/s.

Baseline: the reference maps ~3 Gbp of PacBio reads in ~90 min on a 10-core
Opteron node (README "Introduction") ≈ 60 reads/s at ~8.9 kb mean read
length (BASELINE.md). vs_baseline = our reads/s divided by that 60 r/s.

Deadline discipline: a watchdog (BENCH_DEADLINE_S, default 840 s) plus
SIGTERM/SIGINT handlers print the best-so-far result as the one JSON
line no matter how the process ends. With pre-generated caches
(scripts/bench_prep.py) the bench runs the LARGEST scale whose measured
cost estimate fits the budget — 1000 Mbp under the default deadline,
3000 Mbp with BENCH_DEADLINE_S >= ~1200 (each scale pays ~500-800 s of
cached-executable loads on this backend before its 3 timed passes).
A cold machine escalates 30 → 100 → 300 Mbp instead, updating the
result after each completed scale. `genome_mbp` in the JSON says
honestly which scale completed. Set BENCH_GENOME_MBP to pin one scale.

Prints exactly one JSON line.
"""

import io
import json
import os
import signal
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Progressive scales: the reference's own headline is human-scale; a toy
# genome overstates vs_baseline (the index fits caches, candidate search
# is trivially cheap), so escalate as far as the deadline allows and
# report the largest completed scale. BENCH_GENOME_MBP pins one scale
# (quick iteration / explicit big runs). The 1000/3000 Mbp scales are
# reachable only with pre-generated caches (scripts/bench_prep.py) — a
# cold 3 Gbp index build alone is ~12 min on the 1-core host — so the
# driver's budgeted run lands them via the cached-largest-first path.
SCALES_MBP = [30.0, 100.0, 300.0, 1000.0, 3000.0]
# 3 intake batches: measures steady-state (prep of batch N+1 overlapped
# with batch N's waves), which is how long runs actually behave
N_READS = int(os.environ.get("BENCH_READS", "576"))
N_WARMUP = int(os.environ.get("BENCH_WARMUP", "16"))
READ_LEN = int(os.environ.get("BENCH_READ_LEN", "9000"))
BASELINE_RPS = 60.0
# Internal wall-clock budget. The round-2 driver capture died at rc=124
# with nothing printed; this deadline guarantees the JSON line lands
# first. Conservative default: under the observed driver budget.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "840"))
T_START = time.time()

# best-so-far result; the watchdog/signal handlers print whatever is here
RESULT = {
    "metric": "reads_per_sec_per_chip",
    "value": 0.0,
    "unit": "reads/s",
    "vs_baseline": 0.0,
    "error": "no scale completed before deadline",
}
_emit_lock = threading.Lock()
_emitted = False


def emit(exit_code=None):
    """Print the one JSON line exactly once (thread/signal safe)."""
    global _emitted
    with _emit_lock:
        if not _emitted:
            _emitted = True
            sys.stdout.write(json.dumps(RESULT) + "\n")
            sys.stdout.flush()
    if exit_code is not None:
        os._exit(exit_code)


def _on_signal(signum, frame):
    emit(exit_code=1)


def _watchdog():
    # hard-exit slightly before the external deadline so the JSON line
    # wins the race against SIGKILL; a daemon thread fires even while the
    # main thread is inside a long numpy/JAX call
    delay = max(5.0, DEADLINE_S - (time.time() - T_START) - 5.0)
    timer = threading.Timer(delay, emit, kwargs={"exit_code": 2})
    timer.daemon = True
    timer.start()
    return timer


def remaining_s():
    return DEADLINE_S - (time.time() - T_START)


def make_genome(rng, n):
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)


def mutate_pacbio(rng, seq):
    """~15% error: 10% ins, 4% del, 1% sub — vectorized.

    Per input base: deletion emits nothing; insertion emits one random
    base before the original; substitution replaces the original.
    """
    n = len(seq)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    r = rng.random(n)
    ins = r < 0.10
    dele = (r >= 0.10) & (r < 0.14)
    sub = (r >= 0.14) & (r < 0.15)
    rand_ins = rng.choice(bases, size=n)
    rand_sub = rng.choice(bases, size=n)
    counts = np.where(dele, 0, 1 + ins.astype(np.int64))
    ends = np.cumsum(counts)
    out = np.empty(int(ends[-1]) if n else 0, dtype=np.uint8)
    keep = ~dele
    out[ends[keep] - 1] = np.where(sub, rand_sub, seq)[keep]
    ins_k = ins & keep
    out[ends[ins_k] - 2] = rand_ins[ins_k]
    return out.tobytes()


def revcomp(s: bytes) -> bytes:
    return s.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]


class _StackSampler:
    """Sampling profiler over ALL threads via sys._current_frames (no
    external deps; yappi/py-spy are unavailable in this image). Attributes
    samples to the innermost non-waiting frame so device-fetch blocking
    shows up as jax waits and host compute shows up as real code."""

    def __init__(self, hz=67):
        import threading
        self.hz = hz
        self.counts = {}
        self.n = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()

    def _run(self):
        import sys as _s
        me = self._thread.ident
        while not self._stop.wait(1.0 / self.hz):
            for tid, frame in _s._current_frames().items():
                if tid == me:
                    continue
                f = frame
                # skip pure-wait frames (lock/event waits) to blame the caller
                while f is not None and f.f_code.co_filename.endswith(
                        ("threading.py",)):
                    f = f.f_back
                if f is None:
                    continue
                key = "%s:%d %s" % (f.f_code.co_filename.split("/")[-1],
                                    f.f_lineno, f.f_code.co_name)
                self.counts[key] = self.counts.get(key, 0) + 1
                self.n += 1

    def stop_and_report(self, top=30):
        self._stop.set()
        self._thread.join()
        sys.stderr.write("stack samples (%d total):\n" % self.n)
        for key, c in sorted(self.counts.items(), key=lambda kv: -kv[1])[:top]:
            sys.stderr.write("  %6.2f%% %s\n" % (100.0 * c / max(1, self.n), key))


def _probe_backend(timeout_s: int) -> bool:
    """The axon TPU backend can hang indefinitely in init when the tunnel
    is down; probe it in a killable subprocess so the bench fails fast
    with a diagnosable JSON line instead of hanging the driver."""
    import subprocess
    # Popen + poll deadline, and on timeout kill WITHOUT waiting: a child
    # stuck in the dead tunnel's uninterruptible syscall absorbs even
    # SIGKILL only when the syscall returns, so any wait() (including
    # subprocess.run's post-kill reap) can block forever.
    p = subprocess.Popen(
        [sys.executable, "-c",
         "import os, jax\n"
         "if os.environ.get('JAX_PLATFORMS'):\n"
         "    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])\n"
         "jax.devices()"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        stdin=subprocess.DEVNULL)
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if p.poll() is not None:
            return p.returncode == 0
        time.sleep(1.0)
    p.kill()
    return False


def workdir_for(genome_mbp: float) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        "ngmlr_bench_g%s_r%d_n%d_w%d" % (genome_mbp, READ_LEN, N_READS,
                                         N_WARMUP))


def cache_ready(genome_mbp: float) -> bool:
    """True when a scale's full prep artifact set exists (FASTAs + encoded
    ref + index), so running it costs load + warmup + passes only."""
    d = workdir_for(genome_mbp)
    return all(os.path.exists(os.path.join(d, f)) for f in (
        "ref.fa", "reads.fa", "warmup.fa",
        "ref.fa-enc.tpu.npz", "ref.fa-ht-13-2.tpu.npz"))


def prepare_workdir(genome_mbp: float):
    """Genome + reads FASTAs for one scale (cached across runs)."""
    rng = np.random.default_rng(1234)
    glen = int(genome_mbp * 1e6)
    tmpdir = workdir_for(genome_mbp)
    os.makedirs(tmpdir, exist_ok=True)
    ref_path = os.path.join(tmpdir, "ref.fa")
    reads_path = os.path.join(tmpdir, "reads.fa")
    warmup_path = os.path.join(tmpdir, "warmup.fa")
    if not (os.path.exists(ref_path) and os.path.exists(reads_path)
            and os.path.exists(warmup_path)):
        genome = make_genome(rng, glen)
        with open(ref_path + ".tmp", "wb") as f:
            f.write(b">bench_chr1\n")
            g = genome.tobytes()
            for i in range(0, len(g), 80):
                f.write(g[i:i + 80] + b"\n")

        # warmup reads span the same length distribution as the timed set
        # so kernel shape buckets are traced/compiled before the timed run
        with open(reads_path + ".tmp", "wb") as fr, \
                open(warmup_path + ".tmp", "wb") as fw:
            for i in range(N_READS + N_WARMUP):
                lo, hi = READ_LEN // 2, READ_LEN * 3 // 2
                if i < N_WARMUP:
                    L = lo + (hi - lo) * i // max(1, N_WARMUP - 1)
                else:
                    L = int(rng.integers(lo, hi))
                pos = int(rng.integers(0, glen - L))
                read = mutate_pacbio(rng, genome[pos:pos + L])
                if rng.random() < 0.5:
                    read = revcomp(read)
                target = fw if i < N_WARMUP else fr
                target.write(b">read_%d_%d\n" % (i, pos))
                for j in range(0, len(read), 80):
                    target.write(read[j:j + 80] + b"\n")
        del genome
        os.rename(warmup_path + ".tmp", warmup_path)
        os.rename(reads_path + ".tmp", reads_path)
        os.rename(ref_path + ".tmp", ref_path)
    return tmpdir, ref_path, reads_path, warmup_path


def cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    return [int(x) for x in parts[1:9]]


def run_scale(genome_mbp: float, profile: bool):
    """Map the read set at one genome scale; update RESULT on completion.

    Returns (prep_s, map_s) so the caller can extrapolate whether the next
    scale fits the deadline."""
    from ngmlr_tpu.config import Config
    from ngmlr_tpu.pipeline.runner import Pipeline

    t_prep0 = time.time()
    tmpdir, ref_path, reads_path, warmup_path = prepare_workdir(genome_mbp)
    cfg = Config()
    if os.environ.get("BENCH_BATCH_READS"):
        cfg.batch_reads = int(os.environ["BENCH_BATCH_READS"])

    def _mark(what):
        sys.stderr.write("bench[%g]: %s at +%.0fs\n"
                         % (genome_mbp, what, time.time() - T_START))
        sys.stderr.flush()
    _mark("workdir ready")
    pipeline = Pipeline(cfg, ref_path, use_cache=True)
    _mark("pipeline init (ref+index load)")
    if os.environ.get("BENCH_PREP_ONLY"):
        # generate workdir + encoded-ref/index caches only (run on CPU so
        # the chip-time bench pays neither generation nor index build)
        sys.stderr.write(json.dumps(
            {"metric": "bench_prep", "workdir": tmpdir}) + "\n")
        return None, None

    t_map0 = time.time()
    # Warmup policy (round 5): loading the ~50 cached executables a scale
    # touches costs ~500-800 s on this backend REGARDLESS of which pass
    # triggers it (measured: the 16-read spread-length warmup alone took
    # 700-800 s warm). So by default no separate warmup runs: the FIRST
    # timed pass absorbs the loads and best-of-3 discards it. The spread
    # warmup (extra shape coverage beyond the timed set) is opt-in for
    # cache-priming sessions via BENCH_FULL_WARMUP=1.
    if os.environ.get("BENCH_FULL_WARMUP"):
        pipeline.run(warmup_path, io.BytesIO())
        _mark("warmup pass (spread lengths)")
        pipeline.run(reads_path, io.BytesIO())
        _mark("warmup pass (timed set)")

    sampler = None
    if profile and os.environ.get("BENCH_SAMPLE"):
        sampler = _StackSampler()
        sampler.start()

    # the sandbox host shows large run-to-run CPU-steal variance; take the
    # best of two timed passes so the recorded number reflects the code,
    # not the hypervisor's mood — but report every pass in the JSON so the
    # distribution is visible
    best = None
    passes = []
    for _ in range(int(os.environ.get("BENCH_PASSES", "3"))):
        s0 = dict(pipeline.ctx.stats)
        c0 = cpu_times()
        t0 = time.time()
        stats = pipeline.run(reads_path, io.BytesIO())
        el = time.time() - t0
        c1 = cpu_times()
        s1 = dict(pipeline.ctx.stats)
        passes.append(round(el, 2))
        if best is None or el < best[0]:
            best = (el, s0, s1, stats, c0, c1)
    elapsed, s0, s1, stats, c0, c1 = best
    if os.environ.get("BENCH_VERBOSE"):
        import resource
        ru = resource.getrusage(resource.RUSAGE_SELF)
        dc = [b - a for a, b in zip(c0, c1)]
        tot = max(sum(dc), 1)
        sys.stderr.write(
            "cpu during best pass: user=%d%% sys=%d%% idle=%d%% steal=%d%% "
            "(process minflt=%d majflt=%d)\n"
            % (100 * dc[0] // tot, 100 * dc[2] // tot,
               100 * dc[3] // tot, 100 * dc[7] // tot,
               ru.ru_minflt, ru.ru_majflt))
    if sampler is not None:
        sampler.stop_and_report()
    ds = {k: v - s0.get(k, 0) for k, v in s1.items()}

    rps = N_READS / elapsed
    if os.environ.get("BENCH_VERBOSE"):
        host_s = elapsed - ds.get("score_s", 0) - ds.get("align_s", 0) \
            - ds.get("align_fetch_s", 0) - ds.get("upload_s", 0)
        sys.stderr.write("bench stats [%g Mbp]: elapsed=%.2fs %s "
                         "host_other=%.2fs\n"
                         % (genome_mbp, elapsed,
                            " ".join(f"{k}={v:.3f}" if isinstance(v, float)
                                     else f"{k}={v}"
                                     for k, v in sorted(ds.items())),
                            host_s))
    mapped_frac = stats["mapped"] / max(1, stats["reads"])
    # align wall = dispatch (pack+upload+launch) + combined-wave fetch
    # (kernel wait + D2H transfer) — align_fetch_s lives outside align_s
    # since the fetch_waves_np split
    a_s = ds.get("align_s", 0.0) + ds.get("align_fetch_s", 0.0)
    gcups_pad = (ds.get("cells_align", 0) / a_s / 1e9) if a_s else 0.0
    gcups_useful = (ds.get("cells_align_useful", 0) / a_s / 1e9) if a_s else 0.0
    host_other = elapsed - ds.get("score_s", 0) - ds.get("align_s", 0) \
        - ds.get("align_fetch_s", 0) - ds.get("upload_s", 0)
    RESULT.pop("error", None)
    RESULT.update({
        "value": round(rps, 3),
        "unit": f"reads/s ({READ_LEN}bp PacBio-like, {mapped_frac:.0%} mapped)",
        "vs_baseline": round(rps / BASELINE_RPS, 4),
        "genome_mbp": genome_mbp,
        "n_reads": N_READS,
        "pass_s": passes,
        "gcups_convex_dp": round(gcups_useful, 2),
        "gcups_convex_dp_padded": round(gcups_pad, 2),
        # stage split of the best pass (VERDICT r3 weak #4: the artifact
        # must show where the time goes without a rerun)
        "stage_split_s": {
            k: round(v, 3) for k, v in sorted(ds.items())
            if isinstance(v, float) and k.endswith("_s")},
        "stage_counts": {
            k: int(v) for k, v in sorted(ds.items())
            if not isinstance(v, float)
            and k in ("align_problems", "align_waves", "engine_waves",
                      "score_problems", "score_waves", "fire_rounds")},
        "host_other_s": round(host_other, 3),
    })
    prof_out = os.environ.get("BENCH_PROFILE_OUT")
    if prof_out and profile:
        # committable per-round profile artifact: stage split + config
        with open(prof_out, "w") as f:
            f.write(json.dumps(RESULT) + "\n")
            f.write("stage split (best pass):\n")
            for kk, vv in sorted(ds.items()):
                f.write("  %-24s %s\n"
                        % (kk, "%.3f" % vv if isinstance(vv, float) else vv))
            if sampler is not None:
                f.write("stack samples (%d total):\n" % sampler.n)
                for key, cnt in sorted(sampler.counts.items(),
                                       key=lambda kv: -kv[1])[:40]:
                    f.write("  %6.2f%% %s\n"
                            % (100.0 * cnt / max(1, sampler.n), key))
    # free the scale's big state before the next escalation (genome codes
    # on device + host, index tables)
    del pipeline
    import gc
    gc.collect()
    return t_map0 - t_prep0, time.time() - t_map0


def _min_viable_s(mbp: float) -> float:
    """Fastest observed good-mood wall for a warm pinned run at this
    scale (round-5 measurements: 1000 Mbp = 289 s, 3 Gbp = 616 s) plus
    a little margin — a slice below this cannot succeed even in the
    best mood, so don't bother starting it."""
    return 0.12 * mbp + 190.0


def _run_child(mbp: float, slice_s: float):
    """One pinned-scale attempt in a killable child process; returns its
    successful JSON line or None."""
    import subprocess
    env = dict(os.environ,
               BENCH_GENOME_MBP=str(mbp),
               BENCH_DEADLINE_S=str(max(slice_s - 8.0, 60.0)),
               BENCH_SKIP_PROBE="1")
    sys.stderr.write("bench: attempting %g Mbp (slice %.0fs)\n"
                     % (mbp, slice_s))
    sys.stderr.flush()
    p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                         stdout=subprocess.PIPE, env=env)
    try:
        out, _ = p.communicate(timeout=slice_s)
    except subprocess.TimeoutExpired:
        p.kill()
        # give the corpse a moment to actually die (one TPU process at a
        # time: the next child must not overlap it), but don't block
        # forever — a tunnel syscall can absorb SIGKILL until it returns
        for _ in range(20):
            if p.poll() is not None:
                break
            time.sleep(0.5)
        sys.stderr.write("bench: %g Mbp slice expired\n" % mbp)
        return None
    for line in reversed(out.decode(errors="replace").splitlines()):
        try:
            r = json.loads(line)
        except ValueError:
            continue
        if r.get("value", 0) > 0 and "error" not in r:
            return line
        break
    sys.stderr.write("bench: %g Mbp attempt failed\n" % mbp)
    return None


def _orchestrate(cached) -> bool:
    """Banked ladder: attempt scales ASCENDING, each as a killable child
    with a bounded slice, keeping the largest successful JSON line; the
    final (largest) rung goes all-in on the remaining budget because the
    banked line already guarantees a result. Emits the banked line and
    returns True if any rung succeeded."""
    global _emitted
    ladder = sorted(cached)
    if len(ladder) > 2:
        # tiny scales only overstate vs_baseline; climb from 300 Mbp
        # when bigger rungs exist
        ladder = [m for m in ladder if m >= 300] or ladder
    banked = None
    for i, mbp in enumerate(ladder):
        viable = _min_viable_s(mbp)
        final = (i == len(ladder) - 1)
        if final:
            slice_s = remaining_s() - 15.0
        else:
            # bounded: leave budget for the bigger rungs
            slice_s = min(remaining_s() - 15.0, viable + 150.0)
        if slice_s < viable:
            sys.stderr.write(
                "bench: skipping %g Mbp (slice %.0fs < viable %.0fs)\n"
                % (mbp, slice_s, viable))
            continue
        line = _run_child(mbp, slice_s)
        if line is not None:
            banked = line
    if banked is None:
        return False
    with _emit_lock:
        if not _emitted:
            _emitted = True
            sys.stdout.write(banked + "\n")
            sys.stdout.flush()
    return True


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    _watchdog()

    if os.environ.get("JAX_PLATFORMS"):
        # a sitecustomize on the target host latches the platform before
        # env vars are consulted — honor the user's choice explicitly
        # (same dance as cli.py)
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    elif not os.environ.get("BENCH_SKIP_PROBE") and not _probe_backend(
            int(os.environ.get("BENCH_PROBE_TIMEOUT",
                               str(int(min(240.0, DEADLINE_S * 0.3)))))):
        # healthy init takes 30-60 s; a full tunnel outage (observed
        # round 5) hangs forever — fail fast with a diagnosable line
        # instead of burning half the budget on the probe
        RESULT["error"] = ("device backend unreachable (tunnel down?) - "
                           "probe timed out")
        emit(exit_code=1)

    if os.environ.get("BENCH_GENOME_MBP"):
        scales = [float(os.environ["BENCH_GENOME_MBP"])]
    elif os.environ.get("BENCH_SCALES"):
        scales = [float(x)
                  for x in os.environ["BENCH_SCALES"].split(",")]
    else:
        scales = list(SCALES_MBP)

    # Warm machine (prep artifacts on disk, e.g. from scripts/bench_prep.py
    # or a previous run): attempt scales LARGEST-first, each in its own
    # KILLABLE subprocess with a time slice that always reserves enough
    # budget for the next smaller scale. Measured round 5: a warm run's
    # wall cost swings 290-850 s at the SAME scale with the same caches
    # (backend/tunnel mood phases), so a single non-preemptible attempt
    # randomly eats the whole budget — the slice architecture turns a
    # bad-mood big attempt into a fallback instead of an error line.
    # Cold machine: ascending progressive escalation with extrapolation.
    cached = sorted((m for m in scales if cache_ready(m)), reverse=True)
    if cached and not os.environ.get("BENCH_GENOME_MBP") \
            and _orchestrate(cached):
        return

    prev = None   # (mbp, prep_s, map_s)
    try:
        _scale_loop(scales, prev)
    except BaseException as e:   # the one JSON line must land regardless
        import traceback
        traceback.print_exc()
        RESULT.setdefault("error", "crashed: %r" % (e,))
        emit(exit_code=1)
    emit(exit_code=None)


def _scale_loop(scales, prev):
    for i, mbp in enumerate(scales):
        if prev is not None:
            # extrapolate: prep (genome gen + index build) scales ~linearly
            # with genome size; mapping time grows mildly (candidate
            # search). 1.4x margin on prep, 2x on map.
            p_mbp, p_prep, p_map = prev
            est = p_prep * (mbp / p_mbp) * 1.4 + p_map * 2.0
            if remaining_s() < est + 15.0:
                sys.stderr.write(
                    "bench: stopping at %g Mbp (next scale %g Mbp needs "
                    "~%.0fs, %.0fs left)\n" % (p_mbp, mbp, est, remaining_s()))
                break
        last = (i == len(scales) - 1)
        prep_s, map_s = run_scale(mbp, profile=last)
        if prep_s is None:   # BENCH_PREP_ONLY
            RESULT.pop("error", None)
            RESULT.update({"value": 0.0, "unit": "prep-only"})
            break
        prev = (mbp, prep_s, map_s)
    emit(exit_code=None)


if __name__ == "__main__":
    main()
