"""Native (C++) per-read assembly engine vs the Python oracle.

The engine (native/engine.cpp, driven by pipeline/native_engine.py) is the
default long-read path; pipeline/longread.py is the oracle. These tests pin
byte-identical SAM output between the two on a coordinate-stress dataset
(test_2) and an SV-rich one (test_3 subset: inversions/translocations drive
detect_misalignment → checkForSV → realign through the engine).
"""

import io
import os

import pytest

from conftest import DATA_DIR


def _run(argv, native: bool) -> bytes:
    from ngmlr_tpu.cli import build_parser, config_from_args
    from ngmlr_tpu.pipeline.runner import Pipeline

    old = os.environ.get("NGMLR_TPU_NATIVE")
    os.environ["NGMLR_TPU_NATIVE"] = "1" if native else "0"
    try:
        args = build_parser().parse_args(argv)
        cfg = config_from_args(args, argv)
        pipeline = Pipeline(cfg, args.reference, use_cache=True)
        if native:
            assert pipeline.native is not None, "engine failed to load"
        buf = io.BytesIO()
        pipeline.run(args.query, buf)
        if native:
            assert pipeline.ctx.stats.get("native_failed", 0) == 0
        return b"\n".join(l for l in buf.getvalue().split(b"\n")
                          if not l.startswith(b"@PG"))
    finally:
        if old is None:
            os.environ.pop("NGMLR_TPU_NATIVE", None)
        else:
            os.environ["NGMLR_TPU_NATIVE"] = old


def test_native_engine_matches_python_test2():
    argv = ["-r", os.path.join(DATA_DIR, "test_2/ref_chr21_20kb.fa"),
            "-q", os.path.join(DATA_DIR, "test_2/reads_100_2200bp.fa")]
    assert _run(argv, native=True) == _run(argv, native=False)


def test_native_engine_driver_failure_falls_back(capsys):
    """A driver-level failure mid-batch (device error, tunnel drop) must
    abort the engine batch cleanly — every read falls back to the Python
    path and output stays byte-identical (reference semantics: log and
    keep going, NGM.cpp:262-265). Regression for the joinable-thread
    std::terminate hazard."""
    import io
    from ngmlr_tpu.cli import build_parser, config_from_args
    from ngmlr_tpu.pipeline.runner import Pipeline

    argv = ["-r", os.path.join(DATA_DIR, "test_2/ref_chr21_20kb.fa"),
            "-q", os.path.join(DATA_DIR, "test_2/reads_100_2200bp.fa")]

    def run(sabotage):
        args = build_parser().parse_args(argv)
        cfg = config_from_args(args, argv)
        p = Pipeline(cfg, args.reference, use_cache=True)
        assert p.native is not None
        if sabotage:
            orig = p.ctx.align_dispatch_pk
            state = {"n": 0}

            def boom(*a, **kw):
                state["n"] += 1
                if state["n"] == 1:
                    raise RuntimeError("injected driver failure")
                return orig(*a, **kw)

            p.ctx.align_dispatch_pk = boom
        buf = io.BytesIO()
        p.run(args.query, buf)
        return buf.getvalue(), p.ctx.stats.get("native_failed", 0)

    good, f0 = run(False)
    bad, f1 = run(True)
    assert f0 == 0 and f1 > 0
    assert good == bad


def test_native_engine_matches_python_short_reads(tmp_path):
    """Short reads (<= read_part_length) ride the same engine batch via
    process_short_read (engine.cpp) — pin byte-identity vs the Python
    pipeline/shortread.py oracle on a short-read-heavy random set."""
    import numpy as np
    from ngmlr_tpu.io.fastx import parse_fastx

    ref_p = os.path.join(DATA_DIR, "test_2/ref_chr21_20kb.fa")
    recs = list(parse_fastx(ref_p))
    g = b"".join(r.seq for r in recs)
    rng = np.random.default_rng(42)
    comp = bytes.maketrans(b"ACGTacgt", b"TGCATGCA")
    reads_p = str(tmp_path / "shorts.fa")
    with open(reads_p, "wb") as f:
        for i in range(40):
            L = int(rng.integers(40, 257))
            p = int(rng.integers(0, len(g) - L))
            seq = g[p:p + L]
            if rng.random() < 0.3:   # a few substitutions
                a = bytearray(seq)
                for _ in range(int(rng.integers(1, 6))):
                    a[int(rng.integers(0, L))] = b"ACGT"[int(rng.integers(0, 4))]
                seq = bytes(a)
            if rng.random() < 0.5:
                seq = seq.translate(comp)[::-1]
            f.write(b">s%d\n" % i + seq + b"\n")
    argv = ["-r", ref_p, "-q", reads_p]
    assert _run(argv, native=True) == _run(argv, native=False)


def test_native_engine_matches_python_sv(tmp_path):
    """First 12 reads of test_3 (the SV determinism dataset): long noisy
    reads whose split/realign paths go through the engine's corun waves."""
    import gzip
    from ngmlr_tpu.io.fastx import parse_fastx

    src = os.path.join(DATA_DIR, "test_3/read.fa.gz")
    reads_p = str(tmp_path / "sv12.fa")
    with open(reads_p, "wb") as f:
        for i, rec in enumerate(parse_fastx(src)):
            if i >= 12:
                break
            f.write(b">" + rec.name + b"\n" + rec.seq + b"\n")
    argv = ["-r", os.path.join(DATA_DIR, "test_3/reference.fasta.gz"),
            "-q", reads_p]
    assert _run(argv, native=True) == _run(argv, native=False)
