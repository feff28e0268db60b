"""End-to-end golden tests: byte-identical SAM vs the reference binary.

The golden files in tests/golden/ were produced by the reference ngmlr
binary (t=1). Only the @PG line (program name/version/command line) is
excluded from comparison.

test_2 is the fast end-to-end workload (20 kb reference, 12 reads of
100-2200 bp). The larger datasets (tests 1, 4, 5, 6) are exercised by
scripts/check_goldens.sh — they are byte-identical too but take minutes on
the CPU backend.
"""

import io
import os

import pytest

from ngmlr_tpu.cli import build_parser, config_from_args
from ngmlr_tpu.pipeline.runner import Pipeline

from conftest import DATA_DIR, GOLDEN_DIR


def _run(argv):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args, argv)
    pipeline = Pipeline(cfg, args.reference, use_cache=True)
    buf = io.BytesIO()
    pipeline.run(args.query, buf)
    return buf.getvalue()


def _records(sam_bytes):
    return [l for l in sam_bytes.split(b"\n") if not l.startswith(b"@PG")]


@pytest.mark.parametrize("preset,golden", [("pacbio", "test_2.sam"),
                                           ("ont", "test_2_ont.sam")])
def test_golden_test2(preset, golden):
    out = _run(["-r", os.path.join(DATA_DIR, "test_2/ref_chr21_20kb.fa"),
                "-q", os.path.join(DATA_DIR, "test_2/reads_100_2200bp.fa"),
                "-x", preset])
    want = open(os.path.join(GOLDEN_DIR, golden), "rb").read()
    assert _records(out) == _records(want)


def test_batch_size_invariance():
    """SAM output must be byte-identical for any batch_reads: the intake
    batch is a throughput knob (wave-round amortization over the device
    tunnel), never a semantic one. Emission order is per 10-read intake
    group (NGM.cpp:190-246) independent of batching."""
    argv = ["-r", os.path.join(DATA_DIR, "test_2/ref_chr21_20kb.fa"),
            "-q", os.path.join(DATA_DIR, "test_2/reads_100_2200bp.fa")]

    def run(batch_reads):
        args = build_parser().parse_args(argv)
        cfg = config_from_args(args, argv)
        cfg.batch_reads = batch_reads
        pipeline = Pipeline(cfg, args.reference, use_cache=True)
        buf = io.BytesIO()
        pipeline.run(args.query, buf)
        return _records(buf.getvalue())

    base = run(192)          # default: all 12 reads in one batch
    assert run(5) == base    # batch smaller than an intake group
    assert run(1024) == base


def test_shard_merge_matches_full_run(tmp_path):
    """--shard I/N + scripts/merge_sams.py reproduces the unsharded SAM
    (multi-host data parallelism over reads, SURVEY §2.11)."""
    import subprocess, sys, os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref = os.path.join(DATA_DIR, "test_6", "reference.fasta.gz")
    qry = os.path.join(DATA_DIR, "test_6", "read.fa.gz")
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    def run(extra, out):
        subprocess.run([sys.executable, "-m", "ngmlr_tpu.cli", "-r", ref,
                        "-q", qry, "-o", str(out)] + extra,
                       check=True, cwd=repo, env=env,
                       stderr=subprocess.DEVNULL)

    run([], tmp_path / "full.sam")
    run(["--shard", "0/2"], tmp_path / "s0.sam")
    run(["--shard", "1/2"], tmp_path / "s1.sam")
    subprocess.run([sys.executable, "scripts/merge_sams.py",
                    str(tmp_path / "merged.sam"),
                    str(tmp_path / "s0.sam"), str(tmp_path / "s1.sam")],
                   check=True, cwd=repo)

    def body(p):
        return [l for l in open(p, "rb").read().splitlines()
                if not l.startswith(b"@PG")]

    assert body(tmp_path / "full.sam") == body(tmp_path / "merged.sam")


def test_long_read_with_sv(tmp_path):
    """A 30 kb read spanning a 2 kb deletion and an inverted segment maps
    with consistent CIGARs (sum of M/I/S == read length — the reference's
    own validity invariant, ConvexAlignFast.cpp:424-428)."""
    import re
    import numpy as np
    import subprocess, sys, os
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.choice(bases, size=60_000).tobytes()
    comp = bytes.maketrans(b"ACGT", b"TGCA")

    # read: [5k..10k] + (deletion of 1.5k) + [11.5k..16k] + inverted [16k..18k]
    part1 = genome[5_000:10_000]
    part2 = genome[11_500:16_000]
    part3 = genome[16_000:18_000].translate(comp)[::-1]
    read = part1 + part2 + part3

    ref_p = tmp_path / "ref.fa"
    with open(ref_p, "wb") as f:
        f.write(b">chrL\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i:i + 80] + b"\n")
    q_p = tmp_path / "r.fa"
    with open(q_p, "wb") as f:
        f.write(b">longsv\n")
        for i in range(0, len(read), 80):
            f.write(read[i:i + 80] + b"\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "ngmlr_tpu.cli", "-r", str(ref_p),
         "-q", str(q_p)],
        check=True, cwd=repo, capture_output=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    records = [l.split("\t") for l in out.stdout.decode().splitlines()
               if not l.startswith("@")]
    assert records, "read did not map"
    mapped = [r for r in records if not (int(r[1]) & 0x4)]
    assert mapped, "no mapped records"
    for r in mapped:
        consumed = sum(int(n) for n, op in
                       re.findall(r"(\d+)([MIS=X])", r[5]))
        assert consumed == len(read), r[5][:80]
    # at least one reverse-strand record for the inverted tail
    assert any(int(r[1]) & 0x10 for r in mapped)
    # primary covers the bulk of the read
    primaries = [r for r in mapped if not (int(r[1]) & 0x800)]
    assert len(primaries) == 1


def test_serial_mode_matches_pipelined_across_batches(tmp_path, monkeypatch):
    """Regression: the serial execution path (--stdout debug modes /
    NGMLR_TPU_SYNC) must bind each batch's OWN read buffer. It used to
    bind ctx.readbuf, which the pipelined prep thread overwrites when it
    uploads batch N+1 mid-batch — every batch-1+ read scored against the
    wrong read bytes and came out unmapped (advisor repro: 58/250 mapped).
    Forcing tiny intake batches makes the overlap happen on test_2."""
    argv = ["-r", os.path.join(DATA_DIR, "test_2/ref_chr21_20kb.fa"),
            "-q", os.path.join(DATA_DIR, "test_2/reads_100_2200bp.fa")]
    args = build_parser().parse_args(argv)

    def run(sync):
        if sync:
            monkeypatch.setenv("NGMLR_TPU_SYNC", "1")
        else:
            monkeypatch.delenv("NGMLR_TPU_SYNC", raising=False)
        cfg = config_from_args(args, argv)
        cfg.batch_reads = 4          # 12 reads -> 3 batches, prep overlaps
        pipeline = Pipeline(cfg, args.reference, use_cache=True)
        buf = io.BytesIO()
        pipeline.run(args.query, buf)
        return buf.getvalue()

    assert _records(run(sync=True)) == _records(run(sync=False))


def test_cli_invalid_shard_is_friendly():
    """Malformed --shard values exit 1 with a message, not a traceback
    (advisor finding: '--shard 1' / '0/two' raised ValueError)."""
    import subprocess, sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for bad in ["1", "0/two", "1/2/3", "/"]:
        r = subprocess.run(
            [sys.executable, "-m", "ngmlr_tpu.cli", "-r", "x.fa",
             "-q", "y.fa", "--shard", bad],
            cwd=repo, capture_output=True,
            env=dict(os.environ, JAX_PLATFORMS="cpu"))
        assert r.returncode == 1, (bad, r.returncode)
        assert b"Invalid --shard" in r.stderr, (bad, r.stderr)
