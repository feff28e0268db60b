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
