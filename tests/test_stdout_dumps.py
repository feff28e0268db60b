"""Golden tests for the --stdout debug dump modes.

The goldens under tests/golden/dumps/ are the reference binary's own
stdout (ngmlr -t 1 --stdout N); all seven modes are committed and were
verified byte-identical against it on test_2 and/or test_4 (modes 2/4/6
exercised by test_4's real SV reads; 3/5 pinned on both datasets in
round 5). CI re-checks a representative subset — the cheap modes — since
each mode is a full mapping run.
"""

import gzip
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DUMPS = os.path.join(HERE, "golden", "dumps")


def _run_dump(ref, qry, mode):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "ngmlr_tpu.cli", "-r", ref, "-q", qry,
         "-x", "pacbio", "--stdout", str(mode), "-o", os.devnull],
        capture_output=True, env=env, cwd=REPO, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


@pytest.mark.parametrize("dataset,mode", [
    ("test_2", 1),    # dot plot: anchors + cLIS + segments + results
    ("test_2", 5),    # mapped segments
    ("test_4", 4),    # inversion-candidate FASTA (real SV reads)
    ("test_4", 3),    # error profile (nm-per-position windows)
])
def test_stdout_dump_matches_reference(dataset, mode):
    if dataset == "test_2":
        ref = os.path.join(HERE, "data", "test_2", "ref_chr21_20kb.fa")
        qry = os.path.join(HERE, "data", "test_2", "reads_100_2200bp.fa")
    else:
        ref = os.path.join(HERE, "data", "test_4", "reference.fasta.gz")
        qry = os.path.join(HERE, "data", "test_4", "read.fa.gz")
    golden = os.path.join(DUMPS, f"{dataset}_stdout{mode}.txt.gz")
    with gzip.open(golden, "rb") as f:
        expected = f.read()
    assert _run_dump(ref, qry, mode) == expected
