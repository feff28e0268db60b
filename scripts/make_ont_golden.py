"""Generate the committed ont-preset SV-rich golden dataset (test_7).

Reuses the fuzz generator (scripts/fuzz_vs_reference.py make_dataset: short /
clean / noisy / deletion-spanning / inversion / translocation / junk /
N-gap-spanning reads over a 2-chromosome 500 kb genome) with a PINNED seed,
maps it with the reference binary under `-x ont -t 1`, and commits dataset +
golden so ont-preset regressions are caught by scripts/check_goldens.sh
without needing the reference binary (VERDICT r2 item 9; preset semantics:
/root/reference/src/ArgParser.cpp:256-269).

QUAL (field 10) is rewritten to `*` in the golden: for FASTA input the
reference prints reversed heap garbage there on reverse-strand records and
everything after (docs/DIVERGENCES.md #1); ngmlr_tpu prints `*` per the SAM
spec, so the sanitized golden byte-compares against our raw output.

Usage: python scripts/make_ont_golden.py <reference_binary> [seed]
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzz_vs_reference import make_dataset  # noqa: E402

SEED = 77
N_READS = 120


def main():
    binary = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else SEED
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(root, "tests", "data", "test_7")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(seed)
    ref, reads = make_dataset(rng, data, N_READS)

    # The reference binary segfaults on these SV-rich files as a whole (it
    # does on test_3 too), so the golden is per-read (test_3 methodology):
    # map each read individually, record the ones that crash the reference
    # either way, keep the per-read records of the survivors.
    out = os.path.join(data, "ref_out_raw.sam")
    chunks = open(reads, "rb").read().split(b">")
    crashed = []
    recs = []
    one = os.path.join(data, "one.fa")
    for chunk in chunks:
        if not chunk.strip():
            continue
        name = chunk.split(b"\n", 1)[0].split()[0]
        with open(one, "wb") as f:
            f.write(b">" + chunk)
        r = subprocess.run([binary, "-r", ref, "-q", one, "-o", out,
                            "-t", "1", "-x", "ont", "--skip-write"],
                           capture_output=True, timeout=600)
        if r.returncode != 0:
            crashed.append(name)
            continue
        with open(out, "rb") as fi:
            for line in fi:
                if line.startswith(b"@"):
                    continue
                f2 = line.rstrip(b"\n").split(b"\t")
                if len(f2) > 10:
                    f2[10] = b"*"
                recs.append(b"\t".join(f2) + b"\n")
    os.remove(one)
    if os.path.exists(out):
        os.remove(out)
    print("%d reads crashed the reference" % len(crashed))

    golden = os.path.join(root, "tests", "golden", "test_7_ont_sv.sam")
    with open(golden, "wb") as fo:
        fo.writelines(recs)
    with open(os.path.join(root, "tests", "golden",
                           "test_7_reference_crashes.txt"), "wb") as fo:
        fo.write(b"\n".join(crashed) + (b"\n" if crashed else b""))
    for leftover in ("ref.fa.ngm", "ref.fa-enc.ngm",
                     "ref.fa-ht-13-2.3.ngm"):
        p = os.path.join(data, leftover)
        if os.path.exists(p):
            os.remove(p)
    print("wrote", golden)
    return 0


if __name__ == "__main__":
    sys.exit(main())
