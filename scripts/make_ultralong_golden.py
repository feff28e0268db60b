"""Generate the committed ultra-long-read golden dataset (test_8).

The SV suite (test_7) tops out ~10 kb reads; the reference's real use is
10 kb-1 Mb (ReadProvider.cpp:28-29 assumes <= 1 MB). This dataset pins
corridor estimation/retry (AlignmentBuffer.cpp:292-425), segment
merge/split and realign (:1551) at 50-250 kb read scale: clean/noisy
ultra-long reads plus deletion-, insertion-, inversion-, duplication-,
translocation- and N-gap-bearing ones over a 3 Mb two-chromosome genome.

Methodology = test_3/test_7: the golden is PER-READ (the reference binary
is run once per read with -t 1, default pacbio preset); reads that crash
it are recorded and excluded. QUAL is rewritten to '*' (FASTA input makes
the reference print reversed heap garbage there for reverse-strand
records — docs/DIVERGENCES.md #1).

Usage: python scripts/make_ultralong_golden.py <reference_binary> [seed]
"""

import os
import subprocess
import sys

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
SEED = 4242


def revcomp(s: bytes) -> bytes:
    return s.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]


def pacbio_noise(rng, seq: bytes, err: float = 0.10) -> bytes:
    """~err error rate: 2/3 insertions, 4/15 deletions, 1/15 subs."""
    a = np.frombuffer(seq, dtype=np.uint8)
    n = len(a)
    r = rng.random(n)
    ins = r < err * (2 / 3)
    dele = (r >= err * (2 / 3)) & (r < err * (2 / 3) + err * (4 / 15))
    sub = (r >= err * (14 / 15)) & (r < err)
    rand_ins = BASES[rng.integers(0, 4, n)]
    rand_sub = BASES[rng.integers(0, 4, n)]
    counts = np.where(dele, 0, 1 + ins.astype(np.int64))
    ends = np.cumsum(counts)
    out = np.empty(int(ends[-1]) if n else 0, dtype=np.uint8)
    keep = ~dele
    out[ends[keep] - 1] = np.where(sub, rand_sub, a)[keep]
    ins_k = ins & keep
    out[ends[ins_k] - 2] = rand_ins[ins_k]
    return out.tobytes()


def make_dataset(rng, workdir):
    glen = 3_000_000
    split = 2_000_000
    g = BASES[rng.integers(0, 4, size=glen)]
    g[1_500_000:1_501_500] = ord("N")        # N gap inside chr1
    ref = os.path.join(workdir, "ref.fa")
    with open(ref, "wb") as f:
        for name, lo, hi in ((b">ulchr1", 0, split),
                             (b">ulchr2", split, glen)):
            f.write(name + b"\n")
            gb = g[lo:hi].tobytes()
            for i in range(0, len(gb), 70):
                f.write(gb[i:i + 70] + b"\n")

    def frag(p, L):
        return g[p:p + L].tobytes()

    reads = []
    # 1-2: clean ultra-long
    reads.append(("ul_clean_60k", frag(50_000, 60_000)))
    reads.append(("ul_clean_250k", frag(200_000, 250_000)))
    # 3-5: noisy ultra-long (the bread-and-butter case)
    reads.append(("ul_noisy_50k", pacbio_noise(rng, frag(600_000, 50_000))))
    reads.append(("ul_noisy_100k",
                  pacbio_noise(rng, frag(700_000, 100_000))))
    reads.append(("ul_noisy_150k_rev",
                  revcomp(pacbio_noise(rng, frag(900_000, 150_000), 0.12))))
    # 6: deletion-spanning (two 40 kb fragments, 30 kb genomic gap)
    reads.append(("ul_del_30k", pacbio_noise(
        rng, frag(1_050_000, 40_000) + frag(1_120_000, 40_000), 0.05)))
    # 7: insertion (10 kb novel sequence inside 80 kb)
    nov = BASES[rng.integers(0, 4, 10_000)].tobytes()
    reads.append(("ul_ins_10k", pacbio_noise(
        rng, frag(1_200_000, 40_000) + nov + frag(1_240_000, 40_000), 0.05)))
    # 8: large inversion (8 kb revcomp mid inside ~128 kb)
    reads.append(("ul_inv_8k", pacbio_noise(
        rng, frag(100_000, 60_000)
        + revcomp(frag(160_000, 8_000))
        + frag(168_000, 60_000), 0.05)))
    # 9: small inversion (400 bp — the nmPerPosition peak detector's case)
    reads.append(("ul_smallinv_400", pacbio_noise(
        rng, frag(300_000, 25_000)
        + revcomp(frag(325_000, 400))
        + frag(325_400, 25_000), 0.04)))
    # 10: tandem duplication (6 kb segment repeated)
    reads.append(("ul_dup_6k", pacbio_noise(
        rng, frag(420_000, 30_000) + frag(444_000, 6_000)
        + frag(444_000, 36_000), 0.05)))
    # 11: translocation across chromosomes (60 kb + 60 kb)
    reads.append(("ul_tloc", pacbio_noise(
        rng, frag(500_000, 60_000) + frag(2_300_000, 60_000), 0.06)))
    # 12: N-gap spanning
    reads.append(("ul_ngap", pacbio_noise(rng, frag(1_460_000, 80_000),
                                          0.05)))
    # 13: chr-border spanning (start of chr2)
    reads.append(("ul_chr2_70k", pacbio_noise(rng, frag(2_000_000, 70_000),
                                              0.08)))

    reads_path = os.path.join(workdir, "reads.fa")
    with open(reads_path, "wb") as f:
        for name, seq in reads:
            f.write(b">" + name.encode() + b"\n")
            for i in range(0, len(seq), 70):
                f.write(seq[i:i + 70] + b"\n")
    return ref, reads_path


def main():
    binary = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else SEED
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = os.path.join(root, "tests", "data", "test_8")
    os.makedirs(data, exist_ok=True)
    rng = np.random.default_rng(seed)
    ref, reads = make_dataset(rng, data)

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
                            "-t", "1", "--skip-write"],
                           capture_output=True, timeout=3600)
        if r.returncode != 0:
            crashed.append(name)
            print("crash:", name.decode())
            continue
        n = 0
        with open(out, "rb") as fi:
            for line in fi:
                if line.startswith(b"@"):
                    continue
                f2 = line.rstrip(b"\n").split(b"\t")
                if len(f2) > 10:
                    f2[10] = b"*"
                recs.append(b"\t".join(f2) + b"\n")
                n += 1
        print("ok:", name.decode(), n, "records")
    os.remove(one)
    if os.path.exists(out):
        os.remove(out)
    print("%d reads crashed the reference" % len(crashed))

    golden = os.path.join(root, "tests", "golden", "test_8_ultralong.sam")
    with open(golden, "wb") as fo:
        fo.writelines(recs)
    with open(os.path.join(root, "tests", "golden",
                           "test_8_reference_crashes.txt"), "wb") as fo:
        fo.write(b"\n".join(crashed) + (b"\n" if crashed else b""))
    for leftover in os.listdir(data):
        if leftover.endswith(".ngm"):
            os.remove(os.path.join(data, leftover))
    print("wrote", golden)
    return 0


if __name__ == "__main__":
    sys.exit(main())
