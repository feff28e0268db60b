"""Byte-identity fuzz: generate a fresh random dataset (SV-rich), map it
with the reference binary AND ngmlr_tpu, and diff the SAM records.

Extends the committed golden suite (7 fixed datasets) with arbitrarily
many randomized ones. Known reference quirks handled like the goldens:
@PG differs by construction; QUAL on reverse-strand FASTA records is
reference heap garbage (docs/DIVERGENCES.md) so field 10 is blanked on
0x10 records; reads the reference binary segfaults on are mapped
per-read and skipped when it crashes either way (test_3 methodology).

Usage: python scripts/fuzz_vs_reference.py <ref_binary> [seed] [n_reads] [preset]
preset: pacbio (default) or ont (-x ont: different gap-decay default)
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def revcomp(s: bytes) -> bytes:
    return s.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]


def pacbio_noise(rng, seq: bytes, err=0.15) -> bytes:
    a = np.frombuffer(seq, dtype=np.uint8)
    r = rng.random(len(a))
    out = []
    rb = BASES[rng.integers(0, 4, size=len(a) + 16)]
    ri = 0
    for i, c in enumerate(a):
        x = r[i]
        if x < err * 4 / 15:          # del
            continue
        if x < err * 14 / 15:         # ins
            out.append(rb[ri]); ri += 1
            out.append(c)
        elif x < err:                 # sub
            out.append(rb[ri]); ri += 1
        else:
            out.append(c)
    return bytes(bytearray(out))


def make_dataset(rng, workdir, n_reads):
    glen = 500_000
    g = BASES[rng.integers(0, 4, size=glen)]
    # one N gap
    g[200_000:201_000] = ord("N")
    ref = os.path.join(workdir, "ref.fa")
    with open(ref, "wb") as f:
        f.write(b">fzchr1\n")
        gb = g[:400_000].tobytes()
        for i in range(0, len(gb), 70):
            f.write(gb[i:i + 70] + b"\n")
        f.write(b">fzchr2\n")
        gb = g[400_000:].tobytes()
        for i in range(0, len(gb), 70):
            f.write(gb[i:i + 70] + b"\n")

    reads = os.path.join(workdir, "reads.fa")
    with open(reads, "wb") as f:
        for i in range(n_reads):
            kind = rng.integers(0, 8)
            if kind == 0:        # short read
                L = int(rng.integers(40, 256))
                p = int(rng.integers(0, glen - L))
                seq = g[p:p + L].tobytes()
            elif kind == 1:      # clean long
                L = int(rng.integers(1000, 8000))
                p = int(rng.integers(0, glen - L))
                seq = g[p:p + L].tobytes()
            elif kind == 2:      # noisy long
                L = int(rng.integers(1000, 8000))
                p = int(rng.integers(0, glen - L))
                seq = pacbio_noise(rng, g[p:p + L].tobytes())
            elif kind == 3:      # deletion-spanning (two fragments, gap)
                L = int(rng.integers(800, 3000))
                p = int(rng.integers(0, glen - 2 * L - 20_000))
                gap = int(rng.integers(200, 15_000))
                seq = (g[p:p + L].tobytes()
                       + g[p + L + gap:p + 2 * L + gap].tobytes())
                seq = pacbio_noise(rng, seq, 0.08)
            elif kind == 4:      # inversion in the middle
                L = int(rng.integers(900, 3000))
                p = int(rng.integers(0, glen - 3 * L - 3))
                mid = revcomp(g[p + L:p + 2 * L].tobytes())
                seq = (g[p:p + L].tobytes() + mid
                       + g[p + 2 * L:p + 3 * L].tobytes())
                seq = pacbio_noise(rng, seq, 0.05)
            elif kind == 5:      # translocation across chromosomes
                L = int(rng.integers(800, 2500))
                p1 = int(rng.integers(0, 390_000 - L))
                p2 = int(rng.integers(405_000, glen - L))
                seq = g[p1:p1 + L].tobytes() + g[p2:p2 + L].tobytes()
                seq = pacbio_noise(rng, seq, 0.08)
            elif kind == 6:      # unmappable / junk
                L = int(rng.integers(100, 2000))
                seq = BASES[rng.integers(0, 4, size=L)].tobytes()
            else:                # N-gap spanning
                L = int(rng.integers(1500, 4000))
                p = int(rng.integers(198_000, 199_500))
                seq = g[p:p + L].tobytes()
            if rng.random() < 0.5:
                seq = revcomp(seq)
            if len(seq) == 0:
                seq = b"A"
            f.write(b">fz%d\n" % i)
            for j in range(0, len(seq), 70):
                f.write(seq[j:j + 70] + b"\n")
    return ref, reads


def norm_records(sam_bytes):
    """SAM records normalized: no @PG, field 10 (QUAL) blanked on every
    record — inputs here are FASTA, where the reference emits heap
    garbage QUAL not just on reverse-strand records but on any record
    following one (its in-place qual-buffer reversal clobbers the
    buffer; docs/DIVERGENCES.md). ngmlr_tpu emits '*' per the SAM spec."""
    out = {}
    for line in sam_bytes.splitlines():
        if line.startswith(b"@"):
            continue
        f = line.split(b"\t")
        if len(f) > 10:
            f[10] = b"*"
        out.setdefault(f[0], []).append(b"\t".join(f))
    return out


def run_ref(binary, ref, reads, workdir, timeout=600, preset="pacbio"):
    o = os.path.join(workdir, "ref_out.sam")
    r = subprocess.run([binary, "-r", ref, "-q", reads, "-o", o, "-t", "1",
                        "-x", preset, "--skip-write"],
                       capture_output=True, timeout=timeout)
    return r.returncode, open(o, "rb").read() if os.path.exists(o) else b""


def main():
    binary = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_reads = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    preset = sys.argv[4] if len(sys.argv) > 4 else "pacbio"
    rng = np.random.default_rng(seed)
    workdir = tempfile.mkdtemp(prefix="ngmlr_fuzz_")
    ref, reads = make_dataset(rng, workdir, n_reads)

    rc, ref_sam = run_ref(binary, ref, reads, workdir, preset=preset)
    crashed = set()
    if rc != 0:
        # reference segfaulted on the whole file: map per read (test_3
        # methodology) and skip reads that crash it
        sys.stderr.write("reference rc=%d on whole file; per-read mode\n" % rc)
        recs = []
        data = open(reads, "rb").read().split(b">")
        for chunk in data:
            if not chunk.strip():
                continue
            name = chunk.split(b"\n", 1)[0].split()[0]
            one = os.path.join(workdir, "one.fa")
            with open(one, "wb") as f:
                f.write(b">" + chunk)
            rc1, sam1 = run_ref(binary, ref, one, workdir, preset=preset)
            if rc1 != 0:
                crashed.add(name)
            else:
                recs.append(b"\n".join(
                    l for l in sam1.splitlines() if not l.startswith(b"@")))
        ref_sam = b"\n".join(recs) + b"\n"

    my = os.path.join(workdir, "my_out.sam")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "ngmlr_tpu", "-r", ref, "-q", reads,
         "-o", my, "-t", "1", "-x", preset, "--skip-write", "--no-progress"],
        capture_output=True, timeout=7200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if r.returncode != 0:
        sys.stderr.write(r.stderr.decode()[-2000:])
        print("FAIL: ngmlr_tpu rc=%d" % r.returncode)
        return 1

    a = norm_records(ref_sam)
    b = norm_records(open(my, "rb").read())
    n_match = n_diff = 0
    for name in sorted(set(a) | set(b), key=lambda x: int(x[2:])):
        if name in crashed:
            continue
        if a.get(name) == b.get(name):
            n_match += 1
        else:
            n_diff += 1
            if n_diff <= 5:
                print("DIFF %s" % name.decode())
                for l in (a.get(name) or [b"<missing in reference>"]):
                    print("  ref: %s" % l[:160].decode(errors="replace"))
                for l in (b.get(name) or [b"<missing in ngmlr_tpu>"]):
                    print("  tpu: %s" % l[:160].decode(errors="replace"))
    print("seed=%d preset=%s reads=%d identical=%d diff=%d ref_crashed=%d (%s)"
          % (seed, preset, n_reads, n_match, n_diff, len(crashed), workdir))
    return 0 if n_diff == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
