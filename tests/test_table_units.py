"""TableUnit analog (>4.29 Gbp genomes, DIVERGENCES #5): unit-local
descriptors + per-unit device genome planes + unit-major host search.

Real multi-unit genomes need > 2^32 bases; CI exercises the identical
machinery by shrinking the unit slab to 2^22 (NGMLR_TPU_UNIT_SLAB_BITS),
so a 10 Mbp genome spans 3 units. The full pipeline (CPU backend) must
produce byte-identical SAM to the single-unit run on the same data —
unit addressing is a pure re-encoding of the same coordinates.

The reference's machinery this mirrors: PrefixTable.h:58-75 (TableUnit
array), PrefixTable.cpp:476-532 (unit-major RefEntry chain),
SequenceProvider.cpp:299-319 (coordinate capacity).
"""

import io
import os

import numpy as np
import pytest

from ngmlr_tpu.config import Config


def _write_fasta(path, rng, n_per_chrom, n_chroms):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    chroms = []
    with open(path, "wb") as f:
        for c in range(n_chroms):
            seq = bases[rng.integers(0, 4, size=n_per_chrom)]
            chroms.append(seq)
            f.write(b">chr%d\n" % (c + 1))
            g = seq.tobytes()
            for i in range(0, len(g), 80):
                f.write(g[i:i + 80] + b"\n")
    return chroms


def _make_reads(path, rng, chroms, n_reads):
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    with open(path, "wb") as f:
        for i in range(n_reads):
            c = int(rng.integers(0, len(chroms)))
            L = int(rng.integers(400, 2000))
            pos = int(rng.integers(0, len(chroms[c]) - L))
            s = bytearray(chroms[c][pos:pos + L].tobytes())
            for _ in range(L // 20):           # ~5% substitutions
                s[int(rng.integers(0, L))] = b"ACGT"[int(rng.integers(0, 4))]
            s = bytes(s)
            if rng.random() < 0.5:
                s = s.translate(comp)[::-1]
            f.write(b">r%d_c%d_%d\n%s\n" % (i, c, pos, s))


def _map(ref_path, reads_path, monkeypatch, slab_bits):
    from ngmlr_tpu.pipeline.runner import Pipeline
    if slab_bits:
        monkeypatch.setenv("NGMLR_TPU_UNIT_SLAB_BITS", str(slab_bits))
    else:
        monkeypatch.delenv("NGMLR_TPU_UNIT_SLAB_BITS", raising=False)
    cfg = Config()
    pipe = Pipeline(cfg, ref_path, use_cache=False)
    out = io.BytesIO()
    stats = pipe.run(reads_path, out)
    sam = b"\n".join(ln for ln in out.getvalue().split(b"\n")
                     if not ln.startswith(b"@PG"))
    return sam, stats, pipe


def test_multi_unit_pipeline_byte_identical(tmp_path, monkeypatch):
    rng = np.random.default_rng(31)
    ref_path = str(tmp_path / "multi.fa")
    reads_path = str(tmp_path / "reads.fa")
    chroms = _write_fasta(ref_path, rng, 5_000_000, 2)
    _make_reads(reads_path, rng, chroms, 14)

    sam_flat, st_flat, _ = _map(ref_path, reads_path, monkeypatch, None)
    sam_units, st_units, pipe = _map(ref_path, reads_path, monkeypatch, 22)
    assert pipe.ref.n_units == 3, pipe.ref.n_units
    assert pipe.native is None          # python path for multi-unit
    assert st_units["mapped"] == st_flat["mapped"] == 14
    assert sam_units == sam_flat


def test_unitized_descs_reencode_flat(tmp_path, monkeypatch):
    """decode_*_desc with units = the flat descriptor re-based by the
    unit slab (same window, same clamps)."""
    from ngmlr_tpu.io.reference import ReferenceGenome
    rng = np.random.default_rng(5)
    ref_path = str(tmp_path / "u.fa")
    _write_fasta(ref_path, rng, 3_000_000, 2)
    monkeypatch.delenv("NGMLR_TPU_UNIT_SLAB_BITS", raising=False)
    flat = ReferenceGenome.from_fasta(ref_path, use_cache=False)
    monkeypatch.setenv("NGMLR_TPU_UNIT_SLAB_BITS", "21")
    uni = ReferenceGenome.from_fasta(ref_path, use_cache=False)
    assert uni.n_units == 3
    for _ in range(300):
        pos = int(rng.integers(0, flat.concat_len))
        blen = int(rng.integers(10, 50_000))
        a = flat.decode_window_desc(pos, blen)
        b = uni.decode_window_desc(pos, blen)
        assert (a is None) == (b is None)
        if a is None:
            continue
        base = b.unit << uni.unit_bits
        assert (b.ds + base, b.hi + base, b.diff, b.W) == \
            (a.ds, a.hi, a.diff, a.W)
        a = flat.decode_exact_desc(pos, blen)
        b = uni.decode_exact_desc(pos, blen)
        if a is None:
            continue
        if a.hi == 0:                    # fully-in-spacer sentinel
            assert b.hi == 0
            continue
        base = b.unit << uni.unit_bits
        assert (b.ds + base, b.hi + base, b.diff, b.W) == \
            (a.ds, a.hi, a.diff, a.W)


@pytest.mark.skipif(not os.environ.get("NGMLR_TPU_BIG_TESTS"),
                    reason="~1 h CPU: 4.6 Gbp genome generation + index "
                           "build; set NGMLR_TPU_BIG_TESTS=1 to run")
def test_real_4g6_genome_three_units():
    """The actual >4.29 Gbp capacity proof: a 4.6 Gbp synthetic genome
    spans three 2^31 slabs; index build + end-to-end mapping of sampled
    reads through the full pipeline (host search + device score/align
    with unit planes). Artifacts cache in /tmp/ngmlr_human_scale."""
    import json
    import subprocess
    import sys
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "scripts/human_scale.py", "4.6", "--map", "8"],
        capture_output=True, env=env, timeout=7000,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["mapped"] >= 7, res


def test_host_search_unit_major_order(tmp_path, monkeypatch):
    """Multi-unit emission must follow the RefEntry chain order (unit-
    major, fwd-then-rev per unit) — same candidate SET as flat, order
    per the reference's GetRefEntry chain."""
    from ngmlr_tpu.io.reference import ReferenceGenome
    from ngmlr_tpu.index.kmer_index import KmerIndex
    from ngmlr_tpu.seed.candidates import search_batch
    rng = np.random.default_rng(13)
    ref_path = str(tmp_path / "s.fa")
    chroms = _write_fasta(ref_path, rng, 2_000_000, 2)
    monkeypatch.delenv("NGMLR_TPU_UNIT_SLAB_BITS", raising=False)
    ref = ReferenceGenome.from_fasta(ref_path, use_cache=False)
    idx = KmerIndex.build(ref)
    seqs = []
    for i in range(40):
        c = int(rng.integers(0, 2))
        L = int(rng.integers(100, 257))
        pos = int(rng.integers(0, len(chroms[c]) - L))
        seqs.append(chroms[c][pos:pos + L].tobytes())
    flat = search_batch(idx, seqs)
    multi = search_batch(idx, seqs, n_units=4, unit_bits=20)
    for i, (a, b) in enumerate(zip(flat, multi)):
        # same kept candidate set (locations+strand+counts as multisets)
        ka = sorted(zip(a.locations.tolist(), a.reverse.tolist(),
                        a.counts.tolist()))
        kb = sorted(zip(b.locations.tolist(), b.reverse.tolist(),
                        b.counts.tolist()))
        assert ka == kb, f"sub {i}"
