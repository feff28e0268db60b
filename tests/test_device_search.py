"""Device candidate search vs the host numpy twin: exact equality.

The device path (ngmlr_tpu.seed.device_search) must reproduce the host
search_batch (itself golden-validated against the reference's rList
emergence order) — same candidate locations, strands, counts, and order
per subread.
"""

import numpy as np
import pytest

from ngmlr_tpu.index.kmer_index import KmerIndex
from ngmlr_tpu.io.reference import ReferenceGenome
from ngmlr_tpu.seed.candidates import search_batch
from ngmlr_tpu.seed.device_search import DeviceSearch


def _mk_ref(tmp_path, rng, n, name="t"):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, size=n)]
    p = tmp_path / f"{name}.fa"
    with open(p, "wb") as f:
        f.write(b">chr1\n")
        g = genome.tobytes()
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + b"\n")
    return ReferenceGenome.from_fasta(str(p), use_cache=False), genome


@pytest.mark.parametrize("seed", [0, 7])
def test_device_search_matches_host(tmp_path, seed):
    rng = np.random.default_rng(seed)
    ref, genome = _mk_ref(tmp_path, rng, 400_000, name=f"s{seed}")
    idx = KmerIndex.build(ref)

    comp = bytes.maketrans(b"ACGT", b"TGCA")
    seqs = []
    for i in range(300):
        L = int(rng.integers(40, 257))
        pos = int(rng.integers(0, len(genome) - L))
        s = bytearray(genome[pos:pos + L].tobytes())
        # mutate ~10%
        for _ in range(L // 10):
            s[int(rng.integers(0, L))] = b"ACGT"[int(rng.integers(0, 4))]
        s = bytes(s)
        if rng.random() < 0.5:
            s = s.translate(comp)[::-1]
        if rng.random() < 0.05:
            s = s[:10] + b"N" * int(rng.integers(1, 5)) + s[10:]
        seqs.append(s)
    # a no-hit subread and an empty-ish one
    seqs.append(b"N" * 60)
    seqs.append(b"ACGT" * 3)

    host = search_batch(idx, seqs)
    dev = DeviceSearch(idx)
    assert dev.available
    got = dev.search_batch(seqs)
    assert got is not None
    assert len(got) == len(host)
    for i, (h, d) in enumerate(zip(host, got)):
        np.testing.assert_array_equal(h.locations, d.locations, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.reverse, d.reverse, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.counts, d.counts, err_msg=f"sub {i}")
        assert h.mq_zero == d.mq_zero, i


def test_device_search_chunked_matches_host(tmp_path, monkeypatch):
    """Force the NV_MAX chunk-splitting path (big batches split into
    per-subread chunks to stay inside the compiled vote class)."""
    from ngmlr_tpu.seed import device_search as dsm
    monkeypatch.setattr(dsm, "NV_MAX", 1 << 16)
    rng = np.random.default_rng(3)
    ref, genome = _mk_ref(tmp_path, rng, 300_000, name="chunked")
    idx = KmerIndex.build(ref)
    seqs = []
    for i in range(200):
        L = int(rng.integers(100, 257))
        pos = int(rng.integers(0, len(genome) - L))
        seqs.append(genome[pos:pos + L].tobytes())
    host = search_batch(idx, seqs)
    got = dsm.DeviceSearch(idx).search_batch(seqs)
    assert got is not None
    for i, (h, d) in enumerate(zip(host, got)):
        np.testing.assert_array_equal(h.locations, d.locations, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.reverse, d.reverse, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.counts, d.counts, err_msg=f"sub {i}")
        assert h.mq_zero == d.mq_zero, i
