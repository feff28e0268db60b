import numpy as np

from ngmlr_tpu.index.kmer_index import KmerIndex, kmer_stream, revcomp_prefix
from ngmlr_tpu.io.reference import ReferenceGenome, SPACER
from ngmlr_tpu.seed.candidates import search_batch


def brute_prefix_iteration(seq: bytes, k: int, stride: int):
    """Direct port of the reference scan semantics for cross-checking:
    segments between Ns, k-mers from each segment start with `stride`."""
    out = []
    seg_start = 0
    i = 0
    n = len(seq)
    while i <= n:
        if i == n or seq[i:i + 1] == b"N":
            # segment [seg_start, i)
            s = seg_start
            count = 0
            while s + k <= i:
                if count % stride == 0:
                    val = 0
                    for c in seq[s:s + k]:
                        val = (val << 2) | ((c >> 1) & 3)
                    out.append((val, s))
                count += 1
                s += 1
            seg_start = i + 1
        i += 1
    return out


def test_kmer_stream_matches_bruteforce():
    rng = np.random.default_rng(0)
    for trial in range(20):
        n = int(rng.integers(5, 200))
        seq = bytes(rng.choice(list(b"ACGTN"), size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04]))
        k = 5
        stride = 3
        want = brute_prefix_iteration(seq, k, stride)
        got_p, got_s = kmer_stream(np.frombuffer(seq, dtype=np.uint8), k, stride)
        assert list(zip(got_p.tolist(), got_s.tolist())) == want, seq


def test_revcomp_prefix():
    # "ACGT" 2-bit codes via (c>>1)&3: A=0,C=1,T=2,G=3
    k = 4

    def enc(s):
        v = 0
        for c in s.encode():
            v = (v << 2) | ((c >> 1) & 3)
        return v

    assert int(revcomp_prefix(enc("ACGT"), k)) == enc("ACGT")  # palindrome
    assert int(revcomp_prefix(enc("AAAA"), k)) == enc("TTTT")
    assert int(revcomp_prefix(enc("AACG"), k)) == enc("CGTT")


def _mk_ref(tmp_path, chrseqs):
    p = tmp_path / "r.fa"
    with open(p, "w") as f:
        for i, s in enumerate(chrseqs):
            f.write(f">c{i}\n{s}\n")
    return ReferenceGenome.from_fasta(str(p), use_cache=False), str(p)


def test_index_build_and_lookup(tmp_path):
    rng = np.random.default_rng(1)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=3000))
    ref, _ = _mk_ref(tmp_path, [seq])
    k = 13
    idx = KmerIndex.build(ref, k=k, kmer_skip=2, bin_size=4)
    # every stored position decodes to a k-mer whose prefix matches its bucket
    total = 0
    if idx.uniq_prefix is not None:
        nonempty = idx.uniq_prefix[np.diff(idx.bucket_start) > 0]
    else:
        nonempty = np.nonzero(np.diff(idx.bucket_start))[0]
    for prefix in nonempty[:50]:
        for pos in idx.lookup(int(prefix)):
            total += 1
            window = ref.decode_window(int(pos), k + 2)[:k]
            val = 0
            for c in window:
                val = (val << 2) | ((c >> 1) & 3)
            assert val == prefix
    assert total > 0
    # positions are within chromosome 0
    assert idx.positions.min() >= SPACER
    assert idx.positions.max() <= SPACER + len(seq) - k


def test_streaming_build_chunk_invariance(tmp_path, monkeypatch):
    """The streaming two-pass build must produce a bit-identical index for
    ANY emission chunk size (chunk boundaries exercise the 2-entry dedup
    carry and the pass-B per-bucket write pointers). Uses k=7 so a small
    genome lands in the dense regime (n_total * 16 >= 4^k), plus an
    N-rich genome for segment/chunk interactions."""
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=20000))
    # sprinkle N runs to create many segments
    seq2 = list(seq)
    for p in rng.integers(0, len(seq2) - 10, size=40):
        for j in range(int(rng.integers(1, 8))):
            seq2[p + j] = "N"
    chrs = ["".join(seq2), seq[:5003]]   # odd length: decode tail quirk
    ref, _ = _mk_ref(tmp_path, chrs)

    def build(chunk):
        monkeypatch.setenv("NGMLR_TPU_INDEX_CHUNK", str(chunk))
        return KmerIndex.build(ref, k=7, kmer_skip=2, bin_size=4,
                               max_prefix_freq=60)

    base = build(1 << 30)    # single chunk per chromosome
    assert base.uniq_prefix is None, "expected dense regime"
    for chunk in (17, 1024, 4096):
        idx = build(chunk)
        assert np.array_equal(base.bucket_start, idx.bucket_start), chunk
        assert np.array_equal(base.positions, idx.positions), chunk
        assert (idx.uniq_prefix is None) == (base.uniq_prefix is None)


def test_index_same_bin_dedup(tmp_path):
    # Homopolymer: every stride-3 emission is the same prefix, so the
    # consecutive same-prefix same-bin rule (PrefixTable.cpp:372-393)
    # collapses each 16-base bin to its first emission.
    seq = "A" * 100
    ref, _ = _mk_ref(tmp_path, [seq])
    idx = KmerIndex.build(ref, k=7, kmer_skip=2, bin_size=4)
    nz = np.nonzero(np.diff(idx.bucket_start))[0]
    assert len(nz) == 1  # only poly-A
    pos = idx.lookup(int(nz[0])) - 1000  # remove leading pad
    # emissions at chrom-relative 0,3,...,93 (k=7); bins are ABSOLUTE
    # (pos+1000)>>4 with edges at relative 8,24,40,...; the first TWO
    # emissions of a same-prefix run are always kept (lastBin==-1 after a
    # prefix change, PrefixTable.cpp:377-386), then first-per-bin:
    assert pos.tolist() == [0, 3, 9, 24, 42, 57, 72, 90]


def test_candidate_search_finds_origin(tmp_path):
    rng = np.random.default_rng(7)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=5000))
    ref, _ = _mk_ref(tmp_path, [seq])
    idx = KmerIndex.build(ref, k=13, kmer_skip=2, bin_size=4)
    start = 1234
    sub = seq[start:start + 256].encode()
    from ngmlr_tpu.io.fastx import reverse_complement
    sub_rc = reverse_complement(sub)

    cands = search_batch(idx, [sub, sub_rc])
    # forward subread: top candidate is fwd strand near the true origin
    c = cands[0]
    best = int(np.argmax(c.counts))
    assert not c.reverse[best]
    assert abs(int(c.locations[best]) - (SPACER + start)) <= 16
    # reverse-complemented subread: top candidate flagged reverse, same region
    c2 = cands[1]
    best2 = int(np.argmax(c2.counts))
    assert c2.reverse[best2]
    assert abs(int(c2.locations[best2]) - (SPACER + start)) <= 16


def test_candidate_threshold():
    # sensitivity filter: counts below 0.8*max dropped
    from ngmlr_tpu.seed.candidates import search_batch  # noqa
