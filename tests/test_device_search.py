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


def test_device_search_v1_matches_host(tmp_path, monkeypatch):
    """The v1 global-chunk kernel stays exact (it is the fallback path
    for outlier subreads and overflow rows under v2)."""
    monkeypatch.setenv("NGMLR_TPU_SEARCH_V2", "0")
    rng = np.random.default_rng(5)
    ref, genome = _mk_ref(tmp_path, rng, 200_000, name="v1")
    idx = KmerIndex.build(ref)
    seqs = []
    for i in range(150):
        L = int(rng.integers(60, 257))
        pos = int(rng.integers(0, len(genome) - L))
        seqs.append(genome[pos:pos + L].tobytes())
    host = search_batch(idx, seqs)
    got = DeviceSearch(idx).search_batch(seqs)
    assert got is not None
    for i, (h, d) in enumerate(zip(host, got)):
        np.testing.assert_array_equal(h.locations, d.locations, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.counts, d.counts, err_msg=f"sub {i}")


def test_device_search_v2_overflow_paths(tmp_path, monkeypatch):
    """Tiny caps force every v2 escape hatch: per-row E_CAP overflow ->
    v1 retry, NE2 launch truncation -> v1 retry, L_V2_MAX outliers -> v1
    single-sub chunks. A tandem-repeat patch makes vote-heavy subreads."""
    from ngmlr_tpu.seed import device_search as dsm
    monkeypatch.setattr(dsm, "E_CAP", 4)
    monkeypatch.setattr(dsm, "NE2", 64)
    monkeypatch.setattr(dsm, "L_V2_MAX", 2048)
    rng = np.random.default_rng(9)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases[rng.integers(0, 4, size=200_000)]
    mono = bases[rng.integers(0, 4, size=171)]
    genome[50_000:50_000 + 171 * 100] = np.tile(mono, 100)  # repeat patch
    p = tmp_path / "ovf.fa"
    with open(p, "wb") as f:
        f.write(b">chr1\n")
        g = genome.tobytes()
        for i in range(0, len(g), 70):
            f.write(g[i:i + 70] + b"\n")
    ref = ReferenceGenome.from_fasta(str(p), use_cache=False)
    idx = KmerIndex.build(ref)
    seqs = []
    for i in range(60):
        L = int(rng.integers(100, 257))
        pos = int(rng.integers(0, len(genome) - L))
        seqs.append(genome[pos:pos + L].tobytes())
    # vote-heavy subreads straight from the repeat patch (outlier class)
    for i in range(6):
        pos = 50_000 + int(rng.integers(0, 171 * 90))
        seqs.append(genome[pos:pos + 256].tobytes())
    host = search_batch(idx, seqs)
    got = dsm.DeviceSearch(idx).search_batch(seqs)
    assert got is not None
    for i, (h, d) in enumerate(zip(host, got)):
        np.testing.assert_array_equal(h.locations, d.locations, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.reverse, d.reverse, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.counts, d.counts, err_msg=f"sub {i}")


def test_expand_votes_kernel_matches_xla():
    """The Pallas telescoping-expand kernel (interpret mode) must equal
    the XLA repeat + packed-gather expansion bit-for-bit."""
    import jax.numpy as jnp
    from ngmlr_tpu.ops.pallas_kernels import expand_votes
    from ngmlr_tpu.seed.device_search import SL
    rng = np.random.default_rng(17)
    B, L = 16, 512
    SL2 = 2 * SL
    c2 = np.zeros((B, SL2), np.int32)
    for b in range(B):
        nv = int(rng.integers(0, L + 1))
        # scatter nv votes over random slots
        slots = rng.integers(0, SL2, size=nv)
        np.add.at(c2[b], slots, 1)
    base2 = rng.integers(0, 1 << 28, (B, SL2)).astype(np.int32)
    ct2 = rng.integers(-300, 300, (B, SL2)).astype(np.int32)
    cum2 = np.cumsum(c2, axis=1, dtype=np.int32)
    nv_row = cum2[:, -1]
    c2p = np.concatenate([c2, (L - nv_row)[:, None]], axis=1)
    d2tp = np.concatenate([base2 - (cum2 - c2), np.zeros((B, 1), np.int32)],
                          axis=1)
    ct2p = np.concatenate([ct2, np.zeros((B, 1), np.int32)], axis=1)

    # XLA reference expansion
    kmer_f = np.repeat(np.arange(B * (SL2 + 1)), c2p.reshape(-1))
    slot_ref = (kmer_f % (SL2 + 1)).reshape(B, L)
    d2t_ref = d2tp.reshape(-1)[kmer_f].reshape(B, L)
    ct_ref = ct2p.reshape(-1)[kmer_f].reshape(B, L)

    SLP = ((SL2 + 1 + 127) // 128) * 128
    Bp = 128

    def tab(x, pad):
        return np.pad(x, ((0, Bp - B), (0, SLP - x.shape[1])),
                      constant_values=pad).T
    bnd = tab(cum2, np.int32(2 ** 30))
    dd = tab(d2tp[:, 1:] - d2tp[:, :-1], 0)
    dc = tab(ct2p[:, 1:] - ct2p[:, :-1], 0)
    v0 = np.zeros((8, Bp), np.int32)
    v0[0, :B] = d2tp[:, 0]
    v0[1, :B] = ct2p[:, 0]
    slot_T, d2t_T, ct_T = expand_votes(
        jnp.asarray(bnd), jnp.asarray(dd), jnp.asarray(dc),
        jnp.asarray(v0), L, KT=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(slot_T).T[:B], slot_ref)
    np.testing.assert_array_equal(np.asarray(d2t_T).T[:B], d2t_ref)
    np.testing.assert_array_equal(np.asarray(ct_T).T[:B], ct_ref)


def test_device_search_v2_pallas_expand_matches(tmp_path, monkeypatch):
    """Full v2 path with the Pallas expand forced (interpret on CPU) vs
    the host twin — end-to-end exactness of the expand integration."""
    monkeypatch.setenv("NGMLR_TPU_SEARCH_EXPAND", "pallas")
    from ngmlr_tpu.ops import pallas_kernels as pk
    import jax
    if jax.default_backend() != "tpu":
        real = pk.expand_votes
        monkeypatch.setattr(
            pk, "expand_votes",
            lambda *a, **kw: real(*a, **{**kw, "interpret": True}))
    rng = np.random.default_rng(21)
    ref, genome = _mk_ref(tmp_path, rng, 150_000, name="pex")
    idx = KmerIndex.build(ref)
    seqs = []
    for i in range(50):
        L = int(rng.integers(80, 257))
        pos = int(rng.integers(0, len(genome) - L))
        seqs.append(genome[pos:pos + L].tobytes())
    host = search_batch(idx, seqs)
    got = DeviceSearch(idx).search_batch(seqs)
    assert got is not None
    for i, (h, d) in enumerate(zip(host, got)):
        np.testing.assert_array_equal(h.locations, d.locations, err_msg=f"sub {i}")
        np.testing.assert_array_equal(h.counts, d.counts, err_msg=f"sub {i}")


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
