"""Bit-exactness of KmerIndex.build against the reference's own on-disk
index artifacts.

tests/golden/index/*.ngm.xz are real ``<ref>-ht-<k>-<skip>.2.ngm`` files
written by the reference binary (built from /root/reference, run on
tests/data/test_2/ref_chr21_20kb.fa with -k 10 and the default -k 13).
File format per CompactPrefixTable::saveToFile (PrefixTable.cpp:534-567):

    u32 cookie(0x1701E)  u32 k  u32 skip  u32 unitCount  u32 refIndexSize
    per unit: u32 cRefTableLen
              Index[refIndexSize]   (packed 5 B: u32 m_TabIndex,
                                     i8 m_RevCompIndex = 0-100 weight)
              u32 RefTable[cRefTableLen]  (Location.m_Location)
              u64 Offset
    u32 signature = cookie+k+skip+unitCount+refIndexSize

Semantics (createRefTableIndex, PrefixTable.cpp:269-311): m_TabIndex is
the 1-based cumulative bucket start; a prefix participates in lookups iff
its weight byte != 0 (Index::used(), PrefixTable.h:27-30) — the weight is
int8((maxPrefixFreq - total_freq) * 100.0f / maxPrefixFreq) for prefixes
with freq > 0 and total_freq < maxPrefixFreq, else 0.
"""

import lzma
import os

import numpy as np
import pytest

from ngmlr_tpu.index.kmer_index import KmerIndex, revcomp_prefix
from ngmlr_tpu.io.reference import ReferenceGenome

from conftest import DATA_DIR, GOLDEN_DIR

REF_FA = os.path.join(DATA_DIR, "test_2", "ref_chr21_20kb.fa")

IDX_DTYPE = np.dtype([("tab", "<u4"), ("w", "i1")])
assert IDX_DTYPE.itemsize == 5


def parse_ngm(path):
    raw = lzma.open(path, "rb").read()
    head = np.frombuffer(raw, dtype="<u4", count=5)
    cookie, k, skip, units, ref_index_size = (int(x) for x in head)
    assert cookie == 0x1701E and units == 1 and skip == 2
    assert ref_index_size == 4 ** k + 1
    off = 20
    table_len = int(np.frombuffer(raw, dtype="<u4", count=1, offset=off)[0])
    off += 4
    idx = np.frombuffer(raw, dtype=IDX_DTYPE, count=ref_index_size,
                        offset=off)
    off += ref_index_size * 5
    ref_table = np.frombuffer(raw, dtype="<u4", count=table_len, offset=off)
    off += table_len * 4
    unit_offset = int(np.frombuffer(raw, dtype="<u8", count=1, offset=off)[0])
    off += 8
    sig = int(np.frombuffer(raw, dtype="<u4", count=1, offset=off)[0])
    assert sig == (cookie + k + skip + units + ref_index_size) % 2 ** 32
    assert unit_offset == 0
    return k, idx, ref_table


@pytest.mark.parametrize("k", [10, 13])
def test_index_bit_exact_vs_reference_artifact(k):
    art = os.path.join(GOLDEN_DIR, "index",
                       "ref_chr21_20kb.fa-ht-%d-2.2.ngm.xz" % k)
    file_k, idx, ref_table = parse_ngm(art)
    assert file_k == k
    n_prefix = 4 ** k

    tab0 = idx["tab"].astype(np.int64) - 1      # 0-based bucket starts
    counts_file = np.diff(tab0)                 # [n_prefix]
    weights = idx["w"][:n_prefix].astype(np.int64)
    visible = weights != 0                      # Index::used()

    ref = ReferenceGenome.from_fasta(REF_FA, use_cache=True)
    ours = KmerIndex.build(ref, k=k)

    # densify our index (tiny genomes build the sparse representation)
    counts_ours = np.zeros(n_prefix, dtype=np.int64)
    if ours.uniq_prefix is None:
        counts_ours[:] = np.diff(ours.bucket_start)
    else:
        counts_ours[ours.uniq_prefix] = np.diff(ours.bucket_start)

    # 1. lookup-visible content is identical: same buckets, same counts
    assert np.array_equal(counts_ours, np.where(visible, counts_file, 0))

    # 2. and the same positions in the same order
    pfx_of_pos = np.repeat(np.arange(n_prefix), counts_file)
    keep = visible[pfx_of_pos]
    assert np.array_equal(ours.positions.astype(np.uint32), ref_table[keep])

    # 3. for these artifacts every stored prefix is lookup-visible
    # (no 990 < total_freq < 1000 prefixes on a 20 kb genome), so the
    # comparison above IS a bit-compare of the full index payload:
    assert np.array_equal(visible, counts_file > 0)
    dense_start = np.zeros(n_prefix + 1, dtype=np.int64)
    dense_start[1:] = np.cumsum(counts_ours)
    assert np.array_equal(dense_start, tab0)
    assert np.array_equal(ours.positions.astype(np.uint32), ref_table)

    # 4. weight bytes follow the documented formula from the stored
    # frequencies (float32 arithmetic + C char truncation,
    # PrefixTable.cpp:300): freq/total_freq are the pass-1 counts, which
    # equal the stored per-bucket counts
    total = counts_file + counts_file[revcomp_prefix(
        np.arange(n_prefix), k)]
    used = (counts_file > 0) & (total < 1000)
    w_expect = np.where(
        used,
        ((1000 - total).astype(np.float32) * np.float32(100.0)
         / np.float32(1000.0)).astype(np.int8),
        0)
    assert np.array_equal(weights, w_expect)
