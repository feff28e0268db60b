import numpy as np
import pytest

from ngmlr_tpu.io.fastx import parse_fastx, reverse_complement
from ngmlr_tpu.io.reference import ReferenceGenome, SPACER
from ngmlr_tpu.io.reads import Read, read_stream, ID_JUMP

from conftest import DATA_DIR


def test_parse_fasta_plain(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">chr1 some description\nACGTacgtNRYn\nACGT\n>chr2\nTTTT\n")
    recs = list(parse_fastx(str(p)))
    assert [r.name for r in recs] == [b"chr1", b"chr2"]
    assert recs[0].seq == b"ACGTACGTNNNNACGT"
    assert recs[1].seq == b"TTTT"


def test_parse_fastq_gz(tmp_path):
    import gzip
    p = tmp_path / "t.fq.gz"
    with gzip.open(p, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\n!!!!\n")
    recs = list(parse_fastx(str(p)))
    assert recs[0].qual == b"IIII"
    assert recs[1].seq == b"GGCC"


def test_reverse_complement():
    assert reverse_complement(b"ACGTN") == b"NACGT"


def test_reference_concat_layout(tmp_path):
    p = tmp_path / "r.fa"
    # chr lengths: 16 (even), 15 (odd -> +1 pad); one too-short (skipped)
    p.write_text(">c1\n" + "ACGT" * 4 + "\n>tiny\nACGTACGT\n>c2\n" + "GGGCA" * 3 + "\n")
    ref = ReferenceGenome.from_fasta(str(p), use_cache=False)
    assert ref.names == [b"c1", b"c2"]
    assert list(ref.ref_start) == [SPACER, SPACER + 16 + SPACER]
    assert list(ref.ref_len) == [16, 15]
    # total: 1000 + 16 + 1000 + 15 + 1(pad) + 1000 = 3032 bases
    assert len(ref.codes) == 3032
    assert ref.concat_len == 3031
    # convert round trip
    assert ref.convert(SPACER) == (0, 0)
    assert ref.convert(SPACER + 15) == (0, 15)
    # quirk: the FIRST spacer base still maps (diff == 1000 is not < 1000,
    # SequenceProvider.cpp:189); the next one is unmapped
    assert ref.convert(SPACER + 16) == (0, 16)
    assert ref.convert(SPACER + 17) is None  # in spacer
    assert ref.convert(2 * SPACER + 16) == (2, 0)
    # refStartPos terminator: last start + unpadded len + 1000
    assert ref.ref_start_pos[-1] == 2016 + 15 + 1000


def test_reference_decode_window(tmp_path):
    p = tmp_path / "r.fa"
    seq = "ACGTACGTACGTGGCC"
    p.write_text(f">c1\n{seq}\n")
    ref = ReferenceGenome.from_fasta(str(p), use_cache=False)
    # even position, even length
    assert ref.decode_window(SPACER, 10) == seq[:8].encode()
    # odd position, even length -> one EXTRA base (reference quirk)
    out = ref.decode_window(SPACER + 1, 10)
    assert out == seq[1:10].encode()
    # even position, odd length (len=7): emits len+1 chars, last forced 'x'
    out = ref.decode_window(SPACER, 9)
    assert out == seq[:7].encode() + b"x"
    # past-the-end 'x' fill
    out = ref.decode_window(ref.concat_len - 4, 12)
    assert out is not None and out.endswith(b"x" * 6)


def test_reference_decode_exact(tmp_path):
    p = tmp_path / "r.fa"
    seq = "ACGTACGTACGTGGCC"
    p.write_text(f">c1\n{seq}\n>c2\nTTTTCCCCGGGGAAAA\n")
    ref = ReferenceGenome.from_fasta(str(p), use_cache=False)
    # interval [start, stop): refSeqLength = stop - start + 1, returns len-1 chars
    out = ref.decode_exact(SPACER, 16 + 1)
    assert out == seq.encode()
    # clamps at chromosome end; tail is 'x'
    out = ref.decode_exact(SPACER + 8, 16 + 1)
    assert out[:8] == seq[8:].encode()
    assert out[8:] == b"x" * 8


def test_chr_borders(tmp_path):
    p = tmp_path / "r.fa"
    p.write_text(">c1\n" + "A" * 20 + "\n>c2\n" + "C" * 20 + "\n")
    ref = ReferenceGenome.from_fasta(str(p), use_cache=False)
    c = ref.get_chr_borders(SPACER + 2, SPACER + 10)
    assert (c.start, c.end) == (SPACER, SPACER + 20)
    c2 = ref.get_chr_borders(SPACER + 2, 2 * SPACER + 25)
    assert (c2.start, c2.end) == (0, 0)  # spans chromosomes


def test_read_stream_ids(tmp_path):
    p = tmp_path / "q.fa"
    p.write_text(">r1\n" + "A" * 300 + "\n>r2\n" + "C" * 100 + "\n")
    reads = list(read_stream(str(p)))
    assert reads[0].read_id == 0 and reads[1].read_id == ID_JUMP
    assert reads[0].subread_count() == 1   # 300 // 256
    assert reads[0].subread_seq(0) == b"A" * 256
    assert reads[1].subread_count() == 0   # short-read path


def test_subread_split_floor():
    r = Read(0, b"r", b"A" * 1000, None)
    assert r.subread_count() == 3          # floor(1000/256); 232bp tail dropped
    assert len(r.subread_seq(2)) == 256


def test_best_segment_combination_event_matches_loop():
    """The event-based getBestSegmentCombination must match the literal
    reference loop (ties, f32 rounding, backtrace) on random segments."""
    import numpy as np
    from ngmlr_tpu.chain.structs import Interval
    from ngmlr_tpu.pipeline.longread import (_best_segment_combination,
                                             _best_segment_combination_loop)
    rng = np.random.default_rng(42)
    for trial in range(200):
        L = int(rng.integers(60, 2500))
        n = int(rng.integers(1, 9))
        segs = []
        for j in range(n):
            s = Interval()
            a = int(rng.integers(0, L))
            b = min(L - 1, a + int(rng.integers(10, 900)))
            s.on_read_start, s.on_read_stop = a, b
            s.score = float(np.float32(rng.uniform(0, 500)))
            if rng.random() < 0.3 and n > 1:   # force score ties
                s.score = segs[0].score if segs else s.score
            s.is_processed = False
            segs.append(s)
        o1, o2 = [], []
        r1 = _best_segment_combination(L, segs, o1)
        r2 = _best_segment_combination_loop(L, segs, o2)
        assert r1 == r2, trial
        assert o1 == o2, trial
