import numpy as np
import pytest

from ngmlr_tpu.ops.convex import BandSpec, run_batch, STOP, DIAG, INS, DEL
from ngmlr_tpu.ops.convex_ref import fill_matrix
from ngmlr_tpu.ops import device_engine as de
from ngmlr_tpu.ops.device_engine import RefDesc
from ngmlr_tpu.io.reads import Read, SeqView
from ngmlr_tpu.io.reference import _CHAR2CODE
from ngmlr_tpu.align.aligner import (align_banded, compute_alignment,
                                     corridor_linear, corridor_full,
                                     materialize_offsets, RefWin,
                                     AlignerConfig)
from ngmlr_tpu.align.cigar import backtrack, convert_cigar


def _rand_seq(rng, n):
    return bytes(rng.choice(list(b"ACGT"), size=n).astype(np.uint8))


def _mutate(rng, seq, sub=0.05, ins=0.03, dele=0.03):
    out = bytearray()
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.choice(list(b"ACGT")))
        if r < dele + ins + sub:
            out.append(rng.choice(list(b"ACGT")))
        else:
            out.append(c)
    return bytes(out)


def _codes(b: bytes) -> np.ndarray:
    return _CHAR2CODE[np.frombuffer(b, dtype=np.uint8)]


def _setup(ref: bytes, qry: bytes):
    """Device context whose 'genome' is the ref window and whose read buffer
    is the query; returns (ref_win, qry_view)."""
    ctx = de.DeviceContext(_codes(ref))
    ctx.upload_reads(_codes(qry))
    de.set_current(ctx)
    read = Read(0, b"r", qry, None)
    read.buf_offset = 0
    ref_win = RefWin(RefDesc(0, 0, len(ref), len(ref)), ref)
    return ref_win, SeqView(read, 0, len(qry), False)


def test_wavefront_matches_oracle_random():
    rng = np.random.default_rng(11)
    for trial in range(12):
        H = int(rng.integers(4, 60))
        W = int(rng.integers(4, 80))
        ref = _rand_seq(rng, W)
        qry = _rand_seq(rng, H)
        width = int(rng.integers(3, 25))
        base = rng.integers(-5, 5)
        offs = (np.arange(H) * float(rng.choice([0.5, 1.0, 1.7]))).astype(np.int64) + base

        bs, bx, by, dirs = fill_matrix(ref, qry, offs, width)
        res = run_batch([BandSpec(ref, qry, offs, width)])[0]

        assert res.score == pytest.approx(bs), f"trial {trial}"
        if bs > 0:
            assert (res.best_x, res.best_y) == (bx, by), f"trial {trial}"
        # full direction-matrix equivalence over the band
        for y in range(H):
            for x in range(max(0, int(offs[y])), min(W, int(offs[y]) + width)):
                assert res.dir_at(x, y) == dirs[y, x], (trial, x, y)


def test_device_engine_matches_host_oracle():
    """The fused device fill+backtrack must produce the identical Align as
    the legacy host path (old wavefront kernel + host backtrack + convert) —
    the dual-implementation pattern of the reference's TEST_ALIGNER
    (AlignmentBuffer.cpp:364-401)."""
    rng = np.random.default_rng(123)
    for trial in range(10):
        truth = _rand_seq(rng, int(rng.integers(60, 400)))
        qry = _mutate(rng, truth)
        pad = int(rng.integers(5, 60))
        ref = _rand_seq(rng, pad) + truth + _rand_seq(rng, pad)
        corridor = int(rng.choice([32, 64, 128]))

        ref_win, qry_view = _setup(ref, qry)
        c = corridor_linear(corridor)
        a_dev = align_banded(ref_win, qry_view, c, 2, 4)

        offs = materialize_offsets(c, len(qry))
        res = run_batch([BandSpec(ref, qry, offs, c.width)])[0]
        bt = backtrack(res, offs, c.width, len(qry))
        if bt is None:
            assert a_dev is None, f"trial {trial}"
            continue
        ops, ref_position, _ = bt
        a_host, host_len = convert_cigar(ops, ref, ref_position, qry, 2, 4)
        assert a_dev is not None, f"trial {trial}"
        assert a_dev.cigar == a_host.cigar, f"trial {trial}"
        assert a_dev.md == a_host.md
        assert a_dev.nm == a_host.nm
        assert a_dev.score == pytest.approx(res.score)
        assert a_dev.qstart == a_host.qstart and a_dev.qend == a_host.qend
        assert a_dev.position_offset == a_host.position_offset
        assert a_dev._final_cigar_length == host_len
        np.testing.assert_array_equal(a_dev.nm_per_position,
                                      a_host.nm_per_position)


def test_wavefront_perfect_match():
    rng = np.random.default_rng(5)
    qry = _rand_seq(rng, 50)
    ref = _rand_seq(rng, 20) + qry + _rand_seq(rng, 20)
    ref_win, qry_view = _setup(ref, qry)
    a = align_banded(ref_win, qry_view, corridor_linear(64), 0, 0)
    assert a is not None
    assert a.cigar == "50M"
    assert a.score == 100.0
    assert a.nm == 0 and a.identity == 1.0
    assert a.position_offset == 20
    assert a.md == "50"


def test_align_with_mutations_cigar_length():
    rng = np.random.default_rng(9)
    truth = _rand_seq(rng, 400)
    qry = _mutate(rng, truth)
    ref = _rand_seq(rng, 50) + truth + _rand_seq(rng, 50)
    ref_win, qry_view = _setup(ref, qry)
    a = align_banded(ref_win, qry_view, corridor_linear(128), 0, 0)
    assert a is not None
    # invariant: sum of M/I/S ops == read length (ConvexAlignFast.cpp check)
    import re
    consumed = sum(int(n) for n, op in re.findall(r"(\d+)([MIS])", a.cigar))
    assert consumed == len(qry)
    assert a._final_cigar_length == len(qry)
    assert a.identity > 0.85


def test_convex_gap_prefers_long_gap_extension():
    # deletion of 30 bases: convex cost lets the gap extend cheaply after
    # the first bases; alignment should span it as one 30D
    rng = np.random.default_rng(21)
    left = _rand_seq(rng, 80)
    right = _rand_seq(rng, 80)
    gap = _rand_seq(rng, 30)
    ref = left + gap + right
    qry = left + right
    ref_win, qry_view = _setup(ref, qry)
    a = align_banded(ref_win, qry_view, corridor_linear(100), 0, 0)
    assert a is not None
    assert "30D" in a.cigar
    assert a.cigar == "80M30D80M"
    assert a.md == "80^" + gap.decode() + "80"
    assert a.nm == 30


def test_external_clips_added():
    rng = np.random.default_rng(30)
    qry = _rand_seq(rng, 60)
    ref = qry
    ref_win, qry_view = _setup(ref, qry)
    a = align_banded(ref_win, qry_view, corridor_linear(32), 7, 3)
    assert a.cigar == "7S60M3S"
    assert a.qstart == 7 and a.qend == 3
    assert a._final_cigar_length == 70


def test_reverse_query_view():
    """A rev SeqView must align as the reverse-complement of the read."""
    rng = np.random.default_rng(33)
    qry_fwd = _rand_seq(rng, 64)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    qry_rc = qry_fwd.translate(comp)[::-1]
    ref = _rand_seq(rng, 10) + qry_rc + _rand_seq(rng, 10)
    ref_win, view = _setup(ref, qry_fwd)
    a = align_banded(ref_win, view.revcomp(), corridor_linear(48), 0, 0)
    assert a is not None
    assert a.cigar == "64M"
    assert a.position_offset == 10


def test_compute_alignment_narrow_corridor_clips():
    # A 40-base deletion cannot shift diagonals inside a 16-wide linear
    # corridor; like the reference, the local alignment clips instead
    # (validity only requires cigar length == read length,
    # AlignmentBuffer.cpp:415).
    rng = np.random.default_rng(40)
    truth = _rand_seq(rng, 200)
    qry = truth[:100] + truth[140:]
    ref = truth
    ref_win, qry_view = _setup(ref, qry)
    a = compute_alignment(None, 16, qry_view, 0, 0, len(qry), ref_win,
                          AlignerConfig(), short_read=True)
    assert a is not None
    assert a.cigar == "100M60S"


def test_compute_alignment_wide_corridor_spans_deletion():
    rng = np.random.default_rng(40)
    truth = _rand_seq(rng, 200)
    qry = truth[:100] + truth[140:]
    ref = truth
    ref_win, qry_view = _setup(ref, qry)
    a = compute_alignment(None, 128, qry_view, 0, 0, len(qry), ref_win,
                          AlignerConfig(), short_read=True)
    assert a is not None
    assert a.cigar == "100M40D60M"


def test_native_cigar_matches_python():
    from ngmlr_tpu.native import get_lib
    if get_lib() is None:
        pytest.skip("no native toolchain")
    from ngmlr_tpu.align.cigar import (backtrack, convert_cigar,
                                       backtrack_and_convert)
    rng = np.random.default_rng(77)
    for trial in range(10):
        truth = _rand_seq(rng, 300)
        qry = _mutate(rng, truth)
        ref = _rand_seq(rng, 40) + truth + _rand_seq(rng, 40)
        c = corridor_linear(96)
        offs = materialize_offsets(c, len(qry))
        spec = BandSpec(ref, qry, np.asarray(offs), c.width).prepare()
        res = run_batch([spec])[0]
        py = backtrack(res, offs, c.width, len(qry))
        nat = backtrack_and_convert(res, offs, c.width, ref, qry, 3, 5)
        if py is None:
            assert nat is None
            continue
        ops, ref_position, _ = py
        a_py, len_py = convert_cigar(ops, ref, ref_position, qry, 3, 5)
        a_nat, len_nat = nat
        assert len_py == len_nat
        assert a_py.cigar == a_nat.cigar
        assert a_py.md == a_nat.md
        assert a_py.nm == a_nat.nm
        assert a_py.qstart == a_nat.qstart and a_py.qend == a_nat.qend
        assert a_py.identity == pytest.approx(a_nat.identity)
        assert a_py.cigar_op_count == a_nat.cigar_op_count
        assert (a_py.first_ref_pos, a_py.first_read_pos) == (a_nat.first_ref_pos, a_nat.first_read_pos)
        assert (a_py.last_ref_pos, a_py.last_read_pos) == (a_nat.last_ref_pos, a_nat.last_read_pos)
        np.testing.assert_array_equal(a_py.nm_per_position, a_nat.nm_per_position)
