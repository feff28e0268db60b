"""Cross-validation of the candidate scorer against the ACTUAL vendored
ssw library, compiled from the reference tree at test time.

The claim being verified (ops/ungapped.py): StrippedSW passes gap
penalties of -1 into ssw_align's uint8 weight parameters
(StrippedSW.h:20-21 -> ssw.h:115-118), i.e. 255 per gap position, so for
the query lengths the reference ever scores (<= 266 bp subreads, 100 bp
SV probes, <= 256 bp short reads) a gapped path can never win and the
score equals the best ungapped local segment score. This test compiles
/root/reference/lib/Complete-Striped-Smith-Waterman-Library/src/ssw.c
with gcc, replays StrippedSW::BatchScore's exact call pattern
(StrippedSW.cpp:118-160: nt_table encode, strlen+1 lengths, 5x5 +1/-1
matrix with zero N row/col, ssw_init(..., score_size=1),
ssw_align(profile, ref, len, gapO=-1 as uint8, gapE=-1 as uint8, 0,0,0,0))
and compares score1 against ngmlr_tpu.ops.ungapped.score_batch on random
and adversarial pairs.

Skipped when the reference tree or a C toolchain is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from ngmlr_tpu.ops.ungapped import score_batch, score_pair_numpy

SSW_C = ("/root/reference/lib/Complete-Striped-Smith-Waterman-Library/"
         "src/ssw.c")


class SAlign(ctypes.Structure):
    # ssw.h:42-54
    _fields_ = [
        ("score1", ctypes.c_uint16),
        ("score2", ctypes.c_uint16),
        ("ref_begin1", ctypes.c_int32),
        ("ref_end1", ctypes.c_int32),
        ("read_begin1", ctypes.c_int32),
        ("read_end1", ctypes.c_int32),
        ("ref_end2", ctypes.c_int32),
        ("cigar", ctypes.c_void_p),
        ("cigarLen", ctypes.c_int32),
        ("identity", ctypes.c_float),
        ("nm", ctypes.c_int32),
    ]


@pytest.fixture(scope="module")
def ssw(tmp_path_factory):
    if not os.path.exists(SSW_C):
        pytest.skip("reference tree not available")
    so = str(tmp_path_factory.mktemp("ssw") / "libssw.so")
    try:
        subprocess.run(["gcc", "-O2", "-shared", "-fPIC", "-o", so, SSW_C],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("no C toolchain for ssw")
    lib = ctypes.CDLL(so)
    lib.ssw_init.restype = ctypes.c_void_p
    lib.ssw_init.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                             ctypes.c_char_p, ctypes.c_int32, ctypes.c_int8]
    lib.ssw_align.restype = ctypes.POINTER(SAlign)
    lib.ssw_align.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.c_int32, ctypes.c_uint8, ctypes.c_uint8,
                              ctypes.c_uint8, ctypes.c_uint16,
                              ctypes.c_int32, ctypes.c_int32]
    lib.align_destroy.argtypes = [ctypes.POINTER(SAlign)]
    lib.init_destroy.argtypes = [ctypes.c_void_p]
    return lib


# StrippedSW's nt_table (StrippedSW.cpp:109-115) + scoring matrix
# (StrippedSW.h:25-40): +1 match / -1 mismatch, N row+col all zero
_NT_TABLE = np.full(128, 4, dtype=np.int8)
for _i, _c in enumerate(b"ACGT"):
    _NT_TABLE[_c] = _i
    _NT_TABLE[_c + 32] = _i
_NT_TABLE[ord("a")] = 0   # nt_table maps 'a'->0 etc. (already via +32)

_MAT = np.zeros((5, 5), dtype=np.int8)
for _l in range(4):
    for _m in range(4):
        _MAT[_l, _m] = 1 if _l == _m else -1
_MAT_BYTES = _MAT.tobytes()


def ssw_score(lib, ref: bytes, qry: bytes) -> float:
    """StrippedSW::BatchScore for one pair (StrippedSW.cpp:118-160):
    lengths are strlen+1 (the NUL participates as code 4)."""
    read_len = len(qry) + 1
    ref_len = len(ref) + 1
    num = _NT_TABLE[np.frombuffer(qry + b"\0\0", dtype=np.uint8)].tobytes()
    ref_num = _NT_TABLE[np.frombuffer(ref + b"\0\0", dtype=np.uint8)].tobytes()
    prof = lib.ssw_init(num, read_len, _MAT_BYTES, 5, 1)
    res = lib.ssw_align(prof, ref_num, ref_len, ctypes.c_uint8(256 - 1),
                        ctypes.c_uint8(256 - 1), 0, 0, 0, 0)
    score = float(res.contents.score1)
    lib.align_destroy(res)
    lib.init_destroy(prof)
    return score


def _mutate(rng, seq: np.ndarray) -> bytes:
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    for c in seq:
        r = rng.random()
        if r < 0.04:
            continue                       # deletion
        if r < 0.14:
            out.append(rng.choice(bases))  # insertion
        if rng.random() < 0.05:
            out.append(rng.choice(bases))  # substitution
        else:
            out.append(c)
    return bytes(bytearray(out))


def test_scorer_matches_vendored_ssw(ssw):
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = rng.choice(bases, size=20_000)

    pairs = []
    # the ScoreBuffer workload: 306-base ref windows vs <=266-base
    # subreads with PacBio-like errors (ScoreBuffer.h:65-76)
    for _ in range(120):
        p = int(rng.integers(0, len(genome) - 400))
        ref = genome[p:p + 306].tobytes()
        qlen = int(rng.integers(50, 267))
        qry = _mutate(rng, genome[p + 20:p + 20 + qlen])
        pairs.append((ref, qry))
    # checkForSV probes: 100-base reads vs ~570-base windows
    for _ in range(40):
        p = int(rng.integers(0, len(genome) - 700))
        ref = genome[p:p + 570].tobytes()
        qry = _mutate(rng, genome[p + 235:p + 335])
        pairs.append((ref, qry))
    # random (unrelated) pairs and adversarial content
    for _ in range(40):
        ref = rng.choice(bases, size=int(rng.integers(1, 300))).tobytes()
        qry = rng.choice(bases, size=int(rng.integers(1, 267))).tobytes()
        pairs.append((ref, qry))
    pairs += [
        (b"ACGTACGTNNNNNNACGT", b"ACGTNACGT"),     # N scores 0 both sides
        (b"NNNNN", b"NNNNN"),
        (b"acgtacgt", b"ACGTACGT"),               # lowercase
        (b"A", b"A"),
        (b"A", b"T"),
        (b"ACGT" * 60, b""),                      # empty query
    ]

    ours = score_batch([r for r, _ in pairs], [q for _, q in pairs])
    for i, (ref, qry) in enumerate(pairs):
        want = ssw_score(ssw, ref, qry)
        assert float(ours[i]) == want, (
            i, ref[:40], qry[:40], float(ours[i]), want)
        # and the numpy twin agrees too
        assert score_pair_numpy(ref, qry) == want, (i, "numpy twin")
