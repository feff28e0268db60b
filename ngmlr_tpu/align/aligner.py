"""Interval alignment driver: corridor generation + retry loop.

Rebuild of AlignmentBuffer::computeAlignment and the corridor generators
(/root/reference/src/AlignmentBuffer.cpp:52-197, 226-465). Float32
truncation points of the originals are preserved because corridor geometry
feeds the kernel and the validPath check, both of which decide retries.
"""

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..ops.convex import BandSpec, run_batch, DEFAULT_PARAMS
from .cigar import Align, backtrack, convert_cigar

f32 = np.float32


def corridor_full(ref_seq_len: int, qry_len: int):
    """getCorridorFull (AlignmentBuffer.cpp:84-105)."""
    w = ref_seq_len
    off = int(f32(w) * f32(-0.2))
    length = w + int(f32(w) * f32(0.2))
    return np.full(qry_len, off, dtype=np.int64), length


def corridor_linear(corridor: int, qry_len: int):
    """getCorridorLinear (AlignmentBuffer.cpp:68-82)."""
    offs = np.arange(qry_len, dtype=np.int64) - corridor // 2
    return offs, corridor


def corridor_endpoints(corridor: int, ref_len: int, qry_len: int, realign: bool):
    """getCorridorEndpoints (AlignmentBuffer.cpp:107-127)."""
    width = corridor // (1 if realign else 4)
    k = f32(qry_len) / f32(ref_len)
    d = f32(width) / f32(2.0)
    i = np.arange(qry_len, dtype=np.float32)
    offs = np.trunc((i - d) / k).astype(np.int64)  # C cast truncates toward 0
    return offs, width


def corridor_with_anchors(interval, corridor_multiplier: int, ref_len: int,
                          qry_len: int, external_qstart: int,
                          read_part_length: int, full_read_length: int):
    """getCorridorEndpointsWithAnchors (AlignmentBuffer.cpp:129-197).

    `interval` needs .anchors (list with .on_read/.on_ref/.is_reverse) and
    .on_ref_start.
    """
    k_align = f32(qry_len) / f32(ref_len)
    corridor_left = f32(0.0)
    corridor_right = f32(0.0)
    for a in interval.anchors:
        if a.is_reverse:
            anchor_x = int(a.on_ref - interval.on_ref_start)
            anchor_y = full_read_length - a.on_read - read_part_length - external_qstart
        else:
            anchor_x = int(a.on_ref - interval.on_ref_start)
            anchor_y = a.on_read - external_qstart
        x_found = f32(anchor_x)
        x_expect = f32(anchor_y) / k_align
        diff = f32(x_expect - x_found)
        if diff > 0:
            corridor_right = max(corridor_right, diff)
        else:
            corridor_left = max(corridor_left, f32(diff * f32(-1.0)))

    corridor_left = f32(corridor_left + f32(128))
    corridor_right = f32(corridor_right + f32(128))
    # NOTE: sequential update — right uses the already-updated left
    corridor_left = f32(corridor_left + f32(corridor_left + corridor_right) * f32(0.1))
    corridor_right = f32(corridor_right + f32(corridor_left + corridor_right) * f32(0.1))
    corridor_left = f32(corridor_left * corridor_multiplier)
    corridor_right = f32(corridor_right * corridor_multiplier)

    width = int(f32(corridor_left + corridor_right))
    i = np.arange(qry_len, dtype=np.float32)
    offs = np.trunc(i / k_align - corridor_right).astype(np.int64)
    return offs, width


@dataclass
class AlignerConfig:
    score_match: float = 2.0
    score_mismatch: float = -5.0
    score_gap_open: float = -5.0
    score_gap_extend_max: float = -5.0
    score_gap_extend_min: float = -1.0
    score_gap_decay: float = 0.15

    @property
    def params(self):
        return (self.score_match, self.score_mismatch, self.score_gap_open,
                self.score_gap_extend_max, self.score_gap_extend_min,
                self.score_gap_decay)


def align_banded(ref_window: bytes, qry: bytes, offsets: np.ndarray,
                 width: int, external_qstart: int, external_qend: int,
                 params=DEFAULT_PARAMS) -> Optional[Align]:
    """One SingleAlign call: kernel fill + backtrack + cigar conversion.

    Returns None on backtrack failure (out-of-corridor path / no alignment).
    The caller checks final cigar length == full read length.
    """
    if len(qry) == 0 or len(ref_window) == 0:
        return None
    spec = BandSpec(ref_window, qry, offsets, width).prepare()
    from ..pipeline import batcher as _batcher
    wb = _batcher.current()
    if wb is not None:
        res = wb.align(spec, params)
    else:
        res = run_batch([spec], params=params)[0]
    from .cigar import backtrack_and_convert
    out = backtrack_and_convert(res, offsets, width, ref_window, qry,
                                external_qstart, external_qend)
    if out is None:
        return None
    align, final_len = out
    align.score = res.score
    align._final_cigar_length = final_len
    return align


def compute_alignment(interval, corridor: int, read_seq: bytes,
                      external_qstart: int, external_qend: int,
                      full_read_length: int, ref_window: bytes,
                      cfg: AlignerConfig,
                      realign: bool = False, full_alignment: bool = False,
                      short_read: bool = False,
                      read_part_length: int = 256) -> Optional[Align]:
    """computeAlignment retry loop (AlignmentBuffer.cpp:226-465).

    `ref_window` is the decoded [onRefStart, onRefStop] window
    (decode_exact output); refSeqLen in reference terms = len(ref_window)+1.
    """
    if ref_window is None or read_seq is None:
        return None
    ref_seq_len = len(ref_window) + 1   # reference's refSeqLen (incl. NUL slot)
    retry = 1 if full_alignment else 5
    max_corridor = ref_seq_len * 2
    corridor = min(corridor, max_corridor)
    qry_len = len(read_seq)

    mult = 1
    while corridor * mult <= max_corridor and retry > 0:
        retry -= 1
        if full_alignment:
            offs, width = corridor_full(ref_seq_len, qry_len)
        elif short_read:
            offs, width = corridor_linear(corridor * mult, qry_len)
        elif mult < 3 and not realign and interval is not None and len(interval.anchors) > 0:
            offs, width = corridor_with_anchors(
                interval, mult, len(ref_window), qry_len, external_qstart,
                read_part_length, full_read_length)
        else:
            offs, width = corridor_endpoints(corridor * mult, len(ref_window),
                                             qry_len, realign)

        align = align_banded(ref_window, read_seq, offs, width,
                             external_qstart, external_qend, cfg.params)
        if align is not None and align._final_cigar_length == full_read_length:
            return align
        mult += 1
    return None
