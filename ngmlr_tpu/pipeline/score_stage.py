"""Candidate scoring stage (the reference's ScoreBuffer).

Rebuild of ScoreBuffer (/root/reference/src/ScoreBuffer.cpp) as one batched
kernel launch per read batch instead of 1024-pair buffers per thread:

  * per (subread, candidate): reference window = 306 decoded bases centred
    20 left of the candidate location (refMaxLen = ((266+40)|1)+1, window
    start loc - corridor/2; ScoreBuffer.h:65-76, ScoreBuffer.cpp:110-116),
  * query = subread sequence, reverse-complemented for reverse candidates,
  * score = ungapped local segment kernel (see ngmlr_tpu.ops.ungapped),
  * per subread: sort candidates by score (descending), subread MQ =
    ceil(60*(best-second)/best) (ScoreBuffer.cpp:33-45).
"""

from typing import List, Optional

import math
import numpy as np

from ..config import Config
from ..io.reads import Read, SeqView
from ..io.reference import ReferenceGenome
from ..ops.device_engine import RefDesc, ScoreProblem
from ..ops import device_engine
from ..seed.candidates import SubreadCandidates
from .longread import ScoredSubread

MAX_MQ = 60.0


def compute_mq(best: float, second: Optional[float]) -> int:
    """ScoreBuffer::computeMQ (ScoreBuffer.cpp:33-45) — float32 arithmetic."""
    if second is None:
        return int(MAX_MQ)
    if best <= 0:
        return 0  # reference divides by zero here; rare corner, see docstring
    f = np.float32
    val = f(MAX_MQ) * (f(best) - f(second)) / f(best)
    return int(math.ceil(float(val)))


def score_read_batch(ref: ReferenceGenome, cfg: Config,
                     reads: List[Read],
                     candidates_per_read: List[List[SubreadCandidates]],
                     readbuf=None) -> List[List[ScoredSubread]]:
    """Scores all subread candidates of a batch of long reads at once.

    candidates_per_read[i][j] = candidates of subread j of read i.
    Returns the ScoredSubread lists in matching structure.
    """
    rpl = cfg.read_part_length
    corridor = cfg.read_part_corridor
    qry_max_len = rpl + 10
    ref_max_len = ((qry_max_len + corridor) | 1) + 1   # ScoreBuffer.h:72

    # one packed int32 [P, 7] array for the whole batch (the descriptor
    # math is decode_window_desc vectorized; reference.py:222-236)
    loc_chunks: List[np.ndarray] = []
    rev_chunks: List[np.ndarray] = []
    qstart_chunks: List[int] = []
    qlen_chunks: List[int] = []
    counts: List[int] = []
    for ri, (read, subs) in enumerate(zip(reads, candidates_per_read)):
        for j, cand in enumerate(subs):
            n = len(cand.locations)
            if n == 0:
                continue
            loc_chunks.append(cand.locations)
            rev_chunks.append(cand.reverse)
            qstart_chunks.append(read.buf_offset + j * rpl)
            qlen_chunks.append(len(read.subread_seq(j, rpl)))
            counts.append(n)

    all_scores = np.zeros(0, np.float32)
    if counts:
        counts_a = np.asarray(counts, dtype=np.int64)
        locs = np.concatenate(loc_chunks)
        revs = np.concatenate(rev_chunks)
        qstarts = np.repeat(np.asarray(qstart_chunks, np.int64), counts_a)
        qlens = np.repeat(np.asarray(qlen_chunks, np.int64), counts_a)
        P = len(locs)
        pos = locs - (corridor >> 1)
        length = np.int64(ref_max_len - 2)
        valid = (pos >= 0) & (pos < ref.concat_len)
        end = np.maximum(pos + length - ref.concat_len, 0)
        ln = length - end
        d = (pos & 1) + 2 * ((ln + 1) // 2)
        hi = np.minimum(pos + d, len(ref.codes))
        W = (hi - pos) + end
        pk = np.zeros((P, 7), dtype=np.int32)
        pku = pk.view(np.uint32)
        pku[:, 0] = np.where(valid, pos, 0).astype(np.uint32)
        pku[:, 1] = np.where(valid, hi, 0).astype(np.uint32)
        pk[:, 3] = np.where(valid, W, 0).astype(np.int32)
        pk[:, 4] = qstarts.astype(np.int32)
        pk[:, 5] = qlens.astype(np.int32)
        pk[:, 6] = revs.astype(np.int32)
        all_scores = device_engine.current().score_wave_np(pk, readbuf=readbuf)
        bounds = np.concatenate([[0], np.cumsum(counts_a)])

    out: List[List[ScoredSubread]] = []
    ci = 0
    for ri, (read, subs) in enumerate(zip(reads, candidates_per_read)):
        scored: List[ScoredSubread] = []
        for j, cand in enumerate(subs):
            n = len(cand.locations)
            if n == 0:
                scored.append(ScoredSubread(j * rpl, cand.locations,
                                            cand.reverse,
                                            np.zeros(0, np.float32), 0))
                continue
            svals = all_scores[bounds[ci]:bounds[ci + 1]]
            ci += 1
            # std::sort desc incl. introsort tie order (ScoreBuffer.cpp:173)
            from ..native import std_sort_perm
            order = std_sort_perm(svals, desc=True)
            svals = svals[order]
            locs = cand.locations[order]
            revs = cand.reverse[order]
            # NOTE: the CS zero-hit rule (>90% k-mers without hits => MQ 0,
            # CS.cpp:221-225) is dead upstream: computeMQ overwrites
            # mappingQlty unconditionally after scoring (ScoreBuffer.cpp:38-45).
            mq = compute_mq(float(svals[0]),
                            float(svals[1]) if n > 1 else None)
            scored.append(ScoredSubread(j * rpl, locs, revs, svals, mq))
        out.append(scored)
    return out
