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

    problems: List[ScoreProblem] = []
    owners: List[tuple] = []
    empty_ref = RefDesc(0, 0, 0, 0)   # out-of-range window -> scores 0

    for ri, (read, subs) in enumerate(zip(reads, candidates_per_read)):
        for j, cand in enumerate(subs):
            if len(cand.locations) == 0:
                continue
            sub_len = len(read.subread_seq(j, rpl))
            for k in range(len(cand.locations)):
                loc = int(cand.locations[k])
                desc = ref.decode_window_desc(loc - (corridor >> 1), ref_max_len)
                if desc is None:
                    desc = empty_ref
                view = SeqView(read, j * rpl, sub_len, bool(cand.reverse[k]))
                problems.append(ScoreProblem(desc, view.desc()))
                owners.append((ri, j, k))

    if problems:
        device_engine.current().score_wave(problems, readbuf=readbuf)

    # scatter back
    score_map = {}
    for (owner, p) in zip(owners, problems):
        score_map.setdefault(owner[:2], {})[owner[2]] = float(p.result)

    out: List[List[ScoredSubread]] = []
    for ri, (read, subs) in enumerate(zip(reads, candidates_per_read)):
        scored: List[ScoredSubread] = []
        for j, cand in enumerate(subs):
            n = len(cand.locations)
            if n == 0:
                scored.append(ScoredSubread(j * rpl, cand.locations,
                                            cand.reverse,
                                            np.zeros(0, np.float32), 0))
                continue
            svals = np.asarray([score_map[(ri, j)][k] for k in range(n)],
                               dtype=np.float32)
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
