#!/usr/bin/env python3
"""Deterministically merge SAM shards produced with `ngmlr-tpu --shard I/N`.

Each shard maps every N-th read of the same input file, so interleaving the
shards' record groups reconstructs the single-process output: per-read
record groups are byte-identical always; total order matches the
single-process run up to the intake-group (10-read) short/long reordering,
which can bucket differently per shard. Headers are taken from shard 0
(@PG CL is per-shard by nature).

Usage: merge_sams.py [--query reads.fa[.gz]] out.sam shard0.sam ... shardN-1.sam

``--query`` makes the merge robust to empty input records: an empty
FASTA/Q record emits NO SAM group (runner skips it), which would shift
that shard's group sequence under pure positional round-robin. With the
query file, the merge walks global read order and skips the round-robin
slot of every empty read instead of pulling a later group into it.

This is the multi-host output merge of SURVEY §2.11: hosts write local
shards; the merge is a deterministic host-side pass (the reference, by
contrast, interleaves thread outputs nondeterministically —
FileWriter.h:23-27, test/test_3.sh sorts before diffing).
"""

import sys
from typing import List


def read_groups(path: str):
    """Yields (header_lines, [record-group per read in file order]).
    A group = consecutive records with the same QNAME."""
    headers: List[bytes] = []
    groups: List[List[bytes]] = []
    last_q = None
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b"@"):
                headers.append(line)
                continue
            q = line.split(b"\t", 1)[0]
            if q != last_q:
                groups.append([])
                last_q = q
            groups[-1].append(line)
    return headers, groups


def read_emptiness(query_path: str):
    """[read_is_empty] per record of the query file, in file order."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ngmlr_tpu.io.fastx import parse_fastx
    return [rec.empty for rec in parse_fastx(query_path)]


def main(argv):
    argv = list(argv)
    empties = None
    if "--query" in argv:
        qi = argv.index("--query")
        empties = read_emptiness(argv[qi + 1])
        del argv[qi:qi + 2]
    if len(argv) < 3:
        sys.stderr.write(__doc__)
        return 2
    out_path, shard_paths = argv[1], argv[2:]
    n = len(shard_paths)
    parsed = [read_groups(p) for p in shard_paths]
    headers = parsed[0][0]
    with open(out_path, "wb") as out:
        for h in headers:
            out.write(h)
        idx = [0] * n
        done = sum(1 for _, g in parsed if not g)
        gi = 0
        while done < n:
            s = gi % n
            if empties is not None and gi < len(empties) and empties[gi]:
                gi += 1            # empty read: emitted no group anywhere
                continue
            if idx[s] < len(parsed[s][1]):
                for line in parsed[s][1][idx[s]]:
                    out.write(line)
                idx[s] += 1
                if idx[s] == len(parsed[s][1]):
                    done += 1
            elif all(idx[j] >= len(parsed[j][1]) for j in range(n)):
                break
            gi += 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
