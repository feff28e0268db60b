"""Read intake: parsing, subread splitting, read-ID assignment.

Rebuild of ReadProvider (/root/reference/src/ReadProvider.cpp) and the batch
intake in NGM (/root/reference/src/NGM.cpp:190-246):

  * reads longer than read_part_length (256) are split into
    floor(len/256) non-overlapping 256-base subreads taken from the start of
    the read; the < 256-base tail is not covered by any subread
    (ReadProvider.cpp:57-134),
  * reads of length <= 256 go through the short-read path un-split,
  * read IDs advance by idJump=2000 per input read, reserving ID space for
    subreads (NGM.cpp:208-232); subread i gets parent_id + i,
  * empty-sequence records are parsed but silently discarded downstream
    (IParser.h:79-84, GenericReadWriter.h:98-100).
"""

from dataclasses import dataclass, field
from typing import Iterator, List, Optional

from .fastx import FastxRecord, parse_fastx, reverse_complement

ID_JUMP = 2000  # NGM.cpp:208


@dataclass
class Read:
    """A full input read (the reference's MappedRead for the full read)."""
    read_id: int
    name: bytes
    seq: bytes
    qual: Optional[bytes]
    empty: bool = False

    _rev: Optional[bytes] = field(default=None, repr=False)

    @property
    def length(self) -> int:
        return len(self.seq)

    @property
    def rev_seq(self) -> bytes:
        if self._rev is None:
            self._rev = reverse_complement(self.seq)
        return self._rev

    def subread_count(self, part_length: int = 256) -> int:
        """ReadProvider.cpp:60 — floor split; 0 means 'short read path'."""
        if self.length <= part_length:
            return 0
        return self.length // part_length

    def subread_seq(self, i: int, part_length: int = 256) -> bytes:
        return self.seq[i * part_length:(i + 1) * part_length]


def read_stream(path: str, start_id: int = 0) -> Iterator[Read]:
    rid = start_id
    for rec in parse_fastx(path):
        yield Read(rid, rec.name, rec.seq, rec.qual, empty=rec.empty)
        rid += ID_JUMP


def read_batches(path: str, batch_reads: int) -> Iterator[List[Read]]:
    batch: List[Read] = []
    for read in read_stream(path):
        batch.append(read)
        if len(batch) >= batch_reads:
            yield batch
            batch = []
    if batch:
        yield batch
