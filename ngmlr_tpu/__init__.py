"""ngmlr_tpu — a TPU-native long-read DNA aligner with the capabilities of ngmlr.

A from-scratch rebuild of the structural-variant-aware long-read mapper
NextGenMap-LR (philres/ngmlr) designed TPU-first:

  * candidate scoring (the reference's SSE striped-SW filter,
    /root/reference/src/StrippedSW.cpp) is a batched ungapped-segment
    wavefront scan in JAX/Pallas,
  * the convex-gap banded alignment kernel (the reference's
    ConvexAlign/ConvexAlignFast, /root/reference/src/ConvexAlign.cpp) is a
    banded anti-diagonal wavefront scan batched over many alignments,
  * seeding uses a flat two-array k-mer index (the reference's
    CompactPrefixTable, /root/reference/src/PrefixTable.cpp) with vectorized
    diagonal-bin voting,
  * chaining / SV split logic (the reference's AlignmentBuffer,
    /root/reference/src/AlignmentBuffer.cpp) runs on the host,
  * scale-out is data parallelism over reads via jax.sharding.

Nothing is translated line-by-line from the reference; the reference defines
*what* to compute (documented per-module with file:line citations), the
implementation here is designed for XLA/TPU execution.
"""

__version__ = "0.1.0"
