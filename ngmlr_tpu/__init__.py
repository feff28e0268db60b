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


def _tune_allocator():
    """Keep large allocations on the heap instead of per-allocation mmap.

    Sandboxed/virtualized hosts (including the tunneled-TPU setup this runs
    on) fault in fresh pages extremely slowly (~30 MB/s measured). glibc by
    default mmaps every allocation above 128 KB and returns it to the OS on
    free, so every large numpy buffer / device-to-host copy pays first-touch
    faults again and again. mallopt(M_MMAP_MAX, 0) + an infinite trim
    threshold makes freed pages stay warm in the heap. No-op off glibc.
    """
    try:
        import ctypes
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_MAX = -1, -4
        libc.mallopt(M_MMAP_MAX, 0)
        libc.mallopt(M_TRIM_THRESHOLD, 2 ** 30)
    except Exception:
        pass


_tune_allocator()
