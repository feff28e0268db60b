"""Batched ungapped local-segment scorer (the candidate-scoring kernel).

The reference scores every (subread, candidate window) pair with the vendored
striped Smith-Waterman library (StrippedSW/ssw, /root/reference/src/
StrippedSW.cpp:118-160). StrippedSW passes gap penalties of -1 into
ssw_align's **uint8** weight parameters (StrippedSW.h:20-21 →
ssw.h:117-118) — i.e. penalty 255 per gap position. With 266-base subreads
the maximum attainable score is < 255, so a gapped path can never win:
the computed score is exactly the best *ungapped* local segment score

    H(i,j) = max(0, H(i-1,j-1) + s(ref_i, qry_j)),   score = max H

with s = +1 match, -1 mismatch, 0 whenever either side is not ACGT
(nt_table maps everything else to code 4 and the matrix row/col 4 is all
zero, StrippedSW.cpp:111-116, StrippedSW.h:24-39).

That recurrence is a single wavefront scan with no in-row dependency — ideal
for the TPU VPU: a lax.scan over reference positions carrying an
[batch, qry_len] H plane. This file provides the JAX kernel plus a numpy
twin used for cross-checking.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

# nt codes: A=0,C=1,G=2,T=3, other=4 (ssw nt_table order; only equality and
# the "is ACGT" property matter)
_NT = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate(b"ACGT"):
    _NT[_c] = _i
    _NT[_c + 32] = _i

MAX_SEQ_LEN = 100000  # StrippedSW.h:87


def nt_codes(seq: bytes) -> np.ndarray:
    return _NT[np.frombuffer(seq, dtype=np.uint8)]


def score_pair_numpy(ref: bytes, qry: bytes) -> float:
    """Single-pair twin of the kernel (plus ssw's maxSeqLen guard)."""
    if len(ref) + 1 >= MAX_SEQ_LEN or len(qry) + 1 >= MAX_SEQ_LEN:
        return -1.0
    r = nt_codes(ref).astype(np.int32)
    q = nt_codes(qry).astype(np.int32)
    h = np.zeros(len(q) + 1, dtype=np.int32)
    best = 0
    for rc in r:
        s = np.where((q == rc) & (q < 4), 1, np.where((q < 4) & (rc < 4), -1, 0))
        h[1:] = np.maximum(h[:-1] + s, 0)
        h[0] = 0
        m = h.max()
        if m > best:
            best = int(m)
    return float(best)


@functools.partial(jax.jit, static_argnames=("unroll",))
def score_batch_kernel(ref_codes: jnp.ndarray, qry_codes: jnp.ndarray,
                       unroll: int = 8) -> jnp.ndarray:
    """Scores for [B, R] x [B, Q] uint8 nt-code batches (pad with code 4).

    Padding code 4 scores 0 against everything, which cannot change a local
    maximum. Returns float32 [B].
    """
    B, R = ref_codes.shape
    q = qry_codes.astype(jnp.int32)           # [B, Q]
    q_is_acgt = q < 4

    def step(carry, ref_col):
        h, best = carry                        # h: [B, Q], best: [B]
        rc = ref_col.astype(jnp.int32)[:, None]   # [B, 1]
        s = jnp.where((q == rc) & q_is_acgt, 1,
                      jnp.where(q_is_acgt & (rc < 4), -1, 0))
        h_shift = jnp.pad(h[:, :-1], ((0, 0), (1, 0)))
        h_new = jnp.maximum(h_shift + s, 0)
        best = jnp.maximum(best, h_new.max(axis=1))
        return (h_new, best), None

    h0 = jnp.zeros(q.shape, dtype=jnp.int32)
    best0 = jnp.zeros((B,), dtype=jnp.int32)
    (_, best), _ = jax.lax.scan(step, (h0, best0), ref_codes.T, unroll=unroll)
    return best.astype(jnp.float32)


def _round_pow2(x: int, lo: int) -> int:
    v = lo
    while v < x:
        v *= 2
    return v


def score_batch(refs, qrys) -> np.ndarray:
    """Score a python list of (ref bytes, qry bytes) with padding + guard.

    Shapes are padded to power-of-two buckets so repeated calls reuse the
    compiled kernel."""
    assert len(refs) == len(qrys)
    n = len(refs)
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    maxr = _round_pow2(max(len(r) for r in refs), 64)
    maxq = _round_pow2(max(len(q) for q in qrys), 64)
    npad = _round_pow2(n, 8)
    rc = np.full((npad, maxr), 4, dtype=np.uint8)
    qc = np.full((npad, maxq), 4, dtype=np.uint8)
    for i, (r, q) in enumerate(zip(refs, qrys)):
        rc[i, :len(r)] = nt_codes(r)
        qc[i, :len(q)] = nt_codes(q)
    out = np.asarray(score_batch_kernel(jnp.asarray(rc), jnp.asarray(qc)))[:n]
    # ssw maxSeqLen guard (StrippedSW.cpp:133-134)
    for i, (r, q) in enumerate(zip(refs, qrys)):
        if len(r) + 1 >= MAX_SEQ_LEN or len(q) + 1 >= MAX_SEQ_LEN:
            out[i] = -1.0
    return out
