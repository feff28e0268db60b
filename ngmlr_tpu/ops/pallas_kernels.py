"""Pallas TPU kernels for the two hot DP loops.

The XLA lax.scan formulations in device_engine are the semantic reference
(and remain the CPU-test / fallback path), but on the TPU their per-step
vmapped dynamic-slices cost ~10 us/wavefront — seconds per wave at 32 k
wavefronts. These kernels run the identical recurrences with all state in
VMEM:

  * convex_fill: banded convex-gap wavefront fill (ConvexAlignFast
    fwdFillMatrix semantics, /root/reference/src/ConvexAlignFast.cpp:606-774)
    producing the direction planes in HBM plus the best cell per problem,
  * convex_backtrack: reverse sweep over the direction planes emitting the
    CIGAR op stream (revBacktrack semantics, :335-433, with
    AlignmentMatrixFast::validPath),
  * score_fill: batched ungapped local-segment scores (the StrippedSW
    candidate filter, see ngmlr_tpu.ops.ungapped for the semantics proof).

Mosaic constraints shape the design (lane-dimension dynamic slices must be
128-aligned; sublane-dynamic is fine):

  * per-wavefront scalars (row window, deltas, sequence patch values) are
    [BT, K] blocks read with one-hot masked sums — never dynamic lane
    slices,
  * the two sequence windows are maintained INCREMENTALLY: per wavefront
    the window shifts by the precomputed delta (0/1) and exactly one lane
    (a static lane: 0 for the reference, L-1 for the query) is patched with
    a value prefetched in the [BT, K] patch blocks. The invariant
    rc[l] == ref[t - ymin(t) - l], qc[l] == qry[ymin(t) + l] holds for
    every in-corridor lane because ymin moves by at most 1 per wavefront,
  * direction rows accumulate in an i32 VMEM scratch (sublane-dynamic
    stores) and flush to the u8 HBM block once per K wavefronts,
  * the scoring kernel uses a transposed layout (problems on lanes,
    PT=128 per grid step) so its per-column read is a sublane-dynamic
    [1, PT] slice.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STOP, DIAG, INS, DEL = 0, 1, 2, 3
CORRIDOR_FULL, CORRIDOR_LINEAR, CORRIDOR_ENDPOINTS, CORRIDOR_ANCHORS = 0, 1, 2, 3
WALK, DONE, FAIL = 0, 1, 2

DEFAULT_BT = 8  # problems per grid step in the convex kernels (f32 sublanes)
PT = 128        # problems per grid step in the scoring kernel (lanes)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


# ---------------------------------------------------------------------------
# convex fill
# ---------------------------------------------------------------------------

def _fill_kernel(params_ref, active_ref, qry_ref, scal_ref,
                 dirs_ref, best_ref, by_ref, bx_ref,
                 s1_ref, p1d_ref, r1_ref, s2_ref, rc_ref, qc_ref,
                 bb_ref, bby_ref, bbx_ref, dirs_acc, *, L, nT, K, BT,
                 GU=8):
    tb = pl.program_id(1)
    mat = params_ref[0, 0]
    mis = params_ref[0, 1]
    go = params_ref[0, 2]
    ge = params_ref[0, 3]
    gemin = params_ref[0, 4]
    gdecay = params_ref[0, 5]
    # NS independent 8-problem sub-tiles advance together in each loop
    # iteration: the DP recurrence is a ~25-op dependency chain, so a single
    # tile is LATENCY-bound on the VPU — interleaving independent chains
    # hides it (measured ~NS-fold throughput up to NS=4)
    NS = BT // 8
    lanes = _iota((8, L), 1)
    BIG = jnp.int32(2 ** 30)

    @pl.when(tb == 0)
    def _():
        s1_ref[:] = jnp.zeros((BT, L), jnp.float32)
        p1d_ref[:] = jnp.zeros((BT, L), jnp.int32)
        r1_ref[:] = jnp.zeros((BT, L), jnp.float32)
        s2_ref[:] = jnp.zeros((BT, L), jnp.float32)
        rc_ref[:] = jnp.zeros((BT, L), jnp.int32)
        qc_ref[:] = qry_ref[:]            # window qry[0:L] (ymin = 0)
        bb_ref[:] = jnp.full((BT, L), -1.0, jnp.float32)
        bby_ref[:] = jnp.zeros((BT, L), jnp.int32)
        bbx_ref[:] = jnp.zeros((BT, L), jnp.int32)


    def shift_dn(a):                        # out[l] = a[l+1]
        r = pltpu.roll(a, L - 1, 1)
        return jnp.where(lanes == L - 1, jnp.zeros_like(a), r)

    def shift_up(a):                        # out[l] = a[l-1]
        r = pltpu.roll(a, 1, 1)
        return jnp.where(lanes == 0, jnp.zeros_like(a), r)

    def step(j, u, sub, ext, dirs_rows, carry):
        s1, p1d, r1, s2, rc, qc, best, bt, bym = carry
        t = tb * K + j
        o = sub * 8
        # ext: [6*BT(+pad), 8] transposed per-wavefront scalars, this group
        ym = ext[0 * BT + o:0 * BT + o + 8, u:u + 1]
        yx = ext[1 * BT + o:1 * BT + o + 8, u:u + 1]
        dl1 = ext[2 * BT + o:2 * BT + o + 8, u:u + 1]
        dl2 = ext[3 * BT + o:3 * BT + o + 8, u:u + 1]
        rcpatch = ext[4 * BT + o:4 * BT + o + 8, u:u + 1]
        qcpatch = ext[5 * BT + o:5 * BT + o + 8, u:u + 1]

        # incremental sequence windows (see module docstring); the patch
        # lane overwrites the roll's wrapped edge, so the bare roll needs
        # no edge masking
        d1_is1 = dl1 == 1
        rc = jnp.where(d1_is1, rc,
                       jnp.where(lanes == 0, rcpatch, pltpu.roll(rc, 1, 1)))
        qc = jnp.where(d1_is1,
                       jnp.where(lanes == L - 1, qcpatch,
                                 pltpu.roll(qc, L - 1, 1)),
                       qc)

        # lanes >= 0, so an empty window (yx < ym) is all-false already
        valid = lanes <= (yx - ym)
        eq = rc == qc

        lf_s = jnp.where(d1_is1, shift_dn(s1), s1)
        lf_d = jnp.where(d1_is1, shift_dn(p1d), p1d)
        lf_r = jnp.where(d1_is1, shift_dn(r1), r1)
        up_s = jnp.where(d1_is1, s1, shift_up(s1))
        up_d = jnp.where(d1_is1, p1d, shift_up(p1d))
        up_r = jnp.where(d1_is1, r1, shift_up(r1))
        diag_s = jnp.where(dl2 == 0, shift_up(s2),
                           jnp.where(dl2 == 1, s2, shift_dn(s2)))

        diag_cell = diag_s + jnp.where(eq, mat, mis)
        ins_ext = up_d == INS
        up_gap = jnp.minimum(gemin, ge + up_r * gdecay)
        up_cell = jnp.where(ins_ext,
                            jnp.where(up_s == 0.0, 0.0, up_s + up_gap),
                            up_s + go)
        del_ext = lf_d == DEL
        lf_gap = jnp.minimum(gemin, ge + lf_r * gdecay)
        lf_cell = jnp.where(del_ext,
                            jnp.where(lf_s == 0.0, 0.0, lf_s + lf_gap),
                            lf_s + go)

        max_cell = jnp.maximum(jnp.maximum(lf_cell, 0.0),
                               jnp.maximum(diag_cell, up_cell))
        # D-ext > I-ext > diag > D-open > I-open > STOP priority via nested
        # wheres (the nesting IS the ~c1/~c2 guard chain, without the nots)
        m_lf = max_cell == lf_cell
        m_up = max_cell == up_cell
        m_diag = max_cell == diag_cell
        e1 = del_ext & m_lf
        e2 = ins_ext & m_up
        new_d = jnp.where(e1, DEL,
                          jnp.where(e2, INS,
                                    jnp.where(m_diag, DIAG,
                                              jnp.where(m_lf, DEL,
                                                        jnp.where(m_up, INS,
                                                                  STOP))))
                          ).astype(jnp.int32)
        # run lengths carry as f32 (exact below 2^24; corridors are far
        # smaller) — saves the astype on the latency chain
        new_r = jnp.where(e1, lf_r + 1.0,
                          jnp.where(e2, up_r + 1.0,
                                    jnp.where(m_diag, 0.0,
                                              jnp.where(m_lf | m_up,
                                                        1.0, 0.0))))
        new_s = jnp.where(new_d == STOP, 0.0, max_cell)

        new_s = jnp.where(valid, new_s, 0.0)
        new_d = jnp.where(valid, new_d, 0).astype(jnp.int32)
        new_r = jnp.where(valid, new_r, 0.0)

        dirs_rows[sub][u] = new_d

        # per-lane running lex-max (score desc, y asc, x asc); the strict >
        # keeps the row-major-first cell within a lane (y grows with t on a
        # lane, and x grows at constant y), so a single cross-lane lex
        # reduction at the very end reproduces the reference's sequential
        # first-strict-maximum rule exactly. Only (t, ymin) at the update
        # are tracked; y = ym + lane and x = t - y are reconstructed in the
        # final reduction.
        cand = jnp.where(valid, new_s, -jnp.inf)
        upd = cand > best
        best = jnp.where(upd, cand, best)
        bt = jnp.where(upd, t, bt)
        bym = jnp.where(upd, ym, bym)
        return (new_s, new_d, new_r, s1, rc, qc, best, bt, bym)

    # grouped loop: 8 wavefronts per iteration so the scalar loads and the
    # direction-row store land at provably 8-aligned sublane offsets
    # (Mosaic requirement); the [8, 6*BT] scalar tile is transposed once per
    # group so each step reads a static column. Sub-tiles interleave inside
    # each wavefront iteration (see NS above).
    def group(g, carry):
        base = pl.multiple_of(g * GU, GU)
        ext = scal_ref[pl.ds(base, GU), :].T          # [sw, GU] i32
        dirs_rows = [[None] * GU for _ in range(NS)]
        for u in range(GU):
            carry = tuple(
                step(g * GU + u, u, s, ext, dirs_rows, carry[s])
                for s in range(NS))
        for s in range(NS):
            dirs_acc[s * 8:(s + 1) * 8, pl.ds(base, GU), :] = \
                jnp.stack(dirs_rows[s], axis=1)
        return carry

    is_active = active_ref[pl.program_id(0), tb] != 0

    @pl.when(is_active)
    def _():
        init = tuple(
            (s1_ref[s * 8:(s + 1) * 8, :], p1d_ref[s * 8:(s + 1) * 8, :],
             r1_ref[s * 8:(s + 1) * 8, :], s2_ref[s * 8:(s + 1) * 8, :],
             rc_ref[s * 8:(s + 1) * 8, :], qc_ref[s * 8:(s + 1) * 8, :],
             bb_ref[s * 8:(s + 1) * 8, :], bby_ref[s * 8:(s + 1) * 8, :],
             bbx_ref[s * 8:(s + 1) * 8, :])
            for s in range(NS))
        out = jax.lax.fori_loop(0, K // GU, group, init)
        for s in range(NS):
            (s1_ref[s * 8:(s + 1) * 8, :], p1d_ref[s * 8:(s + 1) * 8, :],
             r1_ref[s * 8:(s + 1) * 8, :], s2_ref[s * 8:(s + 1) * 8, :],
             rc_ref[s * 8:(s + 1) * 8, :], qc_ref[s * 8:(s + 1) * 8, :],
             bb_ref[s * 8:(s + 1) * 8, :], bby_ref[s * 8:(s + 1) * 8, :],
             bbx_ref[s * 8:(s + 1) * 8, :]) = out[s]
        dirs_ref[:] = dirs_acc[:].astype(jnp.uint8)

    @pl.when(jnp.logical_not(is_active))
    def _():
        # past every problem's last nonempty wavefront — nothing can change
        dirs_ref[:] = jnp.zeros_like(dirs_ref)

    @pl.when(tb == nT - 1)
    def _():
        # bby/bbx hold (t, ymin) at each lane's best; reconstruct y/x
        bl_s, bl_t, bl_ym = bb_ref[:], bby_ref[:], bbx_ref[:]
        lanesB = _iota((BT, L), 1)
        bl_y = bl_ym + lanesB
        bl_x = bl_t - bl_y
        m = jnp.max(bl_s, axis=1, keepdims=True)
        is_m = bl_s == m
        y_min = jnp.min(jnp.where(is_m, bl_y, BIG), axis=1, keepdims=True)
        x_min = jnp.min(jnp.where(is_m & (bl_y == y_min), bl_x, BIG),
                        axis=1, keepdims=True)
        best_ref[:] = m
        by_ref[:] = y_min
        bx_ref[:] = x_min


def convex_fill(params, qry0, ymin, ymax, d1, d2, rcpatch, qcpatch,
                L: int, K: int = 256, BT: int = 8, GU: int = 8):
    """params f32 [8]; qry0 i32 [B, L] = first L query codes (the t=0
    incremental window; the rest of the query enters via qcpatch);
    ymin/ymax/d1/d2/rcpatch/qcpatch i32 [B, TpP] (TpP multiple of K);
    d1[t]=ymin[t]-ymin[t-1] with ymin[-1]:=0, d2 likewise over two steps.
    Returns (dirs u8 [B, TpP, L], best f32 [B,1], by i32 [B,1],
    bx i32 [B,1])."""
    B, TpP = ymin.shape
    nB = B // BT
    nT = TpP // K
    grid = (nB, nT)

    # transposed per-wavefront scalar pack, padded to 128 lanes per b-tile:
    # col = btile*128 + arr*BT + b
    scal = jnp.stack([ymin, ymax, d1, d2, rcpatch, qcpatch], axis=0)
    scal = scal.reshape(6, nB, BT, TpP).transpose(3, 1, 0, 2)
    sw = (6 * BT + 127) // 128 * 128
    scal = scal.reshape(TpP, nB, 6 * BT)
    scal = jnp.pad(scal, ((0, 0), (0, 0), (0, sw - 6 * BT)))
    scal = scal.reshape(TpP, nB * sw)

    def b_spec(width):
        return pl.BlockSpec((BT, width), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM)

    # per-(tile, block) activity: the last nonempty wavefront of a problem
    # is max_y(key_hi) - 1, which ymax encodes as its last index of change;
    # cheaper: a block is active iff any problem has ymin <= ymax inside it.
    # Trailing blocks are all-empty for every problem, and emptiness is
    # contiguous at the tail (windows never resume after max key_hi).
    any_valid = (ymin <= ymax).reshape(nB, BT, nT, K).any(axis=(1, 3))
    # force monotone-trailing semantics: active until the last active block
    last_active = (nT - 1) - jnp.argmax(any_valid[:, ::-1], axis=1)
    active = (jnp.arange(nT, dtype=jnp.int32)[None, :]
              <= last_active[:, None]).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_fill_kernel, L=L, nT=nT, K=K, BT=BT, GU=GU),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda b, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # full activity table
            b_spec(L),
            pl.BlockSpec((K, sw), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, K, L), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            b_spec(1), b_spec(1), b_spec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, TpP, L), jnp.uint8),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, L), jnp.float32),
            pltpu.VMEM((BT, L), jnp.int32),
            pltpu.VMEM((BT, L), jnp.float32),
            pltpu.VMEM((BT, L), jnp.float32),
            pltpu.VMEM((BT, L), jnp.int32),
            pltpu.VMEM((BT, L), jnp.int32),
            pltpu.VMEM((BT, L), jnp.float32),
            pltpu.VMEM((BT, L), jnp.int32),
            pltpu.VMEM((BT, L), jnp.int32),
            pltpu.VMEM((BT, K, L), jnp.int32),
        ],
    )(params.reshape(1, 8), active, qry0, scal)
    return out


# ---------------------------------------------------------------------------
# backtrack
# ---------------------------------------------------------------------------

def _bt_kernel(dirs_ref, ymin_ref, bx_ref, by_ref, mode_ref, ci_ref,
               width_ref, cf_ref,
               ops_ref, sx_ref, sy_ref, st_ref,
               x_s, y_s, state_s, stx_s, sty_s, *, L, nT, K, BT,
               GU=8):
    tb = pl.program_id(1)          # 0 = highest wavefront block
    NS = BT // 8                   # independent sub-tiles (latency hiding)
    lanes = _iota((8, L), 1)
    cols = _iota((8, K), 1)

    @pl.when(tb == 0)
    def _():
        x_s[:] = bx_ref[:]
        y_s[:] = by_ref[:]
        state_s[:] = jnp.where(by_ref[:] > 0, WALK, FAIL)
        stx_s[:] = jnp.full((BT, 1), -1, jnp.int32)
        sty_s[:] = jnp.full((BT, 1), -1, jnp.int32)

    blk = nT - 1 - tb              # actual wavefront block index

    def offs_at(yv, sub):
        sl = slice(sub * 8, sub * 8 + 8)
        mode = mode_ref[sl, :]
        ci = ci_ref[sl, :]
        k_f = cf_ref[sl, 0:1]
        d_f = cf_ref[sl, 1:2]
        yf = yv.astype(jnp.float32)
        full = ci.astype(jnp.float32)
        linear = (yv - ci).astype(jnp.float32)
        endpoints = jnp.trunc((yf - d_f) / k_f)
        anchors = jnp.trunc(yf / k_f - d_f)
        return jnp.where(mode == CORRIDOR_FULL, full,
                         jnp.where(mode == CORRIDOR_LINEAR, linear,
                                   jnp.where(mode == CORRIDOR_ENDPOINTS,
                                             endpoints, anchors)))

    def step(jj, sub, dirs_row, carry):
        x, y, state, sx, sy, ops = carry
        sl = slice(sub * 8, sub * 8 + 8)
        width_f = width_ref[sl, :].astype(jnp.float32)
        t = blk * K + jj
        oh = cols == jj
        ym = jnp.sum(jnp.where(oh, ymin_ref[sl, :], 0), axis=1,
                     keepdims=True)
        here = (state == WALK) & ((x + y) == t)
        lane = y - ym
        d = jnp.max(jnp.where((lanes == lane) & here, dirs_row, 0),
                    axis=1, keepdims=True)                  # [BT, 1]

        stop_now = here & (d == STOP)
        # validPath (AlignmentMatrixFast.cpp:213-220), f32 truncation kept
        o = offs_at(y, sub)
        min_c = jnp.trunc(o + jnp.float32(0.1) * width_f).astype(jnp.int32)
        max_c = jnp.trunc(min_c.astype(jnp.float32) + width_f
                          - jnp.float32(0.1) * width_f).astype(jnp.int32)
        ok_path = (x > min_c) & (x < max_c)
        bad = here & (~stop_now) & (~ok_path)
        emit = jnp.where(here & (~stop_now) & (~bad), d, 0)

        nx = x - (emit == DIAG).astype(jnp.int32) - (emit == DEL).astype(jnp.int32)
        ny = y - (emit == DIAG).astype(jnp.int32) - (emit == INS).astype(jnp.int32)
        off_matrix = (emit != 0) & ((nx < 0) | (ny < 0))

        sx = jnp.where(stop_now | off_matrix, nx, sx)
        sy = jnp.where(stop_now | off_matrix, ny, sy)
        state = jnp.where(stop_now | off_matrix, DONE,
                          jnp.where(bad, FAIL, state))
        ops = jnp.where(oh, emit, ops)
        return (nx, ny, state, sx, sy, ops)

    # grouped loop: load 8 direction rows per iteration at an 8-aligned
    # sublane offset, walk them in descending wavefront order; sub-tiles
    # interleave per row (the walk is a pure dependency chain -> latency
    # hiding, see the fill kernel)
    def group(gi, carry):
        g = (K // GU - 1) - gi
        base = pl.multiple_of(g * GU, GU)
        tile = dirs_ref[:, pl.ds(base, GU), :].astype(jnp.int32)  # [BT, GU, L]
        for u in range(GU - 1, -1, -1):
            carry = tuple(
                step(g * GU + u, s, tile[s * 8:(s + 1) * 8, u, :], carry[s])
                for s in range(NS))
        return carry

    # skip blocks no walk can touch: every problem is either finished or
    # still above this block's wavefront range (x+y only decreases)
    t0 = blk * K
    can_act = jnp.max(jnp.where(state_s[:] == WALK, x_s[:] + y_s[:], -1)) >= t0

    @pl.when(can_act)
    def _():
        init = tuple(
            (x_s[s * 8:(s + 1) * 8, :], y_s[s * 8:(s + 1) * 8, :],
             state_s[s * 8:(s + 1) * 8, :], stx_s[s * 8:(s + 1) * 8, :],
             sty_s[s * 8:(s + 1) * 8, :], jnp.zeros((8, K), jnp.int32))
            for s in range(NS))
        out = jax.lax.fori_loop(0, K // GU, group, init)
        for s in range(NS):
            (x_s[s * 8:(s + 1) * 8, :], y_s[s * 8:(s + 1) * 8, :],
             state_s[s * 8:(s + 1) * 8, :], stx_s[s * 8:(s + 1) * 8, :],
             sty_s[s * 8:(s + 1) * 8, :]) = out[s][:5]
            ops_ref[s * 8:(s + 1) * 8, :] = out[s][5]

    @pl.when(jnp.logical_not(can_act))
    def _():
        ops_ref[:] = jnp.zeros_like(ops_ref)

    @pl.when(tb == nT - 1)
    def _():
        sx_ref[:] = stx_s[:]
        sy_ref[:] = sty_s[:]
        st_ref[:] = state_s[:]


def convex_backtrack(dirs, ymin, bx, by, mode, ci, width, cf,
                     L: int, K: int = 256, BT: int = 8, GU: int = 8):
    """dirs u8 [B, TpP, L]; ymin i32 [B, TpP]; bx/by/mode/ci/width i32
    [B,1]; cf f32 [B,2]. Returns (ops i32 [B, TpP], sx, sy, state i32
    [B,1])."""
    B, TpP = ymin.shape
    nB = B // BT
    nT = TpP // K
    grid = (nB, nT)

    def scalar_spec(n):
        return pl.BlockSpec((BT, n), lambda b, t: (b, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_bt_kernel, L=L, nT=nT, K=K, BT=BT, GU=GU),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BT, K, L), lambda b, t, _n=nT: (b, _n - 1 - t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, K), lambda b, t, _n=nT: (b, _n - 1 - t),
                         memory_space=pltpu.VMEM),
            scalar_spec(1), scalar_spec(1), scalar_spec(1), scalar_spec(1),
            scalar_spec(1), scalar_spec(2),
        ],
        out_specs=[
            pl.BlockSpec((BT, K), lambda b, t, _n=nT: (b, _n - 1 - t),
                         memory_space=pltpu.VMEM),
            scalar_spec(1), scalar_spec(1), scalar_spec(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, TpP), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BT, 1), jnp.int32),
            pltpu.VMEM((BT, 1), jnp.int32),
            pltpu.VMEM((BT, 1), jnp.int32),
            pltpu.VMEM((BT, 1), jnp.int32),
            pltpu.VMEM((BT, 1), jnp.int32),
        ],
    )(dirs, ymin, bx, by, mode, ci, width, cf)
    return out


# ---------------------------------------------------------------------------
# corridor windows (ymin/ymax per wavefront)
# ---------------------------------------------------------------------------

def _cw_kernel(scal_ref, ymin_ref, ymax_ref, ym_s, yx_s, *, K, GU):
    """Per-wavefront corridor row windows by monotone pointer advance.

    ymin[t] = #{y < H : y + hi(y) <= t} and ymax[t] = #{y < H :
    y + lo(y) <= t} - 1 (the count_leq identities in
    device_engine._convex_kernel). Both key sequences are strictly
    increasing in y (offs is non-decreasing, +y strictly increases), so
    each count advances by 0 or 1 per wavefront — a serial pointer walk
    with 128 problems on lanes replaces two [B, Hp]-index scatter
    histograms (~30 ms each per launch on this backend).

    scal_ref [8, 128]: rows (mode, ci, width, W, H, k bits, d bits, -).
    Outputs transposed [K, 128] blocks (t on sublanes: 8-aligned stores).
    """
    tb = pl.program_id(1)
    BIG = jnp.int32(2 ** 30)
    mode = scal_ref[0:1, :]
    ci = scal_ref[1:2, :]
    width = scal_ref[2:3, :]
    W = scal_ref[3:4, :]
    H = scal_ref[4:5, :]
    k_f = jax.lax.bitcast_convert_type(scal_ref[5:6, :], jnp.float32)
    d_f = jax.lax.bitcast_convert_type(scal_ref[6:7, :], jnp.float32)

    @pl.when(tb == 0)
    def _():
        ym_s[:] = jnp.zeros_like(ym_s)
        yx_s[:] = jnp.zeros_like(yx_s)

    def offs(y):
        yf = y.astype(jnp.float32)
        endpoints = jnp.trunc((yf - d_f) / k_f).astype(jnp.int32)
        anchors = jnp.trunc(yf / k_f - d_f).astype(jnp.int32)
        return jnp.where(mode == CORRIDOR_FULL, ci,
                         jnp.where(mode == CORRIDOR_LINEAR, y - ci,
                                   jnp.where(mode == CORRIDOR_ENDPOINTS,
                                             endpoints, anchors)))

    def key_at(y, add_width):
        o = offs(y)
        lo = jnp.clip(o, 0, W)
        if add_width:
            # hi = max(clip(o + width), lo): matches the count_leq twin's
            # clamp so width <= 0 rows yield empty windows, not inverted
            # ones (the generators keep width >= 0, but free to guard)
            lo = jnp.maximum(jnp.clip(o + width, 0, W), lo)
        return jnp.where(y < H, y + lo, BIG)

    def group(g, carry):
        ym, yx = carry
        mn = []
        mx = []
        for u in range(GU):
            t = tb * K + g * GU + u
            ym = ym + (key_at(ym, True) <= t).astype(jnp.int32)
            yx = yx + (key_at(yx, False) <= t).astype(jnp.int32)
            mn.append(ym)
            mx.append(yx - 1)
        base = pl.multiple_of(g * GU, GU)
        ymin_ref[pl.ds(base, GU), :] = jnp.concatenate(mn, axis=0)
        ymax_ref[pl.ds(base, GU), :] = jnp.concatenate(mx, axis=0)
        return ym, yx

    ym, yx = jax.lax.fori_loop(0, K // GU, group, (ym_s[:], yx_s[:]))
    ym_s[:] = ym
    yx_s[:] = yx


def corridor_windows(scal, TpP: int, K: int = 512, GU: int = 8,
                     interpret: bool = False):
    """scal i32 [8, Bp] (Bp multiple of 128) as in _cw_kernel; returns
    (ymin [TpP, Bp], ymax [TpP, Bp]) transposed i32."""
    Bp = scal.shape[1]
    grid = (Bp // 128, TpP // K)
    return pl.pallas_call(
        functools.partial(_cw_kernel, K=K, GU=GU),
        grid=grid,
        interpret=interpret,
        in_specs=[pl.BlockSpec((8, 128), lambda b, t: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((K, 128), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), lambda b, t: (t, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((TpP, Bp), jnp.int32),
            jax.ShapeDtypeStruct((TpP, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
    )(scal)


# ---------------------------------------------------------------------------
# ragged vote expansion (device-search v2)
# ---------------------------------------------------------------------------

def _expand_kernel(bnd_ref, dd_ref, dc_ref, v0_ref,
                   d2t_out, ct_out, slot_out, *, KT, SLP):
    """Telescoping compare-accumulate expansion of per-slot values to the
    per-vote [L, B] layout (device_search v2).

    For vote l of a subread (lane), its k-mer slot is
    slot(l) = #{j : bnd[j] <= l} (bnd = exclusive slot-boundary cumsum,
    strictly the inclusive cumsum shifted by one), and any per-slot value
    expands as val(l) = val[0] + sum_j (bnd[j] <= l) * dval[j] — so three
    int32 accumulators over one SLP-step loop replace device_search v1's
    NV-sized jnp.repeat (binary-search gather) + packed row gather
    (~140 ms per 2^22 votes measured vs ~20 ms here). Exact: int32 adds.

    bnd/dd/dc are [SLP, 128] blocks (row lanes), v0 [8, 128] carries
    (d2t[0], ct[0]); outputs are [KT, 128] tiles of the transposed
    [L, B] planes (votes on sublanes — the cw-kernel layout).
    """
    t = pl.program_id(1)
    lrow = _iota((KT, 128), 0) + t * KT

    def body(j, carry):
        s_acc, d_acc, c_acc = carry
        bj = bnd_ref[pl.ds(j, 1), :]                    # [1, 128]
        m = bj <= lrow                                  # [KT, 128]
        s_acc = s_acc + m.astype(jnp.int32)
        d_acc = d_acc + jnp.where(m, dd_ref[pl.ds(j, 1), :], 0)
        c_acc = c_acc + jnp.where(m, dc_ref[pl.ds(j, 1), :], 0)
        return s_acc, d_acc, c_acc

    z = jnp.zeros((KT, 128), jnp.int32)
    s, d, c = jax.lax.fori_loop(0, SLP, body, (z, z, z))
    slot_out[:] = s
    d2t_out[:] = d + v0_ref[0:1, :]
    ct_out[:] = c + v0_ref[1:2, :]


def expand_votes(bnd, dd, dc, v0, L: int, KT: int = 256,
                 interpret: bool = False):
    """bnd/dd/dc i32 [SLP, Bp] (Bp multiple of 128), v0 i32 [8, Bp];
    returns (slot, d2t, ct) i32 [L, Bp] transposed vote planes."""
    SLP, Bp = bnd.shape
    grid = (Bp // 128, L // KT)
    tab_spec = pl.BlockSpec((SLP, 128), lambda b, t: (0, b),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((KT, 128), lambda b, t: (t, b),
                            memory_space=pltpu.VMEM)
    d2t, ct, slot = pl.pallas_call(
        functools.partial(_expand_kernel, KT=KT, SLP=SLP),
        grid=grid,
        interpret=interpret,
        in_specs=[tab_spec, tab_spec, tab_spec,
                  pl.BlockSpec((8, 128), lambda b, t: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((L, Bp), jnp.int32),
            jax.ShapeDtypeStruct((L, Bp), jnp.int32),
            jax.ShapeDtypeStruct((L, Bp), jnp.int32),
        ],
    )(bnd, dd, dc, v0)
    return slot, d2t, ct


# ---------------------------------------------------------------------------
# ungapped scoring (transposed layout: problems on lanes)
# ---------------------------------------------------------------------------

def _score_kernel(ref_ref, qry_ref, best_ref, *, Rp, Qp, pt=PT):
    q = qry_ref[:]                                   # [Qp, pt] i32
    q_ok = q < 4
    row0 = _iota((Qp, pt), 0) == 0

    def step(rc, carry):
        h, best_h = carry
        s = jnp.where((q == rc) & q_ok, 1,
                      jnp.where(q_ok & (rc < 4), -1, 0))
        h_shift = jnp.where(row0, 0, pltpu.roll(h, 1, 0))
        h = jnp.maximum(h_shift + s, 0)
        return (h, jnp.maximum(best_h, h))

    def group(g, carry):
        base = pl.multiple_of(g * 8, 8)
        tile = ref_ref[pl.ds(base, 8), :]            # [8, PT]
        for u in range(8):
            carry = step(tile[u:u + 1, :], carry)
        return carry

    h0 = jnp.zeros((Qp, pt), jnp.int32)
    _, best_h = jax.lax.fori_loop(0, Rp // 8, group, (h0, h0))
    best_ref[:] = jnp.max(best_h, axis=0, keepdims=True)


def score_fill(ref_t, qry_t, pt: int = PT):
    """ref_t/qry_t i32 [Rp, P]/[Qp, P] (transposed, P multiple of pt).
    Returns i32 [1, P]. `pt` = problems (lanes) per grid step — wider
    tiles amortize the per-column loop overhead across more vregs."""
    Rp, P = ref_t.shape
    Qp = qry_t.shape[0]
    grid = (P // pt,)
    return pl.pallas_call(
        functools.partial(_score_kernel, Rp=Rp, Qp=Qp, pt=pt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Rp, pt), lambda p: (0, p), memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, pt), lambda p: (0, p), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pt), lambda p: (0, p),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P), jnp.int32),
    )(ref_t, qry_t)
