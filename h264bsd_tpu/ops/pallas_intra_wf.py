"""Wavefront-batched Pallas TPU intra-prediction pass.

The raster intra kernel (ops.pallas_intra) walks intra MBs ONE at a
time; on an all-intra 1080p frame its 8160 sequential MB bodies cost
~29 ms — 60% of the I-frame budget and the single largest per-frame
item left in the decode. This kernel batches G same-anti-diagonal MBs
per step, exactly like the wavefront deblocker (ops.pallas_deblock_wf):

Validity: intra MB (r, c) predicts from the RECONSTRUCTED pels of its
A/B/C/D neighbours (left, above, above-right, above-left — reference
h264bsd_intra_prediction.c:478-533), at anti-diagonals w-1 / w-2 / w-1 /
w-3 of w = 2r + c. MBs on the same anti-diagonal are separated by
(+1 row, -2 cols): MB (r+1, c-2) writes columns <= 16c-17, disjoint
from everything (r, c) reads (its region starts at column 16c-1), so a
wavefront schedule over w reproduces the sequential raster decode
bit-exactly. Within an MB the 16 intra-4x4 blocks stay sequential
(zigzag order, reference :701-833) — the inner loop is unrolled with
static offsets and runs ONCE per group on (rows, 32*G)-lane tiles.

Batching layout (sheared scratch, shared with the deblocker): each
16-pel row band b is stored shifted right by 32b, so a group's slots
share one column window and the whole group costs one load and one
read-modify-write store. Slot m's 32-lane piece holds region column j
(frame column 16c-1+j) at lane 32m+j; the above-neighbour row rides at
shear offset -32 (band r-1). All prediction-mode math is expressed as
static lane rolls + masked selects over a composite EDGE vector E
(left-column pels mirrored to the lanes left of the corner), which
collapses the directional modes to one 3-tap filter D = (E<<1 + 2E +
E>>1 + 2) >> 2 and two half-pel averages evaluated once per block.
Per-block mode/availability arrive as slot-broadcast lane maps (like
the deblocker's packed parameter maps), so the kernel never extracts
per-slot scalars inside the block loop.

Frame-border neighbour reads follow ops.pallas_intra: the scratch edge-
replicates the top frame row (at band -1's shear offset) and each
band's left column; out-of-frame lanes only feed unavailable-neighbour
paths that the mode selects never take on conformant streams.

Parity vs ops.intra.intra_pass is pinned by tests/test_pallas_intra.py
(interpreter mode) and the on-TPU bench verification pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intra import BLOCK_X, BLOCK_Y, ZIG2RAS
from .pallas_deblock_wf import (G, PLS, _round128, _wavefront_arrange,
                                _wavefront_layout)
from .pallas_util import lane_roll_narrow

LN = 32 * G
SM = 3 * G
GC = 8          # groups per grid step
PT = 8


def _lsh(x, k):
    if k == 0:
        return x
    return jnp.concatenate([x[:, k:], x[:, :k]], axis=1)


def _rsh(x, k):
    if k == 0:
        return x
    return jnp.concatenate([x[:, -k:], x[:, :-k]], axis=1)


def _lane(rows):
    return lax.broadcasted_iota(jnp.int32, (rows, LN), 1) % 32


def _mask_eq(rows, j):
    return _lane(rows) == j


def _mask_rng(rows, lo, hi):
    m = _lane(rows)
    return (m >= lo) & (m < hi)


def _clip8(x):
    return jnp.clip(x, 0, 255)


def _spread_from(v, lane0, width):
    """(rows, LN): per 32-lane slot, broadcast the value at lane `lane0`
    onto lanes [lane0+1, lane0+width]; other lanes are zero. Values move
    rightward only, so slots never contaminate each other (the doubling
    may overshoot `width`; the final mask trims it)."""
    v = jnp.where(_mask_eq(v.shape[0], lane0), v, 0)
    k = 1
    while k < width + 1:
        v = v + _rsh(v, k)
        k *= 2
    return jnp.where(_mask_rng(v.shape[0], lane0 + 1, lane0 + width + 1),
                     v, 0)


def _spread16(v, lane0):
    """Exact 16-lane spread: value at lane0 broadcast to lanes
    lane0+1..lane0+16 (doubling rolls: 1, 2, 4, 8, then one more for the
    16th lane)."""
    rows = v.shape[0]
    v = jnp.where(_mask_eq(rows, lane0), v, 0)
    for k in (1, 2, 4, 8):
        v = v + _rsh(v, k)          # lanes lane0..lane0+15 covered
    v = v + jnp.where(_mask_eq(rows, lane0 + 16), _rsh(v, 16), 0)
    return jnp.where(_mask_rng(rows, lane0 + 1, lane0 + 17), v, 0)


def _reduce_to(v, lo, hi, dst):
    """(rows, LN): per slot, sum lanes [lo, hi) and leave the sum at lane
    `dst`; other lanes garbage. Left rolls only (values move leftward
    within the slot; the next slot's values land at lanes > hi)."""
    rows = v.shape[0]
    v = jnp.where(_mask_rng(rows, lo, hi), v, 0)
    span = hi - lo
    k = 1
    while k < span:
        v = v + _lsh(v, k)
        k *= 2
    # lane lo now holds the full sum; move it to dst (_lsh moves values
    # toward LOWER lanes, _rsh toward higher)
    if dst < lo:
        v = _lsh(v, lo - dst)
    elif dst > lo:
        v = _rsh(v, dst - lo)
    return v



def _rowsum(x):
    """Sublane reduction (rows, LN) -> (1, LN) by halving adds (Mosaic
    aborts on jnp.sum(axis=0) over these tiles)."""
    r = x.shape[0]
    while r > 1:
        half = r // 2
        x = x[0:half] + x[half:2 * half] if r % 2 == 0 else \
            jnp.concatenate([x[0:1], jnp.zeros((0, LN), x.dtype)]) + x
        if r % 2 != 0:
            raise ValueError("odd row count")
        r = half
    return x


def _h2(x, y):
    return (x + y + 1) >> 1


def _m3(x, y, z):
    return (x + 2 * y + z + 2) >> 2


def _roll(x, amt):
    """Signed static lane roll: positive moves values toward HIGHER
    lanes (_rsh), negative toward lower (_lsh)."""
    if amt > 0:
        return _rsh(x, amt)
    if amt < 0:
        return _lsh(x, -amt)
    return x


def _intra_wf_kernel(smeta_ref, bmap_ref, y_in, cb_in, cr_in, rl_ref,
                     rc_ref, y_out, cb_out, cr_out, sy, scb, scr, *,
                     H, W, hm, wm):
    Hc, Wc = H // 2, W // 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    RL = 16 * G + 8   # luma load rows (8 above-band + 16G)
    RC = 8 * G + 8

    @pl.when(step == 0)
    def _():
        for b in range(hm):
            sy[pl.ds(PT + 16 * b, 16), pl.ds(PLS + 32 * b, W)] = \
                y_in[pl.ds(16 * b, 16), :]
            scb[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, Wc)] = \
                cb_in[pl.ds(8 * b, 8), :]
            scr[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, Wc)] = \
                cr_in[pl.ds(8 * b, 8), :]
        # top frame row replicated at virtual band -1's shear offset
        sy[pl.ds(PT - 1, 1), pl.ds(PLS - 32, W)] = \
            sy[pl.ds(PT, 1), pl.ds(PLS, W)]
        scb[pl.ds(PT - 1, 1), pl.ds(PLS - 16, Wc)] = \
            scb[pl.ds(PT, 1), pl.ds(PLS, Wc)]
        scr[pl.ds(PT - 1, 1), pl.ds(PLS - 16, Wc)] = \
            scr[pl.ds(PT, 1), pl.ds(PLS, Wc)]
        # per-band left-column replication (frame column -1)
        for b in range(hm):
            sy[pl.ds(PT + 16 * b, 16), pl.ds(PLS + 32 * b - 1, 1)] = \
                sy[pl.ds(PT + 16 * b, 16), pl.ds(PLS + 32 * b, 1)]
            scb[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b - 1, 1)] = \
                scb[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, 1)]
            scr[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b - 1, 1)] = \
                scr[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, 1)]

    def group_body(k, _):
        @pl.when(smeta_ref[k, SM] != 0)
        def _():
            r0 = smeta_ref[k, SM + 1]
            c0 = smeta_ref[k, SM + 2]
            flags = bmap_ref[k, 16:17]           # (1, LN) slot-broadcast
            is_i4v = (flags >> 8) & 1
            is_intrav = (flags >> 9) & 1
            lastcol = (flags >> 10) & 1
            i16m = (flags >> 0) & 3
            chrm = (flags >> 2) & 3
            mbav = (flags >> 4) & 15

            # ---- load the group's sheared luma window ----
            ly = pl.multiple_of(r0 * 16, 8)
            lbase = c0 * 16 + r0 * 32 + PLS - 33
            lba = pl.multiple_of((lbase // 128) * 128, 128)
            d = lbase - lba
            L = lane_roll_narrow(sy[pl.ds(ly, RL), pl.ds(lba, 256)], -d)
            L32 = lane_roll_narrow(L, -32)
            parts = []
            for m in range(G):
                parts.append(jnp.concatenate(
                    [L[16 * m:16 * m + 8, 0:32],
                     L32[16 * m + 8:16 * m + 24, 0:32]], axis=0))
            regs0 = jnp.concatenate(parts, axis=1).astype(jnp.int32)
            # region col j of slot m at lane 32m+j; col 0 = frame col
            # 16c-1; row 7 = above row; rows 8..23 = MB rows

            # ---- residual tiles: streamed per group in wavefront-
            # group-major layout (full-frame VMEM residuals blew the
            # 16 MB scoped-vmem budget at 1080p) ----
            res = rl_ref[k].astype(jnp.int32)                 # (16, LN)
            cres = rc_ref[k].astype(jnp.int32)                # (8, LN)

            # ---- I16 prediction from the ORIGINAL region ----
            arow16 = regs0[7:8]                               # (1, LN)
            # vertical: above pel x at write lane 1+x (same lane)
            v16 = jnp.broadcast_to(arow16, (16, LN))
            # horizontal: left column spread across each row
            lcol = jnp.where(_mask_eq(16, 0), regs0[8:24], 0)
            h16 = _spread16(regs0[8:24], 0)
            # dc: above lanes 1..16 (to lane 0) + left column sum
            sa = _reduce_to(arow16, 1, 17, 0)
            sl = _rowsum(lcol)
            sl = jnp.where(_mask_eq(1, 0), sl, 0)
            av_a = (mbav & 1) != 0
            av_b = (mbav & 2) != 0
            dcv = jnp.where(
                av_a & av_b, (sa + sl + 16) >> 5,
                jnp.where(av_a, (sl + 8) >> 4,
                          jnp.where(av_b, (sa + 8) >> 4, 128)))
            dc16 = jnp.broadcast_to(_spread16(dcv, 0), (16, LN))
            # plane: b = sum_l (l-8)*above[l], region lanes 0..16
            wv = _lane(1) - 8
            bsum = _reduce_to(arow16 * wv, 0, 17, 0)
            bv = (5 * bsum + 32) >> 6
            # c = sum_t (t-7)*left[t] - 8*corner
            tw = lax.broadcasted_iota(jnp.int32, (16, LN), 0) - 7
            csum = _rowsum(lcol * tw) \
                - 8 * jnp.where(_mask_eq(1, 0), arow16, 0)
            cv = (5 * csum + 32) >> 6
            # av = 16 * (above[16] + left[15]) at lane 0
            a16v = _lsh(jnp.where(_mask_eq(1, 16), arow16, 0), 16)
            l15v = jnp.where(_mask_eq(1, 0), regs0[23:24], 0)
            avv = 16 * (a16v + l15v)
            bsp = _spread16(bv, 0)
            csp = _spread16(cv, 0)
            avsp = _spread16(avv, 0)
            xi = _lane(16) - 1 - 7            # x - 7 at lane 1+x
            yi = lax.broadcasted_iota(jnp.int32, (16, LN), 0) - 7
            pl16 = _clip8((avsp + bsp * xi + csp * yi + 16) >> 5)
            p16 = jnp.where(i16m == 0, v16,
                            jnp.where(i16m == 1, h16,
                                      jnp.where(i16m == 2, dc16,
                                                pl16)))
            i16out = _clip8(p16 + res)        # rows=16, lanes 1..17
            # ---- I4 sequential block loop on a working copy ----
            regs = regs0
            for z in range(16):
                rr = int(ZIG2RAS[z])
                x0 = int(BLOCK_X[rr])
                y0 = int(BLOCK_Y[rr])
                bm = bmap_ref[k, rr:rr + 1]           # (1, LN) mode|av<<4
                mode = bm & 15
                avz = bm >> 4
                av_az = (avz & 1) != 0
                av_bz = (avz & 2) != 0
                av_cz = (avz & 4) != 0

                arow = regs[7 + y0:8 + y0]
                # frame right edge: beyond-frame lanes hold the NEXT
                # band's data in the sheared scratch, so last-column
                # MBs replicate the edge pel (lane 16) in-register —
                # the oracle's clipped gather semantics
                if x0 == 12:
                    for j in range(1, 5):
                        arow = jnp.where(
                            _mask_eq(1, 16 + j) & (lastcol != 0),
                            _rsh(arow, j), arow)
                # above-right replication: lanes x0+5..x0+8 <- a[4]
                for j in range(1, 5):
                    arow = jnp.where(
                        _mask_eq(1, x0 + 4 + j) & ~av_cz,
                        _rsh(arow, j), arow)
                # composite edge vector at a +4 lane offset so left-
                # column pels land at non-negative lanes for x0 == 0:
                # E[x0+4+i] = edge pel i, i in [-4..8] (i < 0: l[-i];
                # i == 0: corner; i > 0: a[i])
                E = _rsh(arow, 4)
                for j in range(1, 5):
                    E = jnp.where(_mask_eq(1, x0 + 4 - j),
                                  _roll(regs[7 + y0 + j:8 + y0 + j],
                                        4 - j), E)
                # all E-family lanes sit +4 from the natural edge lane,
                # so every roll amount below is (natural amount) - 4
                D = _m3(_rsh(E, 1), E, _lsh(E, 1))
                He = _h2(E, _lsh(E, 1))
                Hl = _h2(E, _rsh(E, 1))

                R4 = regs[8 + y0:12 + y0]             # (4, LN) own rows

                # vertical / ddl (pure-above: arow, no offset)
                vert = jnp.broadcast_to(arow, (4, LN))
                F = _m3(arow, _lsh(arow, 1), _lsh(arow, 2))
                F = jnp.where(_mask_eq(1, x0 + 7),
                              (arow + 3 * _lsh(arow, 1) + 2) >> 2, F)
                ddl = jnp.concatenate([_lsh(F, yy) for yy in range(4)], 0)
                # horizontal: row t <- left value at lane x0 of row t
                hor = jnp.zeros((4, LN), jnp.int32)
                for j in range(1, 5):
                    hor = jnp.where(_mask_eq(4, x0 + j), _rsh(R4, j), hor)
                # dc
                sa4 = _reduce_to(arow, x0 + 1, x0 + 5, x0)
                sl4 = R4[0:1] + R4[1:2] + R4[2:3] + R4[3:4]
                sl4 = jnp.where(_mask_eq(1, x0), sl4, 0)
                dval = jnp.where(av_az & av_bz, (sa4 + sl4 + 4) >> 3,
                                 jnp.where(av_az, (sl4 + 2) >> 2,
                                           jnp.where(av_bz,
                                                     (sa4 + 2) >> 2, 128)))
                dc4 = jnp.broadcast_to(_spread_from(dval, x0, 4), (4, LN))
                # ddr: P[yy, x0+1+t] = D[x0 + t - yy]
                ddr = jnp.concatenate(
                    [_roll(D, yy - 3) for yy in range(4)], 0)
                # vr: rows [e0..e3], [o0..o3], [r8, e0, e1, e2],
                # [r12, o0, o1, o2]; e_k = He[x0+k], o_k = D[x0+k]
                # (o_0 = D[x0] covers m3(a1, a0, l1)), r8 = D[x0-1],
                # r12 = D[x0-2]
                vr = jnp.concatenate(
                    [_roll(He, -3), _roll(D, -3),
                     jnp.where(_mask_eq(1, x0 + 1), _roll(D, -2),
                               _roll(He, -2)),
                     jnp.where(_mask_eq(1, x0 + 1), _roll(D, -1),
                               _roll(D, -2))], 0)
                # hd: row yy = [he_yy, ho_yy, *row_{yy-1}[0:2]] with
                # he_k = Hl[x0-k], ho_k = D[x0-k], t2/t3 = D[x0+1/x0+2]
                hd_rows = []
                for yy in range(4):
                    row = jnp.where(_mask_eq(1, x0 + 1),
                                    _roll(Hl, yy - 3), 0)
                    row = jnp.where(_mask_eq(1, x0 + 2),
                                    _roll(D, yy - 2), row)
                    row = jnp.where(
                        _mask_eq(1, x0 + 3),
                        _roll(D, -2) if yy == 0 else _roll(Hl, yy - 2),
                        row)
                    row = jnp.where(
                        _mask_eq(1, x0 + 4),
                        _roll(D, -2) if yy == 0 else _roll(D, yy - 1),
                        row)
                    hd_rows.append(row)
                hd = jnp.concatenate(hd_rows, 0)
                # vl: rows vh[0..3], vm[0..3], vh[1..4], vm[1..4];
                # vh_k = He[x0+k+1], vm_k = D[x0+k+2]
                vl = jnp.concatenate(
                    [_roll(He, -4), _roll(D, -5),
                     _roll(He, -5), _roll(D, -6)], 0)
                # hu: element index min(2*yy + t, 6) into
                # [v0..v6] = [Hl[x0-1], D[x0-2], Hl[x0-2], D[x0-3],
                #             Hl[x0-3], spec5[x0-3], E[x0-4]]
                spec5 = (E + 3 * _rsh(E, 1) + 2) >> 2   # value at x0-3+4
                hu_rows = []
                for yy in range(4):
                    row = jnp.zeros((1, LN), jnp.int32)
                    for t in range(4):
                        vi = min(2 * yy + t, 6)
                        tl = x0 + 1 + t
                        if vi == 6:
                            src, amt = E, tl - (x0 - 4)
                        elif vi == 5:
                            src, amt = spec5, tl - (x0 - 3)
                        elif vi % 2 == 0:
                            src, amt = Hl, tl - (x0 - 1 - vi // 2)
                        else:
                            src, amt = D, tl - (x0 - 2 - (vi - 1) // 2)
                        row = jnp.where(_mask_eq(1, tl),
                                        _roll(src, amt - 4), row)
                    hu_rows.append(row)
                hu = jnp.concatenate(hu_rows, 0)

                cases = [vert, hor, dc4, ddl, ddr, vr, hd, vl, hu]
                pred = cases[0]
                for mi in range(1, 9):
                    pred = jnp.where(mode == mi, cases[mi], pred)
                out = _clip8(pred + res[y0:y0 + 4])
                mid = jnp.where(_mask_rng(4, 1 + x0, 5 + x0), out, R4)
                rows = [regs[0:8 + y0], mid]
                if y0 < 12:     # Mosaic rejects zero-size slices
                    rows.append(regs[12 + y0:24])
                regs = jnp.concatenate(rows, axis=0)

            # ---- merge: I4 result / I16 result / untouched ----
            own = jnp.where((is_i4v != 0) & (is_intrav != 0),
                            regs[8:24],
                            jnp.where((is_intrav != 0), i16out,
                                      regs0[8:24]))
            wrote = _mask_rng(16, 1, 17) & (is_intrav != 0)
            own = jnp.where(wrote, own, regs0[8:24]).astype(jnp.uint8)

            # ---- store back (merge own rows into L's own-band lanes) ----
            R = [lane_roll_narrow(own, -32 * m)[:, 0:32] if m else
                 own[:, 0:32] for m in range(G)]
            LB = lane_roll_narrow(L, -32)
            # pure concats, no u8 selects (Mosaic aborts on sub-native
            # u8 where-tiles): `own` already equals the loaded values at
            # every untouched lane/slot, so the pieces drop in whole
            pb = [LB[0:8, 0:32]]
            for m in range(G):
                pb.append(R[m])
            colB = jnp.concatenate(pb, axis=0)
            # reassemble: lanes 0..32 (above-band pieces, untouched) keep
            # the roll-0 view; lanes 32..64 (own bands) take colB; the
            # rest is untouched
            upd = jnp.concatenate([L[:, 0:32], colB, L[:, 64:256]], axis=1)
            sy[pl.ds(ly, RL), pl.ds(lba, 256)] = \
                lane_roll_narrow(upd, d)

            # ---- chroma ----
            cy = pl.multiple_of(r0 * 8, 8)
            cbase = c0 * 8 + r0 * 16 + PLS - 17
            cba = pl.multiple_of((cbase // 128) * 128, 128)
            dc_ = cbase - cba
            Lc = [lane_roll_narrow(
                ref[pl.ds(cy, RC), pl.ds(cba, 256)], -dc_)
                for ref in (scb, scr)]
            Lc16 = [lane_roll_narrow(Lp, -16) for Lp in Lc]
            cparts = []
            for m in range(G):
                for Lp, Lp16 in zip(Lc, Lc16):
                    cparts.append(jnp.concatenate(
                        [Lp[8 * m:8 * m + 8, 0:16],
                         Lp16[8 * m + 8:8 * m + 16, 0:16]], axis=0))
            cregs = jnp.concatenate(cparts, axis=1).astype(jnp.int32)
            # 32-lane slot: cb region at lanes 0..15, cr at 16..31;
            # region col 0 = chroma col 8c-1; row 7 above, rows 8..15 own

            cout = _chroma_group(cregs, cres, chrm, mbav)

            cw = _mask_rng(8, 1, 9) | _mask_rng(8, 17, 25)
            cw = cw & jnp.broadcast_to(is_intrav != 0, (8, LN))
            own_c = jnp.where(cw, cout, cregs[8:16]).astype(jnp.uint8)
            for pi, ref in enumerate((scb, scr)):
                Cm = [lane_roll_narrow(
                    own_c, -(32 * m + 16 * pi))[:, 0:16]
                    if (32 * m + 16 * pi) else own_c[:, 0:16]
                    for m in range(G)]
                LB = lane_roll_narrow(Lc[pi], -16)
                pb = [LB[0:8, 0:16]]
                for m in range(G):
                    wrote_m = (_mask_rng(8, 1, 9) if pi == 0
                               else _mask_rng(8, 17, 25))[:, 16 * pi:
                                                          16 * pi + 16]
                    pb.append(jnp.where(wrote_m, Cm[m],
                                        LB[8 * m + 8:8 * m + 16, 0:16]))
                colB = jnp.concatenate(pb, axis=0)
                upd = jnp.concatenate(
                    [Lc[pi][:, 0:16], colB, Lc[pi][:, 32:256]], axis=1)
                ref[pl.ds(cy, RC), pl.ds(cba, 256)] = \
                    lane_roll_narrow(upd, dc_)
        return 0

    lax.fori_loop(0, GC, group_body, 0)

    @pl.when(step == n_steps - 1)
    def _():
        for b in range(hm):
            y_out[pl.ds(16 * b, 16), :] = \
                sy[pl.ds(PT + 16 * b, 16), pl.ds(PLS + 32 * b, W)]
            cb_out[pl.ds(8 * b, 8), :] = \
                scb[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, Wc)]
            cr_out[pl.ds(8 * b, 8), :] = \
                scr[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, Wc)]


def _chroma_group(cregs, cres, chrm, mbav):
    """All four chroma modes for a (16, LN) cb|cr group tile; region per
    16-lane half: corner lane 0, above pels lanes 1..8, left column lane
    0 rows 8..15. Returns the (8, LN) predicted+residual rows (values
    meaningful on write lanes 1..9 / 17..25 only)."""
    arow = cregs[7:8]
    own = cregs[8:16]
    av_a = (mbav & 1) != 0
    av_b = (mbav & 2) != 0
    lane16 = lax.broadcasted_iota(jnp.int32, (1, LN), 1) % 16

    def m16(rows, j):
        return (lax.broadcasted_iota(jnp.int32, (rows, LN), 1) % 16) == j

    def r16(rows, lo, hi):
        m = lax.broadcasted_iota(jnp.int32, (rows, LN), 1) % 16
        return (m >= lo) & (m < hi)

    def spread8(v):
        """value at half-lane 0 -> half-lanes 1..8."""
        v = jnp.where(m16(v.shape[0], 0), v, 0)
        for k in (1, 2, 4):
            v = v + _rsh(v, k)
        v = v + jnp.where(m16(v.shape[0], 8), _rsh(v, 8), 0)
        return jnp.where(r16(v.shape[0], 1, 9), v, 0)

    def reduce4(v, lo):
        """sum half-lanes [lo, lo+4) -> left at half-lane lo."""
        v = jnp.where(r16(v.shape[0], lo, lo + 4), v, 0)
        v = v + _lsh(v, 1)
        v = v + _lsh(v, 2)
        return v

    # vertical: same-lane broadcast
    v8 = jnp.broadcast_to(arow, (8, LN))
    # horizontal: left column spread per row
    h8 = spread8(own)
    # dc: quadrant sums
    sa0 = reduce4(arow, 1)                        # at half-lane 1
    sa1 = reduce4(arow, 5)                        # at half-lane 5
    lc = jnp.where(m16(8, 0), own, 0)
    sl0 = _rowsum(lc[0:4])
    sl1 = _rowsum(lc[4:8])
    # align all at half-lane 0
    sa0 = _lsh(sa0, 1)
    sa1 = _lsh(sa1, 5)
    tl = jnp.where(av_a & av_b, (sa0 + sl0 + 4) >> 3,
                   jnp.where(av_b, (sa0 + 2) >> 2,
                             jnp.where(av_a, (sl0 + 2) >> 2, 128)))
    tr = jnp.where(av_b, (sa1 + 2) >> 2,
                   jnp.where(av_a, (sl0 + 2) >> 2, 128))
    bl = jnp.where(av_a, (sl1 + 2) >> 2,
                   jnp.where(av_b, (sa0 + 2) >> 2, 128))
    br = jnp.where(av_a & av_b, (sa1 + sl1 + 4) >> 3,
                   jnp.where(av_a, (sl1 + 2) >> 2,
                             jnp.where(av_b, (sa1 + 2) >> 2, 128)))
    top = jnp.where(r16(1, 1, 5), spread8(tl), spread8(tr))
    bot = jnp.where(r16(1, 1, 5), spread8(bl), spread8(br))
    rows8 = lax.broadcasted_iota(jnp.int32, (8, LN), 0)
    dc8 = jnp.where(rows8 < 4, jnp.broadcast_to(top, (8, LN)),
                    jnp.broadcast_to(bot, (8, LN)))
    # plane: b = (17 * sum_l w(l)*above[l] + 16) >> 5 with weights
    # w(lane 1+i) = i-3 for i=0..7 (a[1+i] pairs collapse like luma),
    # minus 4*corner at lane 0
    wvec = lane16 - 4               # lane 1+i -> (i-3)
    bsum = _reduce_to_half(arow * jnp.where(r16(1, 1, 9), wvec, 0), 1, 9)
    bsum = bsum - 4 * jnp.where(m16(1, 0), arow, 0)
    bv = (17 * bsum + 16) >> 5
    tw = lax.broadcasted_iota(jnp.int32, (8, LN), 0) - 3   # t-3
    csum = _rowsum(lc * tw) \
        - 4 * jnp.where(m16(1, 0), arow, 0)
    cv = (17 * csum + 16) >> 5
    a8v = _lsh(jnp.where(m16(1, 8), arow, 0), 8)
    l7v = jnp.where(m16(1, 0), cregs[15:16], 0)
    avv = 16 * (a8v + l7v)
    bsp = spread8(bv)
    csp = spread8(cv)
    avsp = spread8(avv)
    xi = lane16 - 1 - 3
    yi = lax.broadcasted_iota(jnp.int32, (8, LN), 0) - 3
    pl8 = _clip8((avsp + 16 + bsp * xi + csp * yi) >> 5)
    p = jnp.where(chrm == 0, dc8,
                  jnp.where(chrm == 1, h8,
                            jnp.where(chrm == 2, v8, pl8)))
    return _clip8(p + cres)


def _reduce_to_half(v, lo, hi):
    """sum half-lanes [lo, hi) per 16-lane half -> at half-lane 0."""
    rows = v.shape[0]
    m = lax.broadcasted_iota(jnp.int32, (rows, LN), 1) % 16
    v = jnp.where((m >= lo) & (m < hi), v, 0)
    k = 1
    while k < hi:
        v = v + _lsh(v, k)
        k *= 2
    return v


def intra_pass_wavefront_pallas(y_plane, cb_plane, cr_plane, mb_class,
                                i4_modes, i4_avail, mb_avail, i16_mode,
                                chroma_mode, resid_luma, resid_chroma,
                                width_mbs, height_mbs, interpret=False):
    """Wavefront-batched counterpart of ops.intra.intra_pass_wavefront
    for intra-heavy frames (the raster kernel ops.pallas_intra remains
    the choice for sparse intra lists on P frames)."""
    from .pallas_intra import intra_pass_pallas

    if width_mbs < 3:
        return intra_pass_pallas(
            y_plane, cb_plane, cr_plane, mb_class, i4_modes, i4_avail,
            mb_avail, i16_mode, chroma_mode, resid_luma, resid_chroma,
            width_mbs, height_mbs, interpret=interpret)

    n_mb = mb_class.shape[0]
    H, W = height_mbs * 16, width_mbs * 16
    Hc, Wc = H // 2, W // 2
    hm_pad, n_wf, sm_static = _wavefront_layout(width_mbs, height_mbs)
    n_groups = n_wf * (hm_pad // G)

    is_intra = ((mb_class == 3) | (mb_class == 4)).astype(jnp.int32)
    flags = (i16_mode.astype(jnp.int32)
             | (chroma_mode.astype(jnp.int32) << 2)
             | (mb_avail.astype(jnp.int32) << 4)
             | ((mb_class == 3).astype(jnp.int32) << 8)
             | (is_intra << 9)
             | ((jnp.arange(n_mb) % width_mbs
                 == width_mbs - 1).astype(jnp.int32) << 10))
    nib = (i4_modes.astype(jnp.int32)
           | (i4_avail.astype(jnp.int32) << 4))         # (nMB, 16)

    arr = partial(_wavefront_arrange, width_mbs=width_mbs,
                  height_mbs=height_mbs, hm_pad=hm_pad)
    wf_intra = arr(is_intra).reshape(n_groups, G)
    wf_flags = arr(flags).reshape(n_groups, G)
    wf_nib = arr(nib).reshape(n_groups, G, 16)

    valid = jnp.asarray(sm_static[:, 2 * G:3 * G])
    eff = ((wf_intra != 0) & (valid != 0)).astype(jnp.int32)
    smeta = jnp.asarray(sm_static) \
        .at[:, 2 * G:3 * G].set(eff) \
        .at[:, SM].set(eff.max(axis=1))

    # lane maps: rows 0..15 block nibbles, row 16 flags (masked to
    # effective slots so invalid slots read is_intra == 0), rest zero
    fl = jnp.where(eff != 0, wf_flags, 0)
    packed = jnp.concatenate(
        [wf_nib.transpose(0, 2, 1), fl[:, None, :],
         jnp.zeros((n_groups, 7, G), jnp.int32)], axis=1)   # (nG, 24, G)
    bmap = jnp.repeat(packed, 32, axis=2)                   # (nG, 24, LN)

    # residuals in wavefront-GROUP-major layout, one (16/8, LN) tile
    # per group with each slot's values at its write lanes (luma 1..16,
    # chroma cb 1..8 / cr 17..24): the kernel streams one group tile per
    # grid step instead of holding full-frame residuals in VMEM
    rpad = jnp.pad(resid_luma.astype(jnp.int16),
                   ((0, 0), (0, 0), (1, 15)))                # (n,16,32)
    cpad = jnp.concatenate(
        [jnp.pad(resid_chroma[:, 0].astype(jnp.int16),
                 ((0, 0), (0, 0), (1, 7))),
         jnp.pad(resid_chroma[:, 1].astype(jnp.int16),
                 ((0, 0), (0, 0), (1, 7)))], axis=2)         # (n,8,32)
    rl = arr(rpad.reshape(n_mb, 16 * 32)) \
        .reshape(n_groups, G, 16, 32).transpose(0, 2, 1, 3) \
        .reshape(n_groups, 16, LN)
    rc = arr(cpad.reshape(n_mb, 8 * 32)) \
        .reshape(n_groups, G, 8, 32).transpose(0, 2, 1, 3) \
        .reshape(n_groups, 8, LN)

    n_steps = max(1, -(-n_groups // GC))
    padg = n_steps * GC - n_groups
    if padg:
        smeta = jnp.pad(smeta, ((0, padg), (0, 0)))
        bmap = jnp.pad(bmap, ((0, padg), (0, 0), (0, 0)))
        rl = jnp.pad(rl, ((0, padg), (0, 0), (0, 0)))
        rc = jnp.pad(rc, ((0, padg), (0, 0), (0, 0)))

    hp = 16 * hm_pad + 24
    wp = _round128(PLS + 16 * (width_mbs + 2 * G - 3)
                   + 32 * (hm_pad - G)) + 384
    hpc = 8 * hm_pad + 16
    wpc = _round128(PLS + 8 * (width_mbs + 2 * G - 3)
                    + 16 * (hm_pad - G)) + 384

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((GC, SM + 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GC, 24, LN), lambda i: (i, 0, 0)),
            pl.BlockSpec((H, W), lambda i: (0, 0)),
            pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
            pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
            pl.BlockSpec((GC, 16, LN), lambda i: (i, 0, 0)),
            pl.BlockSpec((GC, 8, LN), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((H, W), lambda i: (0, 0)),
                   pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
                   pl.BlockSpec((Hc, Wc), lambda i: (0, 0))],
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.uint8),
                        pltpu.VMEM((hpc, wpc), jnp.uint8),
                        pltpu.VMEM((hpc, wpc), jnp.uint8)],
    )
    out_y, out_cb, out_cr = pl.pallas_call(
        partial(_intra_wf_kernel, H=H, W=W, hm=height_mbs, wm=width_mbs),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint8),
                   jax.ShapeDtypeStruct((Hc, Wc), jnp.uint8),
                   jax.ShapeDtypeStruct((Hc, Wc), jnp.uint8)],
        interpret=interpret,
        input_output_aliases={2: 0, 3: 1, 4: 2},
    )(smeta, bmap, y_plane, cb_plane, cr_plane, rl, rc)
    return out_y, out_cb, out_cr
