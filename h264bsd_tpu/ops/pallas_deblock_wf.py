"""Wavefront-batched Pallas TPU deblocking filter.

The raster kernel (ops.pallas_deblock) walks the MBs one at a time; its
cost is scalar-core op ISSUE, not data (measured: shrinking roll traffic
4x moved it ~2%). This kernel batches G macroblocks per vector op
(G=8 default: the kernel is bound by per-group load/roll/store overhead,
so wider groups amortize it — G=8 halves the group count vs the original
G=4 at equal total vector work).

Validity: the reference filters MBs in raster order, vertical edges then
horizontal per MB (h264bsdFilterPicture deblocking.c:575-640). MB (r,c)
reads pixels last written by (r,c-1) [its H pass touches columns
16c-4..16c-1], (r-1,c) [rows above] and (r-1,c+1) [its V pass touches
columns 16c+13..16c+15 in rows 16r-4..16r-1 read by our top H edge] —
all on earlier anti-diagonals of w = 2r + c. MBs on the SAME
anti-diagonal are separated by (+1 row, -2 cols) steps and their
read/write footprints are disjoint, so a wavefront schedule over w
reproduces the reference bit-exactly. (Cross-check: (r-1,c+2) — the
same-wavefront neighbour — writes columns >= 16c+29 and rows <= 16r-1,
disjoint from everything (r,c) reads.)

Batching layout: G same-wavefront MBs occupy 32-lane slots of a
(32, 32*G) register tile (chroma: 16-lane slots, cb in the lower and cr
in the upper 16 lanes of a 32-lane slot, filtered in one pass). All
shift/filter/select math runs once per group.

Per-edge filter parameters (bS per 4-pel group, tc0, alpha, beta) are
packed (alpha<<14 | tc0<<9 | beta<<3 | bs) into two tensors streamed per
group: a V map (nGroups, 24, 32*G) of slot-broadcast values the kernel
repeats over pel rows, and an H map (nGroups, 6, 32*G) of final lane
patterns. The wavefront arrangement costs NO
gathers: MB ids along anti-diagonal w are w + r*(wm-2), an arithmetic
sequence, so wavefront-major order is hm static strided slices of the
raster array (exactly covering it: (hm-1)(wm-2) + 2(hm-1)+wm = hm*wm).
Groups are fixed G-row slots of the (nW, hm) view; slots outside the
diagonal's valid r-interval are masked per-slot and skipped at store.

Parity vs ops.deblock.deblock_frame is pinned by
tests/test_pallas_deblock.py (interpreter mode) and the on-TPU bench
verification pass.

V map rows: [0:16] luma, row 4e+g = vertical edge e, 4-pel group g
(repeated over 4 pel rows in-kernel); [16:24] chroma, row 16+4e'+g
(repeated over 2 pel rows). H map rows: [0:4] luma edge v, [4:6] chroma
edge v' — final 32G-lane patterns.
"""

from __future__ import annotations

import functools
import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_deblock import _chroma_filter, _lsh, _luma_filter, _rsh
from .pallas_util import lane_roll_narrow

# Wider groups measured on v5e (round 4, 1080p P frame, unpack+deblock
# marginal cost in an in-jit scan): G=16 OOMs the 16M scoped-VMEM limit
# (sheared scratch grows with G); G=12 only compiles with EDGE_SKIP=0
# and lands at 3.33 ms vs G=8+skip's 3.28 ms — the skip's win (~0.33 ms)
# cancels the 33% group-count reduction. G=8 stays the default.
G = int(_os.environ.get("H264TPU_DEBLOCK_G", "8"))
LN = 32 * G    # luma tile lanes (and chroma: 32-lane cb|cr slots)
# groups per grid step (tunable: fewer grid steps amortize the per-step
# scalar prologue; more steps pipeline input-map streaming better).
# Round-5 sweep on a real 1080p P frame (tools/sweep_deblock.py,
# chained in-jit x16): GC=16 4.31 ms vs GC=8 4.44 / GC=32 4.39 —
# a small but repeatable win.
GC = int(_os.environ.get("H264TPU_DEBLOCK_GC", "16"))
PT = 8         # top padding rows (scratch)
PL = 128       # left padding lanes (scratch)
# smeta columns: [0:G] r, [G:2G] c, [2G:3G] effective,
# [3G] group-any, [3G+1] r0, [3G+2] c0, [3G+3] edge-activity mask
SM = 3 * G

# Edge-activity skip (lax.cond around inner-edge filter math + the
# chroma section, driven by a per-group 12-bit mask in smeta col 3G+3).
# At the original G=4 this measured SLOWER on v5e (70.8 vs 77.7 fps
# e2e: the scalar branches broke Mosaic's software pipeline across
# groups); at G=8 the branch cost amortizes over twice the vector work
# and P-frame deblock drops 3.15 -> 2.82 ms (I frames +0.1 ms — every
# edge is active, the branches only cost). Default ON since P frames
# dominate every real stream; H264TPU_DEBLOCK_SKIP=0 restores the
# unconditional kernel.
EDGE_SKIP = _os.environ.get("H264TPU_DEBLOCK_SKIP", "1") == "1"


def _round128(x):
    return -(-x // 128) * 128


@functools.lru_cache(maxsize=None)
def _wavefront_layout(width_mbs, height_mbs):
    """Static geometry of the fixed-slot wavefront grouping.

    Returns (hm_pad, n_wf, smeta_static) where smeta_static is
    (nGroups, SM+4) int32: per slot m of each group, columns [m]=r,
    [G+m]=c, [2G+m]=geometrically valid; remaining columns 0.
    Group (w, k) holds slots r = G*k+j along anti-diagonal w.
    """
    hm_pad = -(-height_mbs // G) * G
    n_wf = 2 * (height_mbs - 1) + width_mbs
    w = np.arange(n_wf)[:, None]
    r = np.arange(hm_pad)[None, :]
    c = w - 2 * r
    valid = (c >= 0) & (c < width_mbs) & (r < height_mbs)
    rr = np.where(valid, r, 0).astype(np.int32)
    cc = np.where(valid, c, 0).astype(np.int32)
    n_groups = n_wf * (hm_pad // G)
    sm = np.zeros((n_groups, SM + 4), np.int32)
    sm[:, 0:G] = rr.reshape(n_groups, G)
    sm[:, G:2 * G] = cc.reshape(n_groups, G)
    sm[:, 2 * G:3 * G] = valid.reshape(n_groups, G)
    # geometric slot-0 coordinates (cols SM+1/SM+2), NOT zeroed for
    # invalid slots: the sheared kernel addresses the whole group from
    # them. Any group with >= 1 valid slot has 0 <= c0 <= wm+2G-3.
    r_g = np.broadcast_to(np.arange(hm_pad)[None, ::G], (n_wf, hm_pad // G))
    sm[:, SM + 1] = r_g.reshape(-1)
    sm[:, SM + 2] = (w - 2 * r_g).reshape(-1)
    return hm_pad, n_wf, sm


def _mask_mod(rows, lane, period):
    i = lax.broadcasted_iota(jnp.int32, (rows, LN), 1)
    return (i % period) == lane


def _range_mod(rows, lo, hi, period):
    i = lax.broadcasted_iota(jnp.int32, (rows, LN), 1)
    m = i % period
    return (m >= lo) & (m < hi)


def _unpack(m):
    return m & 7, (m >> 3) & 31, (m >> 9) & 31, (m >> 14) & 255


def _expand_rows(cm, base, n_edges, rep, rows):
    """Per-edge (rows, LN) maps from slot-broadcast packed rows
    cm[base+n? ...]: edge e uses cm rows base+rep_groups, each repeated
    over `rep` pel rows."""
    out = []
    for e in range(n_edges):
        n_g = rows // rep
        parts = [jnp.broadcast_to(cm[base + n_g * e + g:
                                     base + n_g * e + g + 1], (rep, LN))
                 for g in range(n_g)]
        out.append(jnp.concatenate(parts, axis=0))
    return out


def _luma_v_edge(regs, e, vmaps):
    x = 4 + 4 * e
    bsv, beta, tcv, alpha = _unpack(vmaps[e])
    comps = [_lsh(regs, x - 4 + j)[8:24] for j in range(8)]
    p3, p2, p1, p0, q0, q1, q2, q3 = comps
    outs = _luma_filter(p0, p1, p2, p3, q0, q1, q2, q3,
                        bsv, alpha, beta, tcv)
    mid = regs[8:24]
    for off, comp in zip((x - 3, x - 2, x - 1, x, x + 1, x + 2), outs):
        mid = jnp.where(_mask_mod(16, off, 32), _rsh(comp, off), mid)
    return jnp.concatenate([regs[0:8], mid, regs[24:32]], 0)


def _luma_h_edge(regs, v, hm):
    yy = 8 + 4 * v
    bsv, beta, tcv, alpha = _unpack(hm[v:v + 1])
    rows = [regs[yy - 4 + j] for j in range(8)]
    p3, p2, p1, p0, q0, q1, q2, q3 = [t[None, :] for t in rows]
    outs = _luma_filter(p0, p1, p2, p3, q0, q1, q2, q3,
                        bsv, alpha, beta, tcv)
    inside = _range_mod(1, 4, 20, 32)
    new = [jnp.where(inside, t, old[None, :])
           for t, old in zip(outs, rows[1:7])]
    return jnp.concatenate([regs[0:yy - 3], *new, regs[yy + 3:32]], 0)


def _filter_luma_group(regs, vm, hm, em):
    """All 8 luma edges of a G-slot (32, LN) group tile.

    em is the group's 12-bit edge-activity mask (bit e: any slot has a
    nonzero bS on that edge; a bS-0 edge is the identity). The INNER
    edges (V/H edges 1..3) are gated as one lax.cond each: typical P
    groups only have activity on the MB-boundary edges (coded blocks /
    MV deltas concentrate there), so 3/4 of the luma filter math skips.
    The boundary edges run unconditionally — group-level skip already
    culled groups with no activity at all, and finer per-edge conds
    measured SLOWER (the branch carries the whole register tile)."""
    vmaps = _expand_rows(vm, 0, 4, 4, 16)
    if not EDGE_SKIP:
        for e in range(4):
            regs = _luma_v_edge(regs, e, vmaps)
        for v in range(4):
            regs = _luma_h_edge(regs, v, hm)
        return regs

    regs = _luma_v_edge(regs, 0, vmaps)

    def _inner_v(regs):
        for e in range(1, 4):
            regs = _luma_v_edge(regs, e, vmaps)
        return regs

    regs = lax.cond((em >> 1) & 7 != 0, _inner_v, lambda r: r, regs)

    regs = _luma_h_edge(regs, 0, hm)

    def _inner_h(regs):
        for v in range(1, 4):
            regs = _luma_h_edge(regs, v, hm)
        return regs

    regs = lax.cond((em >> 5) & 7 != 0, _inner_h, lambda r: r, regs)
    return regs


def _filter_chroma_group(cregs, vm, hm, em):
    """All 4 chroma edges of a G-slot (16, LN) cb|cr group tile (the
    caller already gates the whole chroma section on mask bits 8..11)."""
    cvmaps = _expand_rows(vm, 16, 2, 2, 8)
    for e in range(2):                     # vertical edges
        x = 4 + 4 * e
        bsv, beta, tcv, alpha = _unpack(cvmaps[e])
        p1 = _lsh(cregs, x - 2)[8:16]
        p0 = _lsh(cregs, x - 1)[8:16]
        q0 = _lsh(cregs, x)[8:16]
        q1 = _lsh(cregs, x + 1)[8:16]
        np0, nq0 = _chroma_filter(p0, p1, q0, q1, bsv, alpha, beta, tcv)
        mid = cregs[8:16]
        for off, comp in ((x - 1, np0), (x, nq0)):
            mid = jnp.where(_mask_mod(8, off, 16), _rsh(comp, off), mid)
        cregs = jnp.concatenate([cregs[0:8], mid], 0)

    for v in range(2):                     # horizontal edges
        yy = 8 + 4 * v
        bsv, beta, tcv, alpha = _unpack(hm[4 + v:5 + v])
        p1 = cregs[yy - 2][None, :]
        p0 = cregs[yy - 1][None, :]
        q0 = cregs[yy][None, :]
        q1 = cregs[yy + 1][None, :]
        np0, nq0 = _chroma_filter(p0, p1, q0, q1, bsv, alpha, beta, tcv)
        inside = _range_mod(1, 4, 12, 16)
        np0 = jnp.where(inside, np0, p0)
        nq0 = jnp.where(inside, nq0, q0)
        cregs = jnp.concatenate(
            [cregs[0:yy - 1], np0, nq0, cregs[yy + 1:16]], 0)
    return cregs


def _wf_kernel(smeta_ref, vm_ref, hm_ref, y_in, cb_in, cr_in,
               y_out, cb_out, cr_out, sy, scb, scr, *, H, W):
    Hc, Wc = H // 2, W // 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        sy[pl.ds(PT, H), pl.ds(PL, W)] = y_in[:]
        scb[pl.ds(PT, Hc), pl.ds(PL, Wc)] = cb_in[:]
        scr[pl.ds(PT, Hc), pl.ds(PL, Wc)] = cr_in[:]

    def group_body(k, _):
        @pl.when(smeta_ref[k, SM] != 0)
        def _():
            rs = [smeta_ref[k, m] for m in range(G)]
            cs = [smeta_ref[k, G + m] for m in range(G)]
            effs = [smeta_ref[k, 2 * G + m] for m in range(G)]
            em = smeta_ref[k, SM + 3]          # 12-bit edge-activity mask
            vm = vm_ref[k]                     # (24, LN) V packed params
            hm = hm_ref[k]                     # (6, LN) H packed params

            # ---- luma: gather G slots -> (32, LN) ----
            lys = [pl.multiple_of(r * 16, 8) for r in rs]
            lxs = [c * 16 + PL - 4 for c in cs]
            lxas = [pl.multiple_of((lx // 128) * 128, 128) for lx in lxs]
            parts = []
            for m in range(G):
                sup = lane_roll_narrow(
                    sy[pl.ds(lys[m], 32), pl.ds(lxas[m], 256)],
                    -(lxs[m] - lxas[m]))
                parts.append(sup[:, 0:32])
            regs = jnp.concatenate(parts, axis=1).astype(jnp.int32)
            # slot m lane j = frame col 16*c_m - 4 + j; rows 8..23 = MB rows

            regs = _filter_luma_group(regs, vm, hm, em)

            regs8 = regs.astype(jnp.uint8)
            for m in range(G):                     # sequential RMW stores
                @pl.when(effs[m] != 0)
                def _(m=m):
                    d = lxs[m] - lxas[m]
                    sup = lane_roll_narrow(
                        sy[pl.ds(lys[m], 32), pl.ds(lxas[m], 256)], -d)
                    sup = jnp.concatenate(
                        [regs8[:, 32 * m:32 * m + 32], sup[:, 32:]], axis=1)
                    sy[pl.ds(lys[m], 32), pl.ds(lxas[m], 256)] = \
                        lane_roll_narrow(sup, d)

            # ---- chroma: 32-lane slots, cb | cr halves per MB ----
            # the whole section is skipped when no chroma edge is
            # active (EDGE_SKIP only; em >= 0 is always-true otherwise)
            _cp = (em >> 8) & 0xF != 0 if EDGE_SKIP else em >= 0
            @pl.when(_cp)
            def _():
                cys = [pl.multiple_of(r * 8, 8) for r in rs]
                cxs = [c * 8 + PL - 4 for c in cs]
                cxas = [pl.multiple_of((cx // 128) * 128, 128)
                        for cx in cxs]
                cparts = []
                for m in range(G):
                    for ref in (scb, scr):
                        sup = lane_roll_narrow(
                            ref[pl.ds(cys[m], 16), pl.ds(cxas[m], 256)],
                            -(cxs[m] - cxas[m]))
                        cparts.append(sup[:, 0:16])
                cregs = jnp.concatenate(cparts, axis=1).astype(jnp.int32)
                # half lane j = frame chroma col 8*c_m - 4 + j;
                # rows 8..15 = MB

                cregs = _filter_chroma_group(cregs, vm, hm, em)

                cregs8 = cregs.astype(jnp.uint8)
                for m in range(G):
                    for pi, ref in enumerate((scb, scr)):
                        @pl.when(effs[m] != 0)
                        def _(m=m, pi=pi, ref=ref):
                            d = cxs[m] - cxas[m]
                            sup = lane_roll_narrow(
                                ref[pl.ds(cys[m], 16),
                                    pl.ds(cxas[m], 256)], -d)
                            s = 32 * m + 16 * pi
                            sup = jnp.concatenate(
                                [cregs8[:, s:s + 16], sup[:, 16:]], axis=1)
                            ref[pl.ds(cys[m], 16), pl.ds(cxas[m], 256)] = \
                                lane_roll_narrow(sup, d)

        return 0

    lax.fori_loop(0, GC, group_body, 0)

    @pl.when(step == n_steps - 1)
    def _():
        y_out[:] = sy[pl.ds(PT, H), pl.ds(PL, W)]
        cb_out[:] = scb[pl.ds(PT, Hc), pl.ds(PL, Wc)]
        cr_out[:] = scr[pl.ds(PT, Hc), pl.ds(PL, Wc)]


PLS = 192      # sheared-scratch left pad (>= 36 for the -36 base offset)


def _wf_shear_kernel(smeta_ref, vm_ref, hm_ref, y_in, cb_in, cr_in,
                     y_out, cb_out, cr_out, sy, scb, scr, *,
                     H, W, hm, n_wf):
    """Sheared-layout variant: the scratch stores each 16-pel row band b
    shifted right by 32b (chroma: 8-row bands by 16b), which makes a
    wavefront group's slots share one column: slot m = MB (r0+m, c0-2m)
    has 16(c0-2m) + 32(r0+m) = 16c0 + 32r0 for every m. The whole
    group's supersets then live in ONE (16G+16, 96)-ish window (slot
    pieces at fixed lane offsets: rows-above at 0..32, own band at
    32..64, rows-below at 64..96), so a group costs one load and one
    read-modify-write store instead of 3G + 3G. Out-of-frame slots land
    in dead cells (each scratch row only holds its own band's columns),
    so invalid/padded slots need no masking."""
    Hc, Wc = H // 2, W // 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    RL = 16 * G + 16   # luma load rows (8 above + 16G + 8 below)
    RC = 8 * G + 8     # chroma load rows

    @pl.when(step == 0)
    def _():
        for b in range(hm):
            sy[pl.ds(PT + 16 * b, 16), pl.ds(PLS + 32 * b, W)] = \
                y_in[pl.ds(16 * b, 16), :]
            scb[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, Wc)] = \
                cb_in[pl.ds(8 * b, 8), :]
            scr[pl.ds(PT + 8 * b, 8), pl.ds(PLS + 16 * b, Wc)] = \
                cr_in[pl.ds(8 * b, 8), :]

    def group_body(k, _):
        @pl.when(smeta_ref[k, SM] != 0)
        def _():
            r0 = smeta_ref[k, SM + 1]
            c0 = smeta_ref[k, SM + 2]
            em = smeta_ref[k, SM + 3]          # 12-bit edge-activity mask
            vm = vm_ref[k]                     # (24, LN) V packed params
            hm_ = hm_ref[k]                    # (6, LN) H packed params

            # ---- luma ----
            # Mosaic requires matching lane offsets on non-concat dims, so
            # every piece is first rotated to lane offset 0 (cheap static
            # rolls on the u32-packed view) before assembly.
            ly = pl.multiple_of(r0 * 16, 8)
            lbase = c0 * 16 + r0 * 32 + PLS - 36
            lba = pl.multiple_of((lbase // 128) * 128, 128)
            d = lbase - lba
            L = lane_roll_narrow(sy[pl.ds(ly, RL), pl.ds(lba, 256)], -d)
            L32 = lane_roll_narrow(L, -32)
            L64 = lane_roll_narrow(L, -64)
            parts = []
            for m in range(G):
                parts.append(jnp.concatenate(
                    [L[16 * m:16 * m + 8, 0:32],
                     L32[16 * m + 8:16 * m + 24, 0:32],
                     L64[16 * m + 24:16 * m + 32, 0:32]], axis=0))
            regs = jnp.concatenate(parts, axis=1).astype(jnp.int32)

            regs = _filter_luma_group(regs, vm, hm_, em)

            regs8 = regs.astype(jnp.uint8)
            R = [lane_roll_narrow(regs8, -32 * m)[:, 0:32] if m else
                 regs8[:, 0:32] for m in range(G)]
            # nothing wrote sy between the load and this store, so the
            # initial load L IS the current superset — no reload
            Lf = L
            LfA = Lf[:, 0:32]
            LfB = lane_roll_narrow(Lf, -32)[:, 0:32]
            LfC = lane_roll_narrow(Lf, -64)[:, 0:32]
            # column A: slot m's 8 above rows at 16m; gaps from LfA
            pa = []
            for m in range(G):
                pa += [R[m][0:8], LfA[16 * m + 8:16 * m + 16]]
            pa.append(LfA[16 * G:RL])
            colA = jnp.concatenate(pa, axis=0)
            # column B: slot m's own 16 rows at 16m+8
            pb = [LfB[0:8]]
            pb += [R[m][8:24] for m in range(G)]
            pb.append(LfB[16 * G + 8:RL])
            colB = jnp.concatenate(pb, axis=0)
            # column C: slot m's 8 below rows at 16m+24; gaps from LfC
            pc = [LfC[0:24]]
            for m in range(G):
                pc.append(R[m][24:32])
                if m < G - 1:
                    pc.append(LfC[16 * m + 32:16 * m + 40])
            colC = jnp.concatenate(pc, axis=0)
            upd = jnp.concatenate([colA, colB, colC, Lf[:, 96:256]], axis=1)
            sy[pl.ds(ly, RL), pl.ds(lba, 256)] = lane_roll_narrow(upd, d)

            # ---- chroma: one load/store per plane, cb|cr slot halves ----
            # skipped entirely when no chroma edge is active
            # (EDGE_SKIP only; em >= 0 is always-true otherwise)
            _cp = (em >> 8) & 0xF != 0 if EDGE_SKIP else em >= 0
            @pl.when(_cp)
            def _():
                cy = pl.multiple_of(r0 * 8, 8)
                cbase = c0 * 8 + r0 * 16 + PLS - 20
                cba = pl.multiple_of((cbase // 128) * 128, 128)
                dc = cbase - cba
                Lc = [lane_roll_narrow(
                    ref[pl.ds(cy, RC), pl.ds(cba, 256)], -dc)
                    for ref in (scb, scr)]
                Lc16 = [lane_roll_narrow(Lp, -16) for Lp in Lc]
                cparts = []
                for m in range(G):
                    for Lp, Lp16 in zip(Lc, Lc16):
                        cparts.append(jnp.concatenate(
                            [Lp[8 * m:8 * m + 8, 0:16],
                             Lp16[8 * m + 8:8 * m + 16, 0:16]], axis=0))
                cregs = jnp.concatenate(cparts, axis=1).astype(jnp.int32)

                cregs = _filter_chroma_group(cregs, vm, hm_, em)

                cregs8 = cregs.astype(jnp.uint8)
                for pi, ref in enumerate((scb, scr)):
                    Cm = [lane_roll_narrow(
                        cregs8, -(32 * m + 16 * pi))[:, 0:16]
                        if (32 * m + 16 * pi) else cregs8[:, 0:16]
                        for m in range(G)]
                    Lf = Lc[pi]          # initial load still current
                    LfB = Lc16[pi][:, 0:16]
                    colA = jnp.concatenate(
                        [jnp.concatenate([Cm[m][0:8] for m in range(G)],
                                         axis=0),
                         Lf[8 * G:RC, 0:16]], axis=0)
                    colB = jnp.concatenate(
                        [LfB[0:8]] + [Cm[m][8:16] for m in range(G)],
                        axis=0)
                    upd = jnp.concatenate([colA, colB, Lf[:, 32:256]],
                                          axis=1)
                    ref[pl.ds(cy, RC), pl.ds(cba, 256)] = \
                        lane_roll_narrow(upd, dc)

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


def _pack(alpha, tc, beta, bs):
    return (alpha << 14) | (tc << 9) | (beta << 3) | bs


def _compact_map(bs_left, bs_top, l_alpha, l_beta, l_tc0,
                 c_alpha, c_beta, c_tc0):
    """Per-MB compact packed parameter columns (nMB, 218), elementwise
    only (no gathers). Column 0 = any-edge flag; see module docstring
    for the kernel row layout the columns map onto."""
    n = bs_left.shape[0]

    def sel_tc(bs, tc3):
        # tc0[clip(bs-1,0,2)] via elementwise selects
        t0 = jnp.broadcast_to(tc3[..., 0:1], bs.shape)
        t1 = jnp.broadcast_to(tc3[..., 1:2], bs.shape)
        t2 = jnp.broadcast_to(tc3[..., 2:3], bs.shape)
        return jnp.where(bs <= 1, t0, jnp.where(bs == 2, t1, t2))

    blv = bs_left.reshape(n, 4, 4)               # (n, group, edge)
    bth = bs_top.reshape(n, 4, 4)                # (n, edge, group)

    # luma V: value at row 4e+g (kernel repeats over pel rows)
    bs_v = blv.transpose(0, 2, 1)                # (n, 4e, 4g)
    cls_v = np.array([2, 0, 0, 0])
    pv = _pack(l_alpha[:, cls_v, None], sel_tc(bs_v, l_tc0[:, cls_v]),
               l_beta[:, cls_v, None], bs_v).reshape(n, 16)

    # luma H: final 32-lane pattern per edge (pel col p -> group p//4)
    bs_h = jnp.repeat(bth, 4, axis=2)            # (n, 4v, 16)
    cls_h = np.array([1, 0, 0, 0])
    ph = _pack(l_alpha[:, cls_h, None], sel_tc(bs_h, l_tc0[:, cls_h]),
               l_beta[:, cls_h, None], bs_h)
    ph = jnp.pad(ph, ((0, 0), (0, 0), (4, 12)))              # (n,4,32)

    # chroma V: value at row 4e'+g (bs_left index 4g+2e')
    bs_cv = blv[:, :, ::2].transpose(0, 2, 1)    # (n, 2e', 4g)
    cls_c = np.array([2, 0])
    pcv = _pack(c_alpha[:, cls_c, None], sel_tc(bs_cv, c_tc0[:, cls_c]),
                c_beta[:, cls_c, None], bs_cv).reshape(n, 8)

    # chroma H: final 16-lane pattern per edge (bs_top index 8v'+g)
    bs_ch = jnp.repeat(bth[:, ::2], 2, axis=2)   # (n, 2v', 8)
    cls_ch = np.array([1, 0])
    pch = _pack(c_alpha[:, cls_ch, None], sel_tc(bs_ch, c_tc0[:, cls_ch]),
                c_beta[:, cls_ch, None], bs_ch)
    pch = jnp.pad(pch, ((0, 0), (0, 0), (4, 4)))             # (n,2,16)

    # chroma H pattern duplicated for the cb|cr halves of a 32-lane slot
    pch32 = jnp.concatenate([pch, pch], axis=2)              # (n,2,32)

    anyedge = ((bs_left.max(axis=1) > 0) | (bs_top.max(axis=1) > 0))

    # 12-bit per-MB edge-activity mask (bit e = any nonzero bS on that
    # edge): 0..3 luma V, 4..7 luma H, 8..9 chroma V, 10..11 chroma H.
    # Per-group ORs of this mask let the kernel skip inactive edges.
    act_lv = (bs_v.max(axis=2) > 0)                      # (n, 4)
    act_lh = (bth.max(axis=2) > 0)                       # (n, 4)
    act_cv = (bs_cv.max(axis=2) > 0)                     # (n, 2)
    act_ch = (bth[:, ::2].max(axis=2) > 0)               # (n, 2)
    bits = jnp.concatenate([act_lv, act_lh, act_cv, act_ch], axis=1)
    emask = (bits.astype(jnp.int32)
             * (1 << jnp.arange(12))[None, :]).sum(axis=1)

    v = jnp.concatenate([pv, pcv], axis=1)                   # (n, 24)
    h = jnp.concatenate([ph.reshape(n, 4, 32), pch32],
                        axis=1).reshape(n, 192)              # (n, 6*32)
    return jnp.concatenate(
        [anyedge[:, None].astype(jnp.int32), v, h,
         emask[:, None]], axis=1)                            # (n, 218)


def _wavefront_arrange(arr, width_mbs, height_mbs, hm_pad):
    """Raster (nMB, C) -> wavefront-major (nW, hm_pad, C) WITHOUT
    gathers: anti-diagonal w's MB ids are w + r*(wm-2), so row r of the
    view is one static strided slice. Exact cover: (hm-1)(wm-2) +
    2(hm-1) + wm = hm*wm. Invalid slots (r outside w's interval) carry
    other diagonals' data and MUST be masked by the caller's validity."""
    wm, hm = width_mbs, height_mbs
    s = wm - 2
    n_wf = 2 * (hm - 1) + wm
    rows = [arr[r * s: r * s + n_wf] for r in range(hm)]
    zeros = jnp.zeros_like(rows[0])
    rows += [zeros] * (hm_pad - hm)
    return jnp.stack(rows, axis=1)               # (nW, hm_pad, C)


def deblock_frame_wavefront(y, cb, cr, mb_class, nnz, mv, ref_slot,
                            slice_id, disable_dblk, qp_y, filter_off_a,
                            filter_off_b, chroma_qp_offset, width_mbs,
                            height_mbs, interpret=False, shear=True):
    """Drop-in replacement for ops.deblock.deblock_frame on TPU."""
    from .deblock import boundary_strengths, edge_thresholds

    bs_left, bs_top = boundary_strengths(
        mb_class.astype(jnp.int32), nnz.astype(jnp.int32),
        mv.astype(jnp.int32), ref_slot.astype(jnp.int32),
        slice_id.astype(jnp.int32), disable_dblk.astype(jnp.int32),
        width_mbs, height_mbs)
    l_alpha, l_beta, l_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        width_mbs, height_mbs, chroma=False)
    c_alpha, c_beta, c_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        width_mbs, height_mbs, chroma=True)
    return deblock_frame_wavefront_from_bs(
        y, cb, cr, bs_left, bs_top, l_alpha, l_beta, l_tc0, c_alpha,
        c_beta, c_tc0, width_mbs, height_mbs, interpret=interpret,
        shear=shear)


def deblock_frame_wavefront_from_bs(y, cb, cr, bs_left, bs_top, l_alpha,
                                    l_beta, l_tc0, c_alpha, c_beta, c_tc0,
                                    width_mbs, height_mbs, interpret=False,
                                    shear=True):
    """Wavefront kernel on externally computed boundary strengths and
    thresholds (the row-sharded stripe steps adjust bS at stripe
    boundaries before filtering — parallel.rowshard)."""
    from .pallas_deblock import deblock_frame_pallas_from_bs

    if width_mbs < 3:
        return deblock_frame_pallas_from_bs(
            y, cb, cr, bs_left, bs_top, l_alpha, l_beta, l_tc0, c_alpha,
            c_beta, c_tc0, width_mbs, height_mbs, interpret=interpret)

    hm_pad, n_wf, sm_static = _wavefront_layout(width_mbs, height_mbs)
    compact = _compact_map(bs_left, bs_top, l_alpha, l_beta, l_tc0,
                           c_alpha, c_beta, c_tc0)
    n_groups = n_wf * (hm_pad // G)
    # per-COMPONENT arranges (not one (nMB, 218) arrange + slicing): the
    # monolithic arrangement forced XLA to materialize a full-width
    # layout copy of the (nGroups, G, 218) array (~0.7 ms/frame at
    # 1080p); the split keeps each downstream consumer's relayout to its
    # own columns
    arr = partial(_wavefront_arrange, width_mbs=width_mbs,
                  height_mbs=height_mbs, hm_pad=hm_pad)
    wf_any = arr(compact[:, 0]).reshape(n_groups, G)
    wf_em = arr(compact[:, 217]).reshape(n_groups, G)
    wf_v = arr(compact[:, 1:25]).reshape(n_groups, G, 24)
    wf_h = arr(compact[:, 25:217]).reshape(n_groups, G, 192)

    valid = jnp.asarray(sm_static[:, 2 * G:3 * G])          # (nG, G)
    eff = ((wf_any != 0) & (valid != 0)).astype(jnp.int32)
    # group edge-activity mask: OR of the effective slots' 12-bit masks
    ms = jnp.where(eff != 0, wf_em.astype(jnp.int32), 0)
    gmask = functools.reduce(jnp.bitwise_or,
                             [ms[:, m] for m in range(G)])
    smeta = jnp.asarray(sm_static) \
        .at[:, 2 * G:3 * G].set(eff) \
        .at[:, SM].set(eff.max(axis=1)) \
        .at[:, SM + 3].set(gmask)

    # kernel map tensors (invalid slots need no masking: their lanes are
    # computed but never stored). V values slot-broadcast over 32 lanes;
    # H rows carry the final lane patterns per slot.
    vmap_ = jnp.repeat(wf_v.transpose(0, 2, 1), 32, axis=2)
    hmap = wf_h.reshape(n_groups, G, 6, 32) \
        .transpose(0, 2, 1, 3).reshape(n_groups, 6, LN)

    n_steps = max(1, -(-n_groups // GC))
    padg = n_steps * GC - n_groups
    if padg:
        smeta = jnp.pad(smeta, ((0, padg), (0, 0)))
        vmap_ = jnp.pad(vmap_, ((0, padg), (0, 0), (0, 0)))
        hmap = jnp.pad(hmap, ((0, padg), (0, 0), (0, 0)))

    H, W = height_mbs * 16, width_mbs * 16
    Hc, Wc = H // 2, W // 2
    if shear:
        hp = 16 * hm_pad + 24
        wp = _round128(PLS + 16 * (width_mbs + 2 * G - 3)
                       + 32 * (hm_pad - G)) + 384
        hpc = 8 * hm_pad + 16
        wpc = _round128(PLS + 8 * (width_mbs + 2 * G - 3)
                        + 16 * (hm_pad - G)) + 384
        kern = partial(_wf_shear_kernel, H=H, W=W, hm=height_mbs,
                       n_wf=n_wf)
    else:
        hp = PT + H + 24
        hp += (-hp) % 8
        wp = _round128(PL + W - 4) + 256
        hpc = PT + Hc + 8
        hpc += (-hpc) % 8
        wpc = _round128(PL + Wc - 4) + 256
        kern = partial(_wf_kernel, H=H, W=W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((GC, SM + 4), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((GC, 24, LN), lambda i: (i, 0, 0)),
            pl.BlockSpec((GC, 6, LN), lambda i: (i, 0, 0)),
            pl.BlockSpec((H, W), lambda i: (0, 0)),
            pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
            pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((H, W), lambda i: (0, 0)),
                   pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
                   pl.BlockSpec((Hc, Wc), lambda i: (0, 0))],
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.uint8),
                        pltpu.VMEM((hpc, wpc), jnp.uint8),
                        pltpu.VMEM((hpc, wpc), jnp.uint8)],
    )
    out_y, out_cb, out_cr = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint8),
                   jax.ShapeDtypeStruct((Hc, Wc), jnp.uint8),
                   jax.ShapeDtypeStruct((Hc, Wc), jnp.uint8)],
        interpret=interpret,
        input_output_aliases={3: 0, 4: 1, 5: 2},
    )(smeta, vmap_, hmap, y, cb, cr)
    return out_y, out_cb, out_cr
