"""Pallas TPU motion-compensation kernels.

Replaces the XLA gather formulation of ops.inter for the decode hot path:
XLA gathers run on the scalar core at ~10 ns/element, pricing a 1080p
P frame's 10.6M window samples at ~180 ms. Here the (edge-padded)
reference planes live in VMEM and windows are *vector loads* at
per-macroblock dynamic offsets, lane-packed so the 6-tap/bilinear math
runs at full VPU width:

 * uniform kernels — one MV per MB (every MB not on the front-end's
   mv-exception list, ~94%): 4 MBs' (21, 24) luma windows pack one
   128-lane register row; all 16 fractional cases (reference
   lumaFracPos dispatch, h264bsd_reconstruct.c:1818-1940) are computed
   with lane/sublane shifts and selected per window by a frac lane-map.
 * exception kernels — per-4x4-block motion (P_16x8/8x16/8x8): 8 blocks'
   (9, 16) windows pack 128 lanes; same case math at block granularity.

Mosaic only allows dynamic vector loads at (8, 128)-aligned offsets, so
each window load grabs an aligned superset and rotates the residual away
(dynamic pltpu.roll); stores are fully static — kernels emit packed
group-layout tiles that XLA reshapes back to the MB grid.

Frame-border "overfill" (h264bsdFillBlock reconstruct.c:2244 == clamp
every sample coordinate into the frame) is reproduced by edge-padding
the reference planes and clamping each window's origin so fully-outside
windows land entirely in the padding (which replicates the border
row/column). Bit-exactness vs ops.inter is pinned by
tests/test_pallas_mc.py in interpreter mode and by the on-TPU bench
verification pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import lane_roll_narrow

PAD = 24      # luma edge padding (window span 23 + clamp slack)
CPAD = 16     # chroma edge padding (window span 9)
LWIN = 32     # luma window lane pitch (4 windows = 128 lanes)
LGRP = 4      # luma windows per packed row
CWIN = 16     # chroma window lane pitch (8 windows = 128 lanes)
CGRP = 8
GU = 32       # uniform MBs per grid step
GEL = 64      # exception blocks per luma grid step ((64/8)*4 = 32 tile rows)
GEC = 256     # exception blocks per chroma grid step ((256/16)*2 = 32 rows)


def _round128(x):
    return -(-x // 128) * 128


def _load_win(ref, r, y0, x0, rows, cols, tall):
    """Dynamic-offset window load. Mosaic requires dynamic offsets at
    (8, 128) granularity, so load the aligned (tall, 256) superset and
    rotate the residuals away (dynamic rolls), then slice. The lane roll
    runs on the u32-packed view of the u8 superset (lane_roll_narrow —
    4x fewer vregs than widening first; window loads dominate the
    kernel's cycle count) and the sublane roll on the narrow sliced
    window."""
    y0a = pl.multiple_of((y0 // 8) * 8, 8)
    x0a = pl.multiple_of((x0 // 128) * 128, 128)
    w = ref[r, pl.ds(y0a, tall), pl.ds(x0a, 256)]
    w = lane_roll_narrow(w, -(x0 - x0a))
    w = w[:, 0:cols].astype(jnp.int32)
    w = pltpu.roll(w, -(y0 - y0a), 0)
    return w[0:rows, :]


def _lshift(x, k):
    """Rotate lanes left by static k (lane l takes value of lane l+k;
    wrapped lanes land in unused slack and are never read)."""
    if k == 0:
        return x
    return jnp.concatenate([x[:, k:], x[:, :k]], axis=1)


def _tap6_lanes(w):
    """Horizontal 6-tap (1,-5,20,20,-5,1): lane c gets the tap over lanes
    c..c+5 (unshifted sum)."""
    return (_lshift(w, 0) - 5 * _lshift(w, 1) + 20 * _lshift(w, 2)
            + 20 * _lshift(w, 3) - 5 * _lshift(w, 4) + _lshift(w, 5))


def _tap6_rows(w, r0, n):
    """Vertical 6-tap: row r (of n) gets the tap over rows r0+r..r0+r+5."""
    return (w[r0:r0 + n] - 5 * w[r0 + 1:r0 + 1 + n]
            + 20 * w[r0 + 2:r0 + 2 + n] + 20 * w[r0 + 3:r0 + 3 + n]
            - 5 * w[r0 + 4:r0 + 4 + n] + w[r0 + 5:r0 + 5 + n])


def _clip8(x):
    return jnp.clip(x, 0, 255)


def _avg(a, b):
    return (a + b + 1) >> 1


def _luma_cases(w, n_out):
    """All 16 fractional predictions for a packed window array.

    w: (n_out + 5, 128) int32 — window rows (output row r uses window rows
    r..r+5); lane c of each window carries column c (output col c reads
    window cols c..c+5 via lane shifts). Case indexing matches
    ops.inter.luma_predict_blocks (xFrac*4 + yFrac)."""
    B = _tap6_lanes(w)
    b_full = _clip8((B + 16) >> 5)
    H_ = _tap6_rows(w, 0, n_out)
    h_full = _clip8((H_ + 16) >> 5)
    M = _tap6_rows(B, 0, n_out)
    j = _clip8((M + 512) >> 10)

    g = _lshift(w, 2)[2:2 + n_out]
    g_right = _lshift(w, 3)[2:2 + n_out]
    g_down = _lshift(w, 2)[3:3 + n_out]
    b0 = b_full[2:2 + n_out]
    b1 = b_full[3:3 + n_out]
    h0 = _lshift(h_full, 2)
    h1 = _lshift(h_full, 3)

    return [
        g,                  # 0  G
        _avg(g, h0),        # 1  d
        h0,                 # 2  h
        _avg(g_down, h0),   # 3  n
        _avg(g, b0),        # 4  a
        _avg(b0, h0),       # 5  e
        _avg(h0, j),        # 6  i
        _avg(b1, h0),       # 7  p
        b0,                 # 8  b
        _avg(b0, j),        # 9  f
        j,                  # 10 j
        _avg(b1, j),        # 11 q
        _avg(g_right, b0),  # 12 c
        _avg(b0, h1),       # 13 g
        _avg(h1, j),        # 14 k
        _avg(b1, h1),       # 15 r
    ]


def _select_cases(cases, fmap):
    out = cases[0]
    for cid in range(1, 16):
        out = jnp.where(fmap == cid, cases[cid], out)
    return out


def _scalar_lane_map(vals, rows, pitch):
    """Broadcast per-window scalars onto their lane ranges."""
    lane = lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    wmap = lane // pitch
    out = jnp.full((rows, 128), vals[0], jnp.int32)
    for w in range(1, len(vals)):
        out = jnp.where(wmap == w, vals[w], out)
    return out


# ---------------------------------------------------------------------------
# Kernels. Outputs are packed group tiles (static stores only):
#   uniform luma  : one (16, 128) tile per 4-MB group
#   uniform chroma: one (8, 128) cb + cr tile per 8-MB group
#   exc luma      : one (4, 128) tile per 8-block group
#   exc chroma    : one (2, 128) cb + cr tile per 16-block group
# ---------------------------------------------------------------------------

def _uniform_luma_kernel(meta_ref, refs_ref, out_ref, *, n_mbs,
                         rowtile=False):
    """Two 4-MB groups are row-stacked (windows at row strides 0 and 21)
    so the 16-case filter math runs once per 8 MBs: outputs land at rows
    0..15 and 21..36 of the 37-row case tensors; rows 16..20 straddle the
    window boundary and are never selected."""
    base = pl.program_id(0) * GU

    def pair(g2, _):
        zpad = jnp.zeros((21, LWIN - 24), jnp.int32)
        stack, fr = [], []
        for half in range(2):
            wins = []
            for wslot in range(LGRP):
                m = jnp.minimum(base + (2 * g2 + half) * LGRP + wslot,
                                n_mbs - 1) - base
                fr.append(meta_ref[m, 2])
                wins.extend([_load_win(refs_ref, meta_ref[m, 3],
                                       meta_ref[m, 0], meta_ref[m, 1],
                                       21, 24, 32), zpad])
            stack.append(jnp.concatenate(wins, axis=1))
        pk = jnp.concatenate(stack, axis=0)              # (42, 128)
        sel = jnp.concatenate(
            [_scalar_lane_map(fr[0:LGRP], 21, LWIN),
             _scalar_lane_map(fr[LGRP:], 16, LWIN)], axis=0)
        res = _clip8(_select_cases(_luma_cases(pk, 37), sel))
        if rowtile:
            # compact the two 4-MB halves (32-lane window pitch, low 16
            # lanes meaningful) into ONE plane-chunk tile: 8 consecutive
            # MBs at 16-lane pitch — the "rowtile" layout that is a
            # single major-dim reshape from the plane (int32-domain
            # concats; the u8 cast happens once on the assembled tile)
            # per-half concats: mixing res[0:16] (sublane offset 0) and
            # res[21:37] (offset 5) slices in ONE concatenate trips a
            # Mosaic "offset mismatch on non-concat dimension" error, so
            # each half compacts among same-offset inputs and lands in
            # its own 64-lane store
            for half, h in enumerate((res[0:16], res[21:37])):
                comp = jnp.concatenate(
                    [h[:, 32 * k:32 * k + 16] for k in range(LGRP)],
                    axis=1)
                out_ref[pl.ds(g2 * 16, 16),
                        pl.ds(64 * half, 64)] = comp.astype(jnp.uint8)
        else:
            out_ref[pl.ds(g2 * 32, 16), :] = res[0:16].astype(jnp.uint8)
            out_ref[pl.ds(g2 * 32 + 16, 16), :] = \
                res[21:37].astype(jnp.uint8)
        return 0

    lax.fori_loop(0, GU // (2 * LGRP), pair, 0, unroll=True)


def _uniform_chroma_kernel(meta_ref, rcb_ref, rcr_ref, ocb_ref, ocr_ref, *,
                           n_mbs, rowtile=False):
    """Two 8-MB groups per output tile: each group's bilinear result
    (8 MBs at 16-lane window pitch, low 8 lanes meaningful) compacts to
    a 64-lane half-chunk, the pair forming one (8, 128) tile — 16
    consecutive MBs' chroma in the half-chunk rowtile layout."""
    base = pl.program_id(0) * GU

    def pair(p2, _):
        halves_b, halves_r = [], []
        zpad = jnp.zeros((9, CWIN - 12), jnp.int32)
        for half in range(2):
            winsb, winsr, xf, yf = [], [], [], []
            for wslot in range(CGRP):
                m = jnp.minimum(base + (2 * p2 + half) * CGRP + wslot,
                                n_mbs - 1) - base
                xf.append(meta_ref[m, 6])
                yf.append(meta_ref[m, 7])
                r = meta_ref[m, 3]
                winsb.extend([_load_win(rcb_ref, r, meta_ref[m, 4],
                                        meta_ref[m, 5], 9, 12, 16), zpad])
                winsr.extend([_load_win(rcr_ref, r, meta_ref[m, 4],
                                        meta_ref[m, 5], 9, 12, 16), zpad])
            pkb = jnp.concatenate(winsb, axis=1)
            pkr = jnp.concatenate(winsr, axis=1)
            cxf = _scalar_lane_map(xf, 8, CWIN)
            cyf = _scalar_lane_map(yf, 8, CWIN)

            def bilinear(pk):
                a = pk[0:8]
                b = _lshift(pk, 1)[0:8]
                c = pk[1:9]
                d = _lshift(pk, 1)[1:9]
                return ((8 - cxf) * (8 - cyf) * a + cxf * (8 - cyf) * b +
                        (8 - cxf) * cyf * c + cxf * cyf * d + 32) >> 6

            if rowtile:
                for out, t in ((halves_b, bilinear(pkb)),
                               (halves_r, bilinear(pkr))):
                    out.append(jnp.concatenate(
                        [t[:, 16 * k:16 * k + 8] for k in range(CGRP)],
                        axis=1))
            else:
                g = 2 * p2 + half
                ocb_ref[pl.ds(g * 8, 8), :] = \
                    bilinear(pkb).astype(jnp.uint8)
                ocr_ref[pl.ds(g * 8, 8), :] = \
                    bilinear(pkr).astype(jnp.uint8)
        if rowtile:
            ocb_ref[pl.ds(p2 * 8, 8), :] = \
                jnp.concatenate(halves_b, axis=1).astype(jnp.uint8)
            ocr_ref[pl.ds(p2 * 8, 8), :] = \
                jnp.concatenate(halves_r, axis=1).astype(jnp.uint8)
        return 0

    lax.fori_loop(0, GU // (2 * CGRP), pair, 0, unroll=True)


def _exc_luma_kernel(nreal_ref, meta_ref, refs_ref, out_ref, *, n_blocks):
    base = pl.program_id(0) * GEL

    def group(g, _):
        @pl.when(base + g * CGRP < nreal_ref[0])
        def _():
            wins, fr = [], []
            for wslot in range(CGRP):
                m = jnp.minimum(base + g * CGRP + wslot, n_blocks - 1) - base
                fr.append(meta_ref[m, 2])
                wins.append(_load_win(refs_ref, meta_ref[m, 3],
                                      meta_ref[m, 0], meta_ref[m, 1],
                                      9, 16, 16))
            pk = jnp.concatenate(wins, axis=1)
            sel = _scalar_lane_map(fr, 4, CWIN)
            res = _clip8(_select_cases(_luma_cases(pk, 4), sel))
            out_ref[pl.ds(g * 4, 4), :] = res.astype(jnp.uint8)
        return 0

    lax.fori_loop(0, GEL // CGRP, group, 0, unroll=True)


def _exc_chroma_kernel(nreal_ref, meta_ref, rcb_ref, rcr_ref, ocb_ref,
                       ocr_ref, *, n_blocks):
    base = pl.program_id(0) * GEC
    NW = 16

    def group(g, _):
        @pl.when(base + g * NW < nreal_ref[0])
        def _():
            _group_body(g)
        return 0

    def _group_body(g):
        winsb, winsr, xf, yf = [], [], [], []
        for wslot in range(NW):
            m = jnp.minimum(base + g * NW + wslot, n_blocks - 1) - base
            xf.append(meta_ref[m, 10])
            yf.append(meta_ref[m, 11])
            r = meta_ref[m, 3]
            winsb.append(_load_win(rcb_ref, r, meta_ref[m, 8],
                                   meta_ref[m, 9], 3, 8, 16))
            winsr.append(_load_win(rcr_ref, r, meta_ref[m, 8],
                                   meta_ref[m, 9], 3, 8, 16))
        pkb = jnp.concatenate(winsb, axis=1)
        pkr = jnp.concatenate(winsr, axis=1)
        cxf = _scalar_lane_map(xf, 2, 8)
        cyf = _scalar_lane_map(yf, 2, 8)

        def bilinear(pk):
            a = pk[0:2]
            b = _lshift(pk, 1)[0:2]
            c = pk[1:3]
            d = _lshift(pk, 1)[1:3]
            return (((8 - cxf) * (8 - cyf) * a + cxf * (8 - cyf) * b +
                     (8 - cxf) * cyf * c + cxf * cyf * d + 32) >> 6) \
                .astype(jnp.uint8)

        ocb_ref[pl.ds(g * 2, 2), :] = bilinear(pkb)
        ocr_ref[pl.ds(g * 2, 2), :] = bilinear(pkr)

    lax.fori_loop(0, GEC // NW, group, 0, unroll=True)


# ---------------------------------------------------------------------------
# XLA glue
# ---------------------------------------------------------------------------

def _pad_edge(planes, pad):
    """Edge-pad, plus extra bottom/right zeros so every aligned (8, 128)
    superset load stays in bounds."""
    n, h, w = planes.shape
    hp = -(-(h + 2 * pad + 32) // 8) * 8
    wp = _round128(w + 2 * pad) + 256
    out = jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad)), mode="edge")
    return jnp.pad(out, ((0, 0), (0, hp - (h + 2 * pad)),
                         (0, wp - (w + 2 * pad))))


def _ref_index(base_slot, used_slots):
    ridx = jnp.zeros_like(base_slot)
    for i in range(used_slots.shape[0]):
        ridx = jnp.where(base_slot == used_slots[i], i, ridx)
    return ridx


def _run(kernel, meta, refs, n_out_specs, out_rows, block_mbs,
         interpret, nreal=None):
    steps = meta.shape[0] // block_mbs
    mcols = meta.shape[1]
    specs = []
    args = []
    if nreal is not None:
        specs.append(pl.BlockSpec((1,), lambda i: (0,),
                                  memory_space=pltpu.SMEM))
        args.append(nreal.reshape(1).astype(jnp.int32))
    specs.append(pl.BlockSpec((block_mbs, mcols), lambda i: (i, 0),
                              memory_space=pltpu.SMEM))
    args.append(meta)
    specs += [pl.BlockSpec(x.shape, lambda i: (0, 0, 0)) for x in refs]
    args += list(refs)
    outs = [pl.BlockSpec((out_rows, 128), lambda i: (i, 0))
            for _ in range(n_out_specs)]
    shapes = [jax.ShapeDtypeStruct((steps * out_rows, 128), jnp.uint8)
              for _ in range(n_out_specs)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(steps,),
            in_specs=specs,
            out_specs=outs if n_out_specs > 1 else outs[0]),
        out_shape=shapes if n_out_specs > 1 else shapes[0],
        interpret=interpret,
    )(*args)


def _tiles_to_grid(t, grp, pitch, size):
    """(n_groups*size, 128) packed tiles -> (n_windows, size, size)."""
    t = t.reshape(-1, size, grp, pitch)[:, :, :, :size]
    return t.transpose(0, 2, 1, 3).reshape(-1, size, size)


REF_GROUP = 4   # DPB slots whose padded planes fit VMEM per kernel pass


def mc_predict_grids(dpb_y, dpb_cb, dpb_cr, mv, ref_slot, exc_ids,
                     used_slots, width_mbs, height_mbs, interpret=False,
                     mb_row_offset=0, luma_rowtile=False):
    """Motion compensation for the whole frame on TPU via Pallas.

    mv: (nMB, 16, 2) int32 quarter-pel; ref_slot: (nMB, 16) int32;
    exc_ids: (excCap,) int32 MB indices with per-block motion (padding
    entries == nMB); used_slots: (refCap,) int32 DPB slots referenced this
    frame (padded by repetition). Returns (y, cb, cr) uint8 MB grids
    ((nMB,16,16)/(nMB,8,8)); values meaningful only for inter MBs.

    refCap may exceed REF_GROUP (the DPB allows 16 reference frames,
    reference h264bsd_seq_param_set.c:488 / cfg.h:44, but only ~REF_GROUP
    padded planes fit VMEM): the kernels then run once per REF_GROUP-slot
    group and the results merge per 4x4 block by reference membership —
    every block's slot is in exactly one pass's ref list (padding repeats
    a slot already covered, whose passes agree).
    """
    n_groups = -(-used_slots.shape[0] // REF_GROUP)
    if n_groups <= 1:
        return _mc_predict_group(dpb_y, dpb_cb, dpb_cr, mv, ref_slot,
                                 exc_ids, used_slots, width_mbs,
                                 height_mbs, interpret, mb_row_offset,
                                 luma_rowtile)
    if luma_rowtile:
        raise ValueError("luma_rowtile needs a single REF_GROUP pass "
                         "(used_slots cap <= %d)" % REF_GROUP)
    out = None
    for g in range(n_groups):
        grp = used_slots[g * REF_GROUP:(g + 1) * REF_GROUP]
        res = _mc_predict_group(dpb_y, dpb_cb, dpb_cr, mv, ref_slot,
                                exc_ids, grp, width_mbs, height_mbs,
                                interpret, mb_row_offset)
        if out is None:
            out = res
            continue
        in_grp = jnp.zeros(ref_slot.shape, jnp.bool_)
        for j in range(REF_GROUP):
            in_grp |= ref_slot == grp[j]
        blk = in_grp.reshape(-1, 4, 4)   # raster 4x4 blocks of the MB
        m16 = jnp.repeat(jnp.repeat(blk, 4, 1), 4, 2)
        m8 = jnp.repeat(jnp.repeat(blk, 2, 1), 2, 2)
        out = (jnp.where(m16, res[0], out[0]),
               jnp.where(m8, res[1], out[1]),
               jnp.where(m8, res[2], out[2]))
    return out


def _mc_predict_group(dpb_y, dpb_cb, dpb_cr, mv, ref_slot, exc_ids,
                      used_slots, width_mbs, height_mbs, interpret=False,
                      mb_row_offset=0, luma_rowtile=False):
    """One kernel pass over <= REF_GROUP resident reference slots.

    mb_row_offset shifts MB rows for row-sharded stripes: the mv/exc
    tensors cover a stripe while the reference planes are whole frames
    (parallel.rowshard stripe phases)."""
    n_mb = mv.shape[0]
    H, W = dpb_y.shape[1], dpb_y.shape[2]
    Hc, Wc = H // 2, W // 2

    refs_y = _pad_edge(dpb_y[used_slots], PAD)
    refs_cb = _pad_edge(dpb_cb[used_slots], CPAD)
    refs_cr = _pad_edge(dpb_cr[used_slots], CPAD)

    mb = jnp.arange(n_mb, dtype=jnp.int32)
    mb_y16 = (mb // width_mbs + mb_row_offset) * 16
    mb_x16 = (mb % width_mbs) * 16
    mvx = mv[:, 0, 0]
    mvy = mv[:, 0, 1]
    ridx = _ref_index(jnp.maximum(ref_slot[:, 0], 0), used_slots)

    y0 = jnp.clip(mb_y16 + (mvy >> 2), -19, H + 1) - 2 + PAD
    x0 = jnp.clip(mb_x16 + (mvx >> 2), -21, W + 1) - 2 + PAD
    frac = (mvx & 3) * 4 + (mvy & 3)
    cy0 = jnp.clip((mb_y16 >> 1) + (mvy >> 3), -9, Hc + 1) + CPAD
    cx0 = jnp.clip((mb_x16 >> 1) + (mvx >> 3), -9, Wc + 1) + CPAD
    meta = jnp.stack([y0, x0, frac, ridx, cy0, cx0, mvx & 7, mvy & 7],
                     axis=1).astype(jnp.int32)

    n_steps = max(1, -(-n_mb // GU))
    meta_p = jnp.pad(meta, ((0, n_steps * GU - n_mb), (0, 0)))

    rt = luma_rowtile
    uy = _run(partial(_uniform_luma_kernel, n_mbs=n_mb, rowtile=rt),
              meta_p, [refs_y], 1,
              (GU // 8) * 16 if rt else (GU // LGRP) * 16, GU, interpret)
    ucb, ucr = _run(partial(_uniform_chroma_kernel, n_mbs=n_mb,
                            rowtile=rt), meta_p, [refs_cb, refs_cr], 2,
                    (GU // (2 * CGRP)) * 8 if rt else (GU // CGRP) * 8,
                    GU, interpret)

    # with luma_rowtile the kernels emit plane-chunk tiles (luma: 8
    # consecutive MBs at 16-lane pitch; chroma: two 8-MB 64-lane
    # half-chunks per tile) that pass through untouched; otherwise the
    # proven packed-group layouts reshape to the MB grid as before
    n_g8 = -(-n_mb // 8)
    if rt:
        uy_rt = uy.reshape(-1, 16, 128)[:n_g8]
        cb_rt = ucb.reshape(-1, 8, 2, 64).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 64)[:n_g8]
        cr_rt = ucr.reshape(-1, 8, 2, 64).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 64)[:n_g8]
    else:
        grid_y = _tiles_to_grid(uy, LGRP, LWIN, 16)[:n_mb]
        grid_cb = _tiles_to_grid(ucb, CGRP, CWIN, 8)[:n_mb]
        grid_cr = _tiles_to_grid(ucr, CGRP, CWIN, 8)[:n_mb]

    exc_cap = exc_ids.shape[0]
    if exc_cap:
        # QUAD-grained exceptions: exc_ids = mb*4 + quadrant (padding
        # >= nMB*4), 4 blocks each — a 16x8 MB computes 8 exception
        # blocks instead of the former 16
        qids = jnp.minimum(exc_ids, n_mb * 4 - 1).astype(jnp.int32)
        emb = qids // 4
        equad = qids % 4
        # raster block ids of each quadrant (ops.unpack kQuadBlocks)
        qblk = jnp.asarray([[0, 1, 4, 5], [2, 3, 6, 7],
                            [8, 9, 12, 13], [10, 11, 14, 15]], jnp.int32)
        blks = qblk[equad]                       # (cap, 4)
        emv = mv[emb[:, None], blks]             # (cap, 4, 2)
        eref = ref_slot[emb[:, None], blks]      # (cap, 4)
        bx = jnp.asarray(np.tile([0, 4, 8, 12], 4), jnp.int32)
        by = jnp.asarray(np.repeat([0, 4, 8, 12], 4), jnp.int32)
        e_y16 = ((emb // width_mbs + mb_row_offset) * 16)[:, None] + by[blks]
        e_x16 = ((emb % width_mbs) * 16)[:, None] + bx[blks]
        emvx = emv[..., 0]
        emvy = emv[..., 1]
        eridx = _ref_index(jnp.maximum(eref, 0), used_slots)

        ey0 = jnp.clip(e_y16 + (emvy >> 2), -7, H + 1) - 2 + PAD
        ex0 = jnp.clip(e_x16 + (emvx >> 2), -7, W + 1) - 2 + PAD
        efrac = (emvx & 3) * 4 + (emvy & 3)
        ecy0 = jnp.clip((e_y16 >> 1) + (emvy >> 3), -3, Hc + 1) + CPAD
        ecx0 = jnp.clip((e_x16 >> 1) + (emvx >> 3), -3, Wc + 1) + CPAD

        n_blk = exc_cap * 4
        z = jnp.zeros_like(ey0)
        bmeta = jnp.stack([ey0, ex0, efrac, eridx, z, z, z, z,
                           ecy0, ecx0, emvx & 7, emvy & 7, z, z, z, z],
                          axis=2).reshape(n_blk, 16).astype(jnp.int32)
        pad_l = max(1, -(-n_blk // GEL)) * GEL - n_blk
        pad_c = max(1, -(-n_blk // GEC)) * GEC - n_blk
        bmeta_l = jnp.pad(bmeta, ((0, pad_l), (0, 0)))
        bmeta_c = jnp.pad(bmeta, ((0, pad_c), (0, 0)))

        # real entry count: groups past it exit immediately (the 1.5x cap
        # ladder leaves up to ~50% padding that otherwise computes garbage)
        n_real = jnp.sum(exc_ids < n_mb * 4) * 4
        ey = _run(partial(_exc_luma_kernel, n_blocks=n_blk), bmeta_l,
                  [refs_y], 1, (GEL // CGRP) * 4, GEL, interpret,
                  nreal=n_real)
        ecb, ecr = _run(partial(_exc_chroma_kernel, n_blocks=n_blk),
                        bmeta_c, [refs_cb, refs_cr], 2, (GEC // 16) * 2,
                        GEC, interpret, nreal=n_real)

        def blocks_to_quads(t, pitch, size):
            """Kernel tiles -> (cap, 2*size, 2*size) quadrant pixels
            (block j of a quad is at raster position (j//2, j%2)).
            Assembled with minor-dim concatenates, NOT transposes — u8
            tile transposes lower to sublane/lane shuffles and cost
            ~0.5 ms/frame at 1080p."""
            blk = _tiles_to_grid(t, 128 // pitch, pitch, size)[:n_blk]
            q4 = blk.reshape(exc_cap, 4, size, size)
            top = jnp.concatenate([q4[:, 0], q4[:, 1]], axis=2)
            bot = jnp.concatenate([q4[:, 2], q4[:, 3]], axis=2)
            return jnp.concatenate([top, bot], axis=1)

        # scatter quads into a quad-indexed buffer (ids are unique: one
        # entry per quad), then merge into the MB grid with concatenates
        # + a broadcast quadrant mask — no pixel-layout transposes
        qpresent = jnp.zeros((n_mb * 4,), jnp.bool_) \
            .at[exc_ids].set(True, mode="drop").reshape(n_mb, 2, 2)

        def quad_merge(grid, quads, size):
            s2 = 2 * size
            qbuf = jnp.zeros((n_mb * 4, s2, s2), grid.dtype) \
                .at[exc_ids].set(quads, mode="drop") \
                .reshape(n_mb, 2, 2, s2, s2)
            top = jnp.concatenate([qbuf[:, 0, 0], qbuf[:, 0, 1]], axis=2)
            bot = jnp.concatenate([qbuf[:, 1, 0], qbuf[:, 1, 1]], axis=2)
            tile = jnp.concatenate([top, bot], axis=1)   # (nMB, 4s, 4s)
            mask = jnp.repeat(jnp.repeat(qpresent, s2, axis=1), s2, axis=2)
            return jnp.where(mask, tile, grid)

        if luma_rowtile:
            # rowtile: the exception pixels land in the plane-chunk
            # layouts as 4x4 CELLS in the placement-id domain — one
            # unique-row scatter of 16-value raster rows plus one int32
            # relayout per plane (rowtile_cells_to_tiles), replacing the
            # 2D-window scatter that serialized on TPU (round-4 negative
            # result). Luma quads split into their 4 kernel blocks (no
            # quad assembly at all); a chroma quad IS one 4x4 cell.
            from .unpack import (rowtile_cell_ids, rowtile_cell_scatter,
                                 rowtile_cells_to_tiles,
                                 rowtile_present_to_tiles)
            valid_q = exc_ids < n_mb * 4

            # ONE scatter over the unified [luma | cb | cr] placement
            # domain (separate per-plane scatters each pay the full
            # entry-stream cost). Luma: per-block cells — kernel block j
            # of quad q sits at 4x4-block coords (2*(q//2) + j//2,
            # 2*(q%2) + j%2) in the MB; a chroma quad IS one 4x4 cell,
            # assembled from its four 2x2 kernel blocks by a tiny
            # (cap, 16) transpose.
            n_cl, n_cc = n_g8 * 128, n_g8 * 32
            blk_l = _tiles_to_grid(ey, 128 // CWIN, CWIN, 4)[:n_blk]
            rows_l = blk_l.reshape(n_blk, 16)
            mbb = jnp.repeat(emb, 4)
            qd = jnp.repeat(equad, 4)
            j4 = jnp.tile(jnp.arange(4, dtype=jnp.int32), exc_cap)
            pid_l = rowtile_cell_ids(mbb, (qd // 2) * 2 + j4 // 2,
                                     (qd % 2) * 2 + j4 % 2, 4, 32)
            pid_c = n_cl + rowtile_cell_ids(emb, equad // 2, equad % 2,
                                            2, 16)

            def q16(t):
                blk2 = _tiles_to_grid(t, 128 // 8, 8, 2)[:n_blk]
                return blk2.reshape(exc_cap, 2, 2, 2, 2) \
                    .transpose(0, 1, 3, 2, 4).reshape(exc_cap, 16)

            pids = jnp.concatenate([pid_l, pid_c, n_cc + pid_c])
            vall = jnp.concatenate([jnp.repeat(valid_q, 4), valid_q,
                                    valid_q])
            ups = jnp.concatenate([rows_l, q16(ecb), q16(ecr)])
            cells, pres = rowtile_cell_scatter(pids, vall, ups,
                                               n_cl + 2 * n_cc)
            qt = rowtile_cells_to_tiles(cells[:n_cl], n_g8, 4, 32)
            mask_l = rowtile_present_to_tiles(pres[:n_cl], n_g8, 4, 32)
            cbt = rowtile_cells_to_tiles(cells[n_cl:n_cl + n_cc],
                                         n_g8, 2, 16)
            crt = rowtile_cells_to_tiles(cells[n_cl + n_cc:], n_g8, 2, 16)
            # cb and cr share placements and validity -> one mask
            mask_c = rowtile_present_to_tiles(pres[n_cl:n_cl + n_cc],
                                              n_g8, 2, 16)
            # int32 out: the combine consumes int32 pred anyway, so the
            # merge skips converting the scattered tiles to u8 and back
            uy_rt = jnp.where(mask_l, qt, uy_rt.astype(jnp.int32))
            cb_rt = jnp.where(mask_c, cbt, cb_rt.astype(jnp.int32))
            cr_rt = jnp.where(mask_c, crt, cr_rt.astype(jnp.int32))
            return uy_rt, cb_rt, cr_rt

        grid_y = quad_merge(grid_y, blocks_to_quads(ey, CWIN, 4), 4)
        grid_cb = quad_merge(grid_cb, blocks_to_quads(ecb, 8, 2), 2)
        grid_cr = quad_merge(grid_cr, blocks_to_quads(ecr, 8, 2), 2)

    if luma_rowtile:
        return uy_rt, cb_rt, cr_rt
    return grid_y, grid_cb, grid_cr


def mc_predict_planes(dpb_y, dpb_cb, dpb_cr, mv, ref_slot, exc_ids,
                      used_slots, width_mbs, height_mbs, interpret=False):
    """Plane-shaped variant of mc_predict_grids."""
    from .reconstruct import mb_grid_to_plane
    gy, gcb, gcr = mc_predict_grids(dpb_y, dpb_cb, dpb_cr, mv, ref_slot,
                                    exc_ids, used_slots, width_mbs,
                                    height_mbs, interpret)
    return (mb_grid_to_plane(gy, width_mbs, height_mbs),
            mb_grid_to_plane(gcb, width_mbs, height_mbs),
            mb_grid_to_plane(gcr, width_mbs, height_mbs))
