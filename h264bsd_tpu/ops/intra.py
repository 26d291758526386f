"""Intra prediction (Intra_4x4, Intra_16x16, chroma) over the frame.

Behavioral parity: reference h264bsd_intra_prediction.c — the nine 4x4 modes
(:1486-1825), four 16x16 modes (:993-1153), four chroma modes (:1160-1380),
neighbour-pel gathering (:545-614 / :1390-1470) and prediction+residual+clip
combining (h264bsdAddResidual :927).

TPU-native design: host has already resolved per-block modes and
availability (mbparse.cpp), so this stage is pure pixel math. The hard
constraint is the reconstruction dependency: a 4x4 block predicts from the
*reconstructed* pels of its left/above neighbours, which serializes blocks
inside an MB (zigzag order) and MBs along anti-diagonals. This module
provides the sequential jit-compatible pass (lax.fori_loop over MBs in
raster order, the reference's decode order); the wavefront-parallel Pallas
schedule reuses the same per-MB kernels.

Everything runs in int32 with uint8 planes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# raster block order position within MB (x, y) in pels; the *processing*
# order is zigzag (reference decode order), see ZIGZAG_ORDER
BLOCK_X = np.array([0, 4, 8, 12] * 4, np.int32)
BLOCK_Y = np.repeat(np.arange(4) * 4, 4).astype(np.int32)
# zigzag processing order -> raster block index
ZIG2RAS = np.array([0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15],
                   np.int32)

AVAIL_A, AVAIL_B, AVAIL_C, AVAIL_D = 1, 2, 4, 8


def _clip8(x):
    return jnp.clip(x, 0, 255)


# ---------------------------------------------------------------------------
# 4x4 luma modes. a: (9,) int32 [D, above*4, above-right*4]; l: (5,) int32
# [D, left*4]. Each returns (4, 4) int32 prediction.
# ---------------------------------------------------------------------------

def _i4_vertical(a, l):
    return jnp.broadcast_to(a[1:5], (4, 4))


def _i4_horizontal(a, l):
    return jnp.broadcast_to(l[1:5, None], (4, 4))


def _i4_dc(a, l, avail_a, avail_b):
    both = (jnp.sum(a[1:5]) + jnp.sum(l[1:5]) + 4) >> 3
    only_a = (jnp.sum(l[1:5]) + 2) >> 2
    only_b = (jnp.sum(a[1:5]) + 2) >> 2
    val = jnp.where(avail_a & avail_b, both,
                    jnp.where(avail_a, only_a,
                              jnp.where(avail_b, only_b, 128)))
    return jnp.full((4, 4), val)


def _i4_ddl(a, l):
    # reference Intra4x4DiagonalDownLeftPrediction :1598
    p = a[1:9]
    f = (p[:6] + 2 * p[1:7] + p[2:8] + 2) >> 2  # f[k] over k=x+y
    last = (p[6] + 3 * p[7] + 2) >> 2
    f = jnp.concatenate([f, last[None]])
    idx = np.arange(4)[:, None] + np.arange(4)[None, :]
    return f[idx]


def _i4_ddr(a, l):
    # reference :1637; diag index d = x - y: d>0 from above, d<0 from left
    vals = {}
    m = lambda x, y, z: (x + 2 * y + z + 2) >> 2
    d0 = m(a[1], a[0], l[1])
    d1 = m(a[0], a[1], a[2])
    d2 = m(a[1], a[2], a[3])
    d3 = m(a[2], a[3], a[4])
    dm1 = m(l[0], l[1], l[2])
    dm2 = m(l[1], l[2], l[3])
    dm3 = m(l[2], l[3], l[4])
    diag = jnp.stack([dm3, dm2, dm1, d0, d1, d2, d3])
    idx = 3 + np.arange(4)[None, :] - np.arange(4)[:, None]
    return diag[idx]


def _i4_vr(a, l):
    # reference Intra4x4VerticalRightPrediction :1672
    h2 = lambda x, y: (x + y + 1) >> 1
    m = lambda x, y, z: (x + 2 * y + z + 2) >> 2
    e0 = h2(a[0], a[1]); e1 = h2(a[1], a[2]); e2 = h2(a[2], a[3]); e3 = h2(a[3], a[4])
    o0 = m(a[1], a[0], l[1]); o1 = m(a[0], a[1], a[2])
    o2 = m(a[1], a[2], a[3]); o3 = m(a[2], a[3], a[4])
    r8 = m(l[2], l[1], l[0])
    r12 = m(l[3], l[2], l[1])
    return jnp.array([[e0, e1, e2, e3],
                      [o0, o1, o2, o3],
                      [r8, e0, e1, e2],
                      [r12, o0, o1, o2]])


def _i4_hd(a, l):
    # reference Intra4x4HorizontalDownPrediction :1707
    h2 = lambda x, y: (x + y + 1) >> 1
    m = lambda x, y, z: (x + 2 * y + z + 2) >> 2
    e0 = h2(l[0], l[1]); e1 = h2(l[1], l[2]); e2 = h2(l[2], l[3]); e3 = h2(l[3], l[4])
    o0 = m(a[1], a[0], l[1]); o1 = m(l[0], l[1], l[2])
    o2 = m(l[1], l[2], l[3]); o3 = m(l[2], l[3], l[4])
    t2 = m(a[2], a[1], a[0]); t3 = m(a[3], a[2], a[1])
    return jnp.array([[e0, o0, t2, t3],
                      [e1, o1, e0, o0],
                      [e2, o2, e1, o1],
                      [e3, o3, e2, o2]])


def _i4_vl(a, l):
    # reference Intra4x4VerticalLeftPrediction :1762
    p = a[1:8]
    h = (p[:5] + p[1:6] + 1) >> 1
    m = (p[:5] + 2 * p[1:6] + p[2:7] + 2) >> 2
    return jnp.stack([h[0:4], m[0:4], h[1:5], m[1:5]])


def _i4_hu(a, l):
    # reference Intra4x4HorizontalUpPrediction :1802
    p = l[1:5]
    h2 = lambda x, y: (x + y + 1) >> 1
    m = lambda x, y, z: (x + 2 * y + z + 2) >> 2
    v0 = h2(p[0], p[1]); v1 = m(p[0], p[1], p[2])
    v2 = h2(p[1], p[2]); v3 = m(p[1], p[2], p[3])
    v4 = h2(p[2], p[3]); v5 = (p[2] + 3 * p[3] + 2) >> 2
    v6 = p[3]
    return jnp.array([[v0, v1, v2, v3],
                      [v2, v3, v4, v5],
                      [v4, v5, v6, v6],
                      [v6, v6, v6, v6]])


def predict_4x4(mode, a, l, avail):
    """Dispatch one 4x4 intra mode. When above-right is unavailable the
    reference replicates a[4] into a[5..8] for modes 3/7 (:794-797,:817-820);
    that replication is applied for all modes here (a[5..8] only feed
    modes 3/7, so this is equivalent)."""
    avail_a = (avail & AVAIL_A) != 0
    avail_b = (avail & AVAIL_B) != 0
    avail_c = (avail & AVAIL_C) != 0
    a = jnp.where(jnp.arange(9) >= 5, jnp.where(avail_c, a, a[4]), a)
    branches = [
        lambda: _i4_vertical(a, l),
        lambda: _i4_horizontal(a, l),
        lambda: _i4_dc(a, l, avail_a, avail_b),
        lambda: _i4_ddl(a, l),
        lambda: _i4_ddr(a, l),
        lambda: _i4_vr(a, l),
        lambda: _i4_hd(a, l),
        lambda: _i4_vl(a, l),
        lambda: _i4_hu(a, l),
    ]
    return lax.switch(mode, branches)


# ---------------------------------------------------------------------------
# 16x16 luma modes. above: (17,) [D, above*16]; left: (16,)
# ---------------------------------------------------------------------------

def predict_16x16(mode, above, left, avail):
    avail_a = (avail & AVAIL_A) != 0
    avail_b = (avail & AVAIL_B) != 0
    a = above[1:]

    def vertical():
        return jnp.broadcast_to(a, (16, 16))

    def horizontal():
        return jnp.broadcast_to(left[:, None], (16, 16))

    def dc():
        both = (jnp.sum(a) + jnp.sum(left) + 16) >> 5
        only_a = (jnp.sum(left) + 8) >> 4
        only_b = (jnp.sum(a) + 8) >> 4
        val = jnp.where(avail_a & avail_b, both,
                        jnp.where(avail_a, only_a,
                                  jnp.where(avail_b, only_b, 128)))
        return jnp.full((16, 16), val)

    def plane():
        # reference Intra16x16PlanePrediction :1107-1152; the i=7 terms of
        # both gradients read the above-left corner pel (above[-1] in the
        # reference's pointer arithmetic)
        av = 16 * (a[15] + left[15])
        apad = jnp.concatenate([a[6 - np.arange(7)], above[0][None]])
        b = jnp.sum((np.arange(8) + 1) * (a[8 + np.arange(8)] - apad))
        b = (5 * b + 32) >> 6
        lpad = jnp.concatenate([left[6 - np.arange(7)], above[0][None]])
        c = jnp.sum((np.arange(8) + 1) * (left[8 + np.arange(8)] - lpad))
        c = (5 * c + 32) >> 6
        x = jnp.arange(16)
        out = av + b * (x[None, :] - 7) + c * (x[:, None] - 7) + 16
        return _clip8(out >> 5)

    return lax.switch(mode, [vertical, horizontal, dc, plane])


# ---------------------------------------------------------------------------
# chroma modes (8x8 per plane). above: (9,) [D, above*8]; left: (8,)
# ---------------------------------------------------------------------------

def predict_chroma(mode, above, left, avail):
    avail_a = (avail & AVAIL_A) != 0
    avail_b = (avail & AVAIL_B) != 0
    a = above[1:]

    def dc():
        # quadrant-wise DC with the reference's exact availability
        # preferences (IntraChromaDcPrediction :1160-1248)
        sa0 = jnp.sum(a[0:4]); sa1 = jnp.sum(a[4:8])
        sl0 = jnp.sum(left[0:4]); sl1 = jnp.sum(left[4:8])
        tl = jnp.where(avail_a & avail_b, (sa0 + sl0 + 4) >> 3,
                       jnp.where(avail_b, (sa0 + 2) >> 2,
                                 jnp.where(avail_a, (sl0 + 2) >> 2, 128)))
        tr = jnp.where(avail_b, (sa1 + 2) >> 2,
                       jnp.where(avail_a, (sl0 + 2) >> 2, 128))
        bl = jnp.where(avail_a, (sl1 + 2) >> 2,
                       jnp.where(avail_b, (sa0 + 2) >> 2, 128))
        br = jnp.where(avail_a & avail_b, (sa1 + sl1 + 4) >> 3,
                       jnp.where(avail_a, (sl1 + 2) >> 2,
                                 jnp.where(avail_b, (sa1 + 2) >> 2, 128)))
        top = jnp.concatenate([jnp.full(4, tl), jnp.full(4, tr)])
        bot = jnp.concatenate([jnp.full(4, bl), jnp.full(4, br)])
        return jnp.broadcast_to(
            jnp.where(jnp.arange(8)[:, None] < 4, top[None, :], bot[None, :]),
            (8, 8))

    def horizontal():
        return jnp.broadcast_to(left[:, None], (8, 8))

    def vertical():
        return jnp.broadcast_to(a, (8, 8))

    def plane():
        # reference IntraChromaPlanePrediction :1327-1380
        av = 16 * (a[7] + left[7])
        b = (a[4] - a[2]) + 2 * (a[5] - a[1]) + 3 * (a[6] - a[0]) + \
            4 * (a[7] - above[0])
        b = (17 * b + 16) >> 5
        c = (left[4] - left[2]) + 2 * (left[5] - left[1]) + \
            3 * (left[6] - left[0]) + 4 * (left[7] - above[0])
        c = (17 * c + 16) >> 5
        x = jnp.arange(8)
        out = av + 16 + b * (x[None, :] - 3) + c * (x[:, None] - 3)
        return _clip8(out >> 5)

    return lax.switch(mode, [dc, horizontal, vertical, plane])


# ---------------------------------------------------------------------------
# Sequential whole-frame intra pass (reference decode order = raster MBs,
# zigzag blocks). Used by the phase-A pipeline and as the semantics oracle
# for the wavefront kernel.
# ---------------------------------------------------------------------------

def intra_mb_luma(y_plane, mb_x, mb_y, is_i4, i4_modes, i4_avail, i16_mode,
                  mb_avail, resid_luma):
    """Reconstruct the luma of one intra MB in-place on the (H, W) uint8
    plane. mb_x/mb_y in pels. resid_luma: (16, 16) int32."""

    def do_i4(plane):
        def block_step(k, plane):
            r = jnp.asarray(ZIG2RAS)[k]
            bx = mb_x + jnp.asarray(BLOCK_X)[r]
            by = mb_y + jnp.asarray(BLOCK_Y)[r]
            width = plane.shape[1]
            # a: [corner, above*4, above-right*4] gathered from row by-1
            # with indices clipped at the picture edges; every out-of-range
            # read is gated off by the availability flags (above-right
            # beyond the right edge implies !availC -> replicated)
            row = lax.dynamic_slice(plane, (jnp.maximum(by - 1, 0), 0),
                                    (1, width))[0]
            a = row[jnp.clip(bx - 1 + jnp.arange(9), 0, width - 1)]
            a = a.astype(jnp.int32)
            # l: [corner, left*4] from column bx-1 (never overflows rows)
            lcol_noc = lax.dynamic_slice(plane, (by, jnp.maximum(bx - 1, 0)),
                                         (4, 1))[:, 0].astype(jnp.int32)
            l = jnp.concatenate([a[0][None], lcol_noc])
            pred = predict_4x4(i4_modes[r], a, l, i4_avail[r])
            res = lax.dynamic_slice(resid_luma, (jnp.asarray(BLOCK_Y)[r],
                                                 jnp.asarray(BLOCK_X)[r]),
                                    (4, 4))
            out = _clip8(pred + res).astype(jnp.uint8)
            return lax.dynamic_update_slice(plane, out, (by, bx))

        return lax.fori_loop(0, 16, block_step, plane)

    def do_i16(plane):
        # only the corner pel comes from the (x-1) column; a wider slice
        # would overflow a one-MB-wide picture
        corner = lax.dynamic_slice(plane, (jnp.maximum(mb_y - 1, 0),
                                           jnp.maximum(mb_x - 1, 0)),
                                   (1, 1))[0].astype(jnp.int32)
        above_noc = lax.dynamic_slice(plane, (jnp.maximum(mb_y - 1, 0), mb_x),
                                      (1, 16))[0].astype(jnp.int32)
        above = jnp.concatenate([corner, above_noc])
        left = lax.dynamic_slice(plane, (mb_y, jnp.maximum(mb_x - 1, 0)),
                                 (16, 1))[:, 0].astype(jnp.int32)
        pred = predict_16x16(i16_mode, above, left, mb_avail)
        out = _clip8(pred + resid_luma).astype(jnp.uint8)
        return lax.dynamic_update_slice(plane, out, (mb_y, mb_x))

    return lax.cond(is_i4, do_i4, do_i16, y_plane)


def intra_mb_chroma(plane, cb_x, cb_y, mode, mb_avail, resid):
    """One chroma plane of one intra MB. cb_x/cb_y in chroma pels;
    resid: (8, 8) int32."""
    corner = lax.dynamic_slice(plane, (jnp.maximum(cb_y - 1, 0),
                                       jnp.maximum(cb_x - 1, 0)),
                               (1, 1))[0].astype(jnp.int32)
    above_noc = lax.dynamic_slice(plane, (jnp.maximum(cb_y - 1, 0), cb_x),
                                  (1, 8))[0].astype(jnp.int32)
    above = jnp.concatenate([corner, above_noc])
    left = lax.dynamic_slice(plane, (cb_y, jnp.maximum(cb_x - 1, 0)),
                             (8, 1))[:, 0].astype(jnp.int32)
    pred = predict_chroma(mode, above, left, mb_avail)
    out = _clip8(pred + resid).astype(jnp.uint8)
    return lax.dynamic_update_slice(plane, out, (cb_y, cb_x))


def intra_pass(y_plane, cb_plane, cr_plane, mb_class, i4_modes, i4_avail,
               mb_avail, i16_mode, chroma_mode, resid_luma, resid_chroma,
               width_mbs):
    """Sequential raster pass over all MBs; intra MBs (class 3/4) are
    reconstructed, everything else is untouched. Returns updated planes."""
    n_mbs = mb_class.shape[0]

    def body(i, planes):
        y, cb, cr = planes
        mb_x = (i % width_mbs) * 16
        mb_y = (i // width_mbs) * 16

        def process(planes):
            y, cb, cr = planes
            y = intra_mb_luma(y, mb_x, mb_y, mb_class[i] == 3, i4_modes[i],
                              i4_avail[i], i16_mode[i], mb_avail[i],
                              resid_luma[i])
            cb = intra_mb_chroma(cb, mb_x // 2, mb_y // 2, chroma_mode[i],
                                 mb_avail[i], resid_chroma[i, 0])
            cr = intra_mb_chroma(cr, mb_x // 2, mb_y // 2, chroma_mode[i],
                                 mb_avail[i], resid_chroma[i, 1])
            return (y, cb, cr)

        is_intra = (mb_class[i] == 3) | (mb_class[i] == 4)
        return lax.cond(is_intra, process, lambda p: p, (y, cb, cr))

    return lax.fori_loop(0, n_mbs, body, (y_plane, cb_plane, cr_plane))


def intra_pass_list(y_plane, cb_plane, cr_plane, intra_mbs, mb_class,
                    i4_modes, i4_avail, mb_avail, i16_mode, chroma_mode,
                    resid_luma, resid_chroma, width_mbs):
    """Sequential pass over an explicit raster-ordered intra-MB index list
    (padded with -1). P frames typically carry a handful of intra MBs, so
    iterating the list instead of the whole MB grid removes the sequential
    bottleneck from the common path; for K == 0 this is a no-op."""
    k = intra_mbs.shape[0]
    n_mbs = mb_class.shape[0]
    if k == 0:
        return y_plane, cb_plane, cr_plane

    def body(j, planes):
        y, cb, cr = planes
        i = intra_mbs[j]
        mb_x = (i % width_mbs) * 16
        mb_y = (i // width_mbs) * 16

        def process(planes):
            y, cb, cr = planes
            y = intra_mb_luma(y, mb_x, mb_y, mb_class[i] == 3, i4_modes[i],
                              i4_avail[i], i16_mode[i], mb_avail[i],
                              resid_luma[i])
            cb = intra_mb_chroma(cb, mb_x // 2, mb_y // 2, chroma_mode[i],
                                 mb_avail[i], resid_chroma[i, 0])
            cr = intra_mb_chroma(cr, mb_x // 2, mb_y // 2, chroma_mode[i],
                                 mb_avail[i], resid_chroma[i, 1])
            return (y, cb, cr)

        return lax.cond((i >= 0) & (i < n_mbs), process, lambda p: p,
                        (y, cb, cr))

    return lax.fori_loop(0, k, body, (y_plane, cb_plane, cr_plane))


# ---------------------------------------------------------------------------
# Region-based kernels + wavefront pass.
#
# Intra dependencies (A left, B above, C above-right, D above-left) are all
# earlier on anti-diagonals t = 2r + c, the same wavefront as deblocking.
# A luma region is (17, 21): one neighbour row above (incl. the above-right
# pels the x=12,y=0 block needs), one neighbour column left, the MB itself;
# only the inner 16x16 is written back. Regions of one diagonal are
# pairwise disjoint in their write areas.
# ---------------------------------------------------------------------------

def intra_region_luma(region, is_i4, i4_modes, i4_avail, i16_mode, mb_avail,
                      resid_luma):
    """region: (17, 21) int32; returns the reconstructed (16, 16) int32."""

    def do_i4(region):
        def block_step(k, region):
            r = jnp.asarray(ZIG2RAS)[k]
            x0 = jnp.asarray(BLOCK_X)[r]
            y0 = jnp.asarray(BLOCK_Y)[r]
            a = lax.dynamic_slice(region, (y0, x0), (1, 9))[0]
            lcol = lax.dynamic_slice(region, (y0 + 1, x0), (4, 1))[:, 0]
            l = jnp.concatenate([a[0][None], lcol])
            pred = predict_4x4(i4_modes[r], a, l, i4_avail[r])
            res = lax.dynamic_slice(resid_luma, (y0, x0), (4, 4))
            out = _clip8(pred + res)
            return lax.dynamic_update_slice(region, out, (y0 + 1, x0 + 1))

        return lax.fori_loop(0, 16, block_step, region)

    def do_i16(region):
        above = region[0, 0:17]
        left = region[1:17, 0]
        pred = predict_16x16(i16_mode, above, left, mb_avail)
        out = _clip8(pred + resid_luma)
        return lax.dynamic_update_slice(region, out, (1, 1))

    region = lax.cond(is_i4, do_i4, do_i16, region)
    return region[1:17, 1:17]


def intra_region_chroma(region, mode, mb_avail, resid):
    """region: (9, 9) int32; returns reconstructed (8, 8) int32."""
    above = region[0, 0:9]
    left = region[1:9, 0]
    pred = predict_chroma(mode, above, left, mb_avail)
    return _clip8(pred + resid)


def intra_pass_wavefront(y_plane, cb_plane, cr_plane, mb_class, i4_modes,
                         i4_avail, mb_avail, i16_mode, chroma_mode,
                         resid_luma, resid_chroma, width_mbs, height_mbs):
    """Anti-diagonal-parallel intra pass (used for intra-heavy frames)."""
    w, h = width_mbs, height_mbs
    yp = y_plane.astype(jnp.int32)
    cbp = cb_plane.astype(jnp.int32)
    crp = cr_plane.astype(jnp.int32)

    is_intra = (mb_class == 3) | (mb_class == 4)
    max_diag = min(h, w // 2 + 1)
    n_steps = 2 * (h - 1) + w
    lane = jnp.arange(max_diag)
    far = jnp.int32(1 << 28)

    def step(t, planes):
        yp, cbp, crp = planes
        r_lo = jnp.maximum(0, (t - w + 2) // 2)
        rs = r_lo + lane
        cs = t - 2 * rs
        valid = (rs < h) & (cs >= 0) & (cs < w)
        mbi = jnp.where(valid, rs * w + cs, 0)
        act = valid & is_intra[mbi]

        # luma: gather (17, 21) regions with edge-clamped indices (the
        # off-picture reads feed only unavailable-neighbour paths)
        H, W = yp.shape
        gr = jnp.clip(rs[:, None, None] * 16 - 1 +
                      jnp.arange(17)[None, :, None], 0, H - 1)
        gc = jnp.clip(cs[:, None, None] * 16 - 1 +
                      jnp.arange(21)[None, None, :], 0, W - 1)
        regions = yp[gr, gc]
        out = jax.vmap(intra_region_luma)(
            regions, mb_class[mbi] == 3, i4_modes[mbi], i4_avail[mbi],
            i16_mode[mbi], mb_avail[mbi], resid_luma[mbi])
        wr = jnp.where(act, rs * 16, far)[:, None, None] + \
            jnp.arange(16)[None, :, None]
        wc = jnp.where(act, cs * 16, far)[:, None, None] + \
            jnp.arange(16)[None, None, :]
        yp = yp.at[wr, wc].set(out, mode="drop", unique_indices=True)

        # chroma: (9, 9) regions
        Hc, Wc = cbp.shape
        grc = jnp.clip(rs[:, None, None] * 8 - 1 +
                       jnp.arange(9)[None, :, None], 0, Hc - 1)
        gcc = jnp.clip(cs[:, None, None] * 8 - 1 +
                       jnp.arange(9)[None, None, :], 0, Wc - 1)
        wrc = jnp.where(act, rs * 8, far)[:, None, None] + \
            jnp.arange(8)[None, :, None]
        wcc = jnp.where(act, cs * 8, far)[:, None, None] + \
            jnp.arange(8)[None, None, :]
        outb = jax.vmap(intra_region_chroma)(
            cbp[grc, gcc], chroma_mode[mbi], mb_avail[mbi],
            resid_chroma[mbi, 0])
        cbp = cbp.at[wrc, wcc].set(outb, mode="drop", unique_indices=True)
        outr = jax.vmap(intra_region_chroma)(
            crp[grc, gcc], chroma_mode[mbi], mb_avail[mbi],
            resid_chroma[mbi, 1])
        crp = crp.at[wrc, wcc].set(outr, mode="drop", unique_indices=True)
        return (yp, cbp, crp)

    yp, cbp, crp = lax.fori_loop(0, n_steps, step, (yp, cbp, crp))
    return (yp.astype(jnp.uint8), cbp.astype(jnp.uint8),
            crp.astype(jnp.uint8))
