"""Pallas TPU intra-prediction pass.

The XLA wavefront intra pass costs ~2.3 s on a 1080p I frame (hundreds of
sequential XLA loop steps over gathered regions). Here the planes live in
VMEM scratch and one sequential program reconstructs intra MBs in raster
order — the reference decode order (h264bsdIntraPrediction
intra_prediction.c:478-533; 4x4 blocks in zigzag order, each predicting
from already-reconstructed pels) — with the same aligned superset
read-modify-write scheme as ops.pallas_deblock. The 16 intra-4x4 block
steps are unrolled (static offsets) with a lax.switch over the nine
prediction modes; mode math ports ops.intra's predict_* functions
(themselves parity-pinned against the reference).

Residuals arrive in a transposed (rows, nMB*cols) int16 layout so each
MB's block is one aligned lane load. Parity vs ops.intra.intra_pass is
pinned by tests/test_pallas_intra.py in interpreter mode and by the
on-TPU bench verification pass.

Per-MB meta row (40 x i32):
  [0] is_intra  [1] is_i4  [2] i16_mode  [3] chroma_mode  [4] mb_avail
  [5:21] i4_modes (raster)  [21:37] i4_avail
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

from .intra import BLOCK_X, BLOCK_Y, ZIG2RAS


def _rsh(x, k):
    if k == 0:
        return x
    return jnp.concatenate([x[:, -k:], x[:, :-k]], axis=1)


def _lane_range(rows, cols, lo, hi):
    i = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (i >= lo) & (i < hi)

DG = 32
PT = 8         # top padding rows
PL = 128       # left padding lanes


def _round128(x):
    return -(-x // 128) * 128


def _clip8(x):
    return jnp.clip(x, 0, 255)


def _f(v):
    return jnp.full((4, 4), v, jnp.int32)


def _row4(v0, v1, v2, v3):
    return jnp.concatenate(
        [jnp.full((1, 1), v, jnp.int32) for v in (v0, v1, v2, v3)], axis=1)


def _mat4(rows):
    return jnp.concatenate(rows, axis=0)


def _i4_modes_mat(a, l, avail):
    """All nine 4x4 predictions from scalars a[0..8] (corner+above+above
    right) and l[0..4] (corner+left); ports ops.intra._i4_* exactly."""
    avail_a = (avail & 1) != 0
    avail_b = (avail & 2) != 0
    h2 = lambda x, y: (x + y + 1) >> 1
    m3 = lambda x, y, z: (x + 2 * y + z + 2) >> 2

    vert = _mat4([_row4(a[1], a[2], a[3], a[4])] * 4)
    hor = _mat4([_row4(l[i], l[i], l[i], l[i]) for i in range(1, 5)])

    sa = a[1] + a[2] + a[3] + a[4]
    sl = l[1] + l[2] + l[3] + l[4]
    dc_val = jnp.where(avail_a & avail_b, (sa + sl + 4) >> 3,
                       jnp.where(avail_a, (sl + 2) >> 2,
                                 jnp.where(avail_b, (sa + 2) >> 2, 128)))
    dc = _f(dc_val)

    # diagonal down-left: f[k] = (p[k] + 2p[k+1] + p[k+2] + 2) >> 2
    p = [a[i] for i in range(1, 9)]
    fdl = [m3(p[k], p[k + 1], p[k + 2]) for k in range(6)] + \
        [(p[6] + 3 * p[7] + 2) >> 2]
    ddl = _mat4([_row4(fdl[y], fdl[y + 1], fdl[y + 2], fdl[y + 3])
                 for y in range(4)])

    d0 = m3(a[1], a[0], l[1])
    d1 = m3(a[0], a[1], a[2])
    d2 = m3(a[1], a[2], a[3])
    d3 = m3(a[2], a[3], a[4])
    dm1 = m3(l[0], l[1], l[2])
    dm2 = m3(l[1], l[2], l[3])
    dm3 = m3(l[2], l[3], l[4])
    diag = [dm3, dm2, dm1, d0, d1, d2, d3]
    ddr = _mat4([_row4(diag[3 - y], diag[4 - y], diag[5 - y], diag[6 - y])
                 for y in range(4)])

    e0 = h2(a[0], a[1]); e1 = h2(a[1], a[2])
    e2 = h2(a[2], a[3]); e3 = h2(a[3], a[4])
    o0 = m3(a[1], a[0], l[1]); o1 = m3(a[0], a[1], a[2])
    o2 = m3(a[1], a[2], a[3]); o3 = m3(a[2], a[3], a[4])
    r8 = m3(l[2], l[1], l[0]); r12 = m3(l[3], l[2], l[1])
    vr = _mat4([_row4(e0, e1, e2, e3), _row4(o0, o1, o2, o3),
                _row4(r8, e0, e1, e2), _row4(r12, o0, o1, o2)])

    he0 = h2(l[0], l[1]); he1 = h2(l[1], l[2])
    he2 = h2(l[2], l[3]); he3 = h2(l[3], l[4])
    ho0 = m3(a[1], a[0], l[1]); ho1 = m3(l[0], l[1], l[2])
    ho2 = m3(l[1], l[2], l[3]); ho3 = m3(l[2], l[3], l[4])
    t2 = m3(a[2], a[1], a[0]); t3 = m3(a[3], a[2], a[1])
    hd = _mat4([_row4(he0, ho0, t2, t3), _row4(he1, ho1, he0, ho0),
                _row4(he2, ho2, he1, ho1), _row4(he3, ho3, he2, ho2)])

    pv = [a[i] for i in range(1, 8)]
    vh = [h2(pv[k], pv[k + 1]) for k in range(5)]
    vm = [m3(pv[k], pv[k + 1], pv[k + 2]) for k in range(5)]
    vl = _mat4([_row4(vh[0], vh[1], vh[2], vh[3]),
                _row4(vm[0], vm[1], vm[2], vm[3]),
                _row4(vh[1], vh[2], vh[3], vh[4]),
                _row4(vm[1], vm[2], vm[3], vm[4])])

    pl_ = [l[i] for i in range(1, 5)]
    v0 = h2(pl_[0], pl_[1]); v1 = m3(pl_[0], pl_[1], pl_[2])
    v2 = h2(pl_[1], pl_[2]); v3 = m3(pl_[1], pl_[2], pl_[3])
    v4 = h2(pl_[2], pl_[3]); v5 = (pl_[2] + 3 * pl_[3] + 2) >> 2
    v6 = pl_[3]
    hu = _mat4([_row4(v0, v1, v2, v3), _row4(v2, v3, v4, v5),
                _row4(v4, v5, v6, v6), _row4(v6, v6, v6, v6)])

    return [vert, hor, dc, ddl, ddr, vr, hd, vl, hu]


def _predict_16(mode, above, left, avail):
    """above: (1, 17) [corner, 16]; left: (16, 1). Ports predict_16x16."""
    avail_a = (avail & 1) != 0
    avail_b = (avail & 2) != 0
    a = above[:, 1:17]

    def vertical():
        return jnp.broadcast_to(a, (16, 16))

    def horizontal():
        return jnp.broadcast_to(left, (16, 16))

    def dc():
        sa = jnp.sum(a)
        sl = jnp.sum(left)
        val = jnp.where(avail_a & avail_b, (sa + sl + 16) >> 5,
                        jnp.where(avail_a, (sl + 8) >> 4,
                                  jnp.where(avail_b, (sa + 8) >> 4, 128)))
        return jnp.full((16, 16), val, jnp.int32)

    def plane():
        ax = [above[0, i] for i in range(17)]          # corner + 16
        lx = [left[i, 0] for i in range(16)]
        av = 16 * (ax[16] + lx[15])
        b = sum((i + 1) * (ax[9 + i] - (ax[7 - i] if i < 7 else ax[0]))
                for i in range(8))
        b = (5 * b + 32) >> 6
        c = sum((i + 1) * (lx[8 + i] - (lx[6 - i] if i < 7 else ax[0]))
                for i in range(8))
        c = (5 * c + 32) >> 6
        x = lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        yy = lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        return _clip8((av + b * (x - 7) + c * (yy - 7) + 16) >> 5)

    return lax.switch(mode, [vertical, horizontal, dc, plane])


def _predict_chroma(mode, above, left, avail):
    """above: (1, 9) [corner, 8]; left: (8, 1). Ports predict_chroma."""
    avail_a = (avail & 1) != 0
    avail_b = (avail & 2) != 0
    a = above[:, 1:9]

    def dc():
        sa0 = jnp.sum(a[:, 0:4]); sa1 = jnp.sum(a[:, 4:8])
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
        x = lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        yy = lax.broadcasted_iota(jnp.int32, (8, 8), 0)
        return jnp.where(yy < 4, jnp.where(x < 4, tl, tr),
                         jnp.where(x < 4, bl, br))

    def horizontal():
        return jnp.broadcast_to(left, (8, 8))

    def vertical():
        return jnp.broadcast_to(a, (8, 8))

    def plane():
        ax = [above[0, i] for i in range(9)]
        lx = [left[i, 0] for i in range(8)]
        av = 16 * (ax[8] + lx[7])
        b = (ax[5] - ax[3]) + 2 * (ax[6] - ax[2]) + \
            3 * (ax[7] - ax[1]) + 4 * (ax[8] - ax[0])
        b = (17 * b + 16) >> 5
        c = (lx[4] - lx[2]) + 2 * (lx[5] - lx[1]) + \
            3 * (lx[6] - lx[0]) + 4 * (lx[7] - ax[0])
        c = (17 * c + 16) >> 5
        x = lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        yy = lax.broadcasted_iota(jnp.int32, (8, 8), 0)
        return _clip8((av + 16 + b * (x - 3) + c * (yy - 3)) >> 5)

    return lax.switch(mode, [dc, horizontal, vertical, plane])


def _intra_kernel(meta_ref, y_in, cb_in, cr_in, rl_ref, rc_ref,
                  y_out, cb_out, cr_out, sy, scb, scr, sems, *, H, W):
    Hc, Wc = H // 2, W // 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        dma = pltpu.make_async_copy(
            y_in, sy.at[pl.ds(PT, H), pl.ds(PL, W)], sems.at[0])
        dma.start()
        scb[pl.ds(PT, Hc), pl.ds(PL, Wc)] = cb_in[:]
        scr[pl.ds(PT, Hc), pl.ds(PL, Wc)] = cr_in[:]
        dma.wait()
        # edge-replicate into the padding: neighbour reads at picture
        # borders clamp to the frame edge (matching ops.intra's clipped
        # gathers; the values only feed unavailable-neighbour paths of
        # conformant streams)
        for ref, h_, w_ in ((sy, H, W), (scb, Hc, Wc), (scr, Hc, Wc)):
            ref[pl.ds(PT - 1, 1), pl.ds(PL, w_)] = \
                ref[pl.ds(PT, 1), pl.ds(PL, w_)]
            lcol = ref[pl.ds(PT - 1, h_ + 1), pl.ds(PL, 1)]
            ref[pl.ds(PT - 1, h_ + 1), pl.ds(PL - 1, 1)] = lcol
            rcol = ref[pl.ds(PT - 1, h_ + 1), pl.ds(PL + w_ - 1, 1)]
            ref[pl.ds(PT - 1, h_ + 1), pl.ds(PL + w_, 8)] = \
                jnp.broadcast_to(rcol, (h_ + 1, 8))

    def mb_body(k, _):
        i = meta_ref[k, 37]
        r = meta_ref[k, 38]
        c = meta_ref[k, 39]

        @pl.when(meta_ref[k, 0] != 0)
        def _():
            mb_avail = meta_ref[k, 4]

            # residuals: aligned lane superset from the transposed layouts
            rx = i * 16
            rxa = pl.multiple_of((rx // 128) * 128, 128)
            # lane rolls run on the u32-packed view of the narrow data
            # (lane_roll_narrow); the i32 cast happens on the sliced window
            res = lane_roll_narrow(rl_ref[:, pl.ds(rxa, 256)],
                                   -(rx - rxa))[:, 0:16] \
                .astype(jnp.int32)                              # (16, 16)
            crx = i * 8
            crxa = pl.multiple_of((crx // 128) * 128, 128)
            cres = lane_roll_narrow(rc_ref[:, pl.ds(crxa, 256)],
                                    -(crx - crxa))[:, 0:8] \
                .astype(jnp.int32)                              # (16, 8)

            # ---- luma region RMW: rows [16r-8, 16r+15], region at
            # (7 + t, j): region row 0 = frame row 16r-1, col 0 = 16c-1
            ly = pl.multiple_of(r * 16, 8)
            lx = c * 16 + PL - 1
            lxa = pl.multiple_of((lx // 128) * 128, 128)
            d = lx - lxa
            sup = sy[pl.ds(ly, 24), pl.ds(lxa, 256)]
            sup = lane_roll_narrow(sup, -d)
            regs = sup[:, 0:32].astype(jnp.int32)

            def do_i4(regs):
                for z in range(16):
                    rr = int(ZIG2RAS[z])
                    x0 = int(BLOCK_X[rr])
                    y0 = int(BLOCK_Y[rr])
                    arow = regs[7 + y0, :]                      # (32,)
                    a = [arow[x0 + j] for j in range(9)]
                    avail = meta_ref[k, 21 + rr]
                    avail_c = (avail & 4) != 0
                    for j in range(5, 9):
                        a[j] = jnp.where(avail_c, a[j], a[4])
                    l = [a[0]] + [regs[8 + y0 + j, x0] for j in range(4)]
                    cases = _i4_modes_mat(a, l, avail)
                    mode = meta_ref[k, 5 + rr]
                    pred = cases[0]
                    for mi in range(1, 9):
                        pred = jnp.where(mode == mi, cases[mi], pred)
                    out = _clip8(pred + res[y0:y0 + 4, x0:x0 + 4])
                    out32 = _rsh(jnp.concatenate(
                        [out, jnp.zeros((4, 28), jnp.int32)], axis=1),
                        1 + x0)
                    mid = jnp.where(_lane_range(4, 32, 1 + x0, 5 + x0),
                                    out32, regs[8 + y0:12 + y0])
                    rows = [regs[0:8 + y0], mid]
                    if y0 < 12:
                        rows.append(regs[12 + y0:24])
                    regs = jnp.concatenate(rows, axis=0)
                return regs

            def do_i16(regs):
                above = regs[7:8, 0:17]
                left = regs[8:24, 0:1]
                pred = _predict_16(meta_ref[k, 2], above, left, mb_avail)
                out = _clip8(pred + res)
                out32 = _rsh(jnp.concatenate(
                    [out, jnp.zeros((16, 16), jnp.int32)], axis=1), 1)
                mid = jnp.where(_lane_range(16, 32, 1, 17), out32,
                                regs[8:24])
                return jnp.concatenate([regs[0:8], mid], axis=0)

            regs = lax.cond(meta_ref[k, 1] != 0, do_i4, do_i16, regs)
            sup = jnp.concatenate([regs.astype(jnp.uint8), sup[:, 32:]],
                                  axis=1)
            sup = lane_roll_narrow(sup, d)
            sy[pl.ds(ly, 24), pl.ds(lxa, 256)] = sup

            # ---- chroma ----
            cy = pl.multiple_of(r * 8, 8)
            cx = c * 8 + PL - 1
            cxa = pl.multiple_of((cx // 128) * 128, 128)
            dc_ = cx - cxa

            def chroma(plane_ref, resid):
                supc = plane_ref[pl.ds(cy, 16), pl.ds(cxa, 256)]
                supc = lane_roll_narrow(supc, -dc_)
                cregs = supc[:, 0:16].astype(jnp.int32)
                above = cregs[7:8, 0:9]
                left = cregs[8:16, 0:1]
                pred = _predict_chroma(meta_ref[k, 3], above, left,
                                       mb_avail)
                out = _clip8(pred + resid)
                out16 = _rsh(jnp.concatenate(
                    [out, jnp.zeros((8, 8), jnp.int32)], axis=1), 1)
                mid = jnp.where(_lane_range(8, 16, 1, 9), out16,
                                cregs[8:16])
                cregs = jnp.concatenate([cregs[0:8], mid], axis=0)
                supc = jnp.concatenate([cregs.astype(jnp.uint8),
                                        supc[:, 16:]], axis=1)
                supc = lane_roll_narrow(supc, dc_)
                plane_ref[pl.ds(cy, 16), pl.ds(cxa, 256)] = supc

            chroma(scb, cres[0:8])
            chroma(scr, cres[8:16])

        return 0

    lax.fori_loop(0, DG, mb_body, 0)

    @pl.when(step == n_steps - 1)
    def _():
        dma = pltpu.make_async_copy(
            sy.at[pl.ds(PT, H), pl.ds(PL, W)], y_out, sems.at[0])
        dma.start()
        cb_out[:] = scb[pl.ds(PT, Hc), pl.ds(PL, Wc)]
        cr_out[:] = scr[pl.ds(PT, Hc), pl.ds(PL, Wc)]
        dma.wait()


def intra_pass_pallas(y_plane, cb_plane, cr_plane, mb_class, i4_modes,
                      i4_avail, mb_avail, i16_mode, chroma_mode,
                      resid_luma, resid_chroma, width_mbs, height_mbs,
                      interpret=False, intra_ids=None):
    """Drop-in replacement for ops.intra.intra_pass / intra_pass_wavefront
    on TPU (same argument convention as intra_pass plus height_mbs).

    With intra_ids (the front-end's sparse intra-MB list in decode
    order, padded with ids >= nMB) the kernel's sequential walk covers
    only those entries instead of the whole MB grid — on P frames the
    list is a few dozen MBs, cutting the pass to a handful of grid
    steps. Decode order respects every intra dependency (neighbours
    precede an MB in decode order whenever they are marked available).
    """
    n_mb = mb_class.shape[0]
    H, W = height_mbs * 16, width_mbs * 16
    Hc, Wc = H // 2, W // 2

    is_intra = ((mb_class == 3) | (mb_class == 4)).astype(jnp.int32)
    meta = jnp.concatenate([
        is_intra[:, None], (mb_class == 3).astype(jnp.int32)[:, None],
        i16_mode.astype(jnp.int32)[:, None],
        chroma_mode.astype(jnp.int32)[:, None],
        mb_avail.astype(jnp.int32)[:, None],
        i4_modes.astype(jnp.int32), i4_avail.astype(jnp.int32)], axis=1)
    if intra_ids is None:
        ids = jnp.arange(n_mb, dtype=jnp.int32)
        rows = meta
    else:
        ids = jnp.minimum(intra_ids.astype(jnp.int32), n_mb)
        rows = jnp.concatenate([meta, jnp.zeros((1, 37), jnp.int32)])[ids]
        rows = jnp.where((ids < n_mb)[:, None], rows, 0)
        ids = jnp.minimum(ids, n_mb - 1)
    meta = jnp.concatenate(
        [rows, ids[:, None], (ids // width_mbs)[:, None],
         (ids % width_mbs)[:, None]], axis=1)
    n_entries = meta.shape[0]
    n_steps = max(1, -(-n_entries // DG))
    meta = jnp.pad(meta, ((0, n_steps * DG - n_entries), (0, 0)))

    # transposed residual layouts: luma (16, nMB*16), chroma (16, nMB*8)
    # (cb rows 0-7, cr rows 8-15), padded so lane supersets stay in
    # bounds. Both accept the rowtile layouts (luma (nG, 16, 128),
    # chroma a (cb, cr) pair of (nG, 8, 64) half-chunk stacks): the
    # transpose+reshape lands in the SAME final layout, but over the
    # 128/64-lane minor dims it is a cheap major-dim move instead of a
    # minor-dim shuffle.
    rl = resid_luma.astype(jnp.int16).transpose(1, 0, 2).reshape(16, -1)
    if isinstance(resid_chroma, tuple):
        rc = jnp.concatenate(
            [t.astype(jnp.int16).transpose(1, 0, 2).reshape(8, -1)
             for t in resid_chroma], axis=0)
    else:
        rc = jnp.concatenate([resid_chroma[:, 0], resid_chroma[:, 1]],
                             axis=1) \
            .astype(jnp.int16).transpose(1, 0, 2).reshape(16, -1)
    rl = jnp.pad(rl, ((0, 0), (0, _round128(rl.shape[1]) + 256
                               - rl.shape[1])))
    rc = jnp.pad(rc, ((0, 0), (0, _round128(rc.shape[1]) + 256
                               - rc.shape[1])))

    hp = PT + H + 16
    hp += (-hp) % 8
    wp = _round128(PL + W) + 256
    hpc = PT + Hc + 8
    hpc += (-hpc) % 8
    wpc = _round128(PL + Wc) + 256

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((DG, 40), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H, W), lambda i: (0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
            pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
            pl.BlockSpec(rl.shape, lambda i: (0, 0)),
            pl.BlockSpec(rc.shape, lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((H, W), lambda i: (0, 0),
                                memory_space=pl.ANY),
                   pl.BlockSpec((Hc, Wc), lambda i: (0, 0)),
                   pl.BlockSpec((Hc, Wc), lambda i: (0, 0))],
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.uint8),
                        pltpu.VMEM((hpc, wpc), jnp.uint8),
                        pltpu.VMEM((hpc, wpc), jnp.uint8),
                        pltpu.SemaphoreType.DMA((1,))],
    )
    out_y, out_cb, out_cr = pl.pallas_call(
        partial(_intra_kernel, H=H, W=W),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint8),
                   jax.ShapeDtypeStruct((Hc, Wc), jnp.uint8),
                   jax.ShapeDtypeStruct((Hc, Wc), jnp.uint8)],
        interpret=interpret,
    )(meta, y_plane, cb_plane, cr_plane, rl, rc)
    return out_y, out_cb, out_cr
