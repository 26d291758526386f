"""In-loop deblocking filter over the whole picture.

Behavioral parity: reference h264bsd_deblocking.c — per-MB filtering flags
(GetMbFilteringFlags :280 with slice-boundary handling), boundary strengths
(GetBoundaryStrengths :1187-1379; the mb-type specializations reduce to one
uniform rule because blocks of one partition share mv/ref), alpha/beta/tc0
thresholds from (possibly averaged) QP (:1390-1512), and the weak/strong
edge kernels (FilterVerLumaEdge :656, FilterHorLuma(/Edge) :765/:840,
FilterVerChromaEdge :961, FilterHorChroma(/Edge) :1036/:1083).

TPU-native split:
  * bS values, filter flags and thresholds depend only on the per-MB
    tensors -> computed for every edge of the frame in one parallel pass.
  * pixel filtering is order-dependent (the standard filters MBs in raster
    order, vertical edges left->right then horizontal top->bottom, and
    later edges read pels written by earlier ones) -> sequential per-MB
    pass here (lax.fori_loop), the same per-edge vector kernels being
    reusable by the wavefront Pallas schedule.

Planes are carried with a 4-pixel top/left pad so every edge's read/write
window stays in bounds; the pad is never filtered (edge flags are off at
picture borders).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .transform import QP_C

# threshold tables, spec Table 8-16 (reference deblocking.c:78-121)
ALPHAS = np.array([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,4,4,5,6,7,8,9,10,12,13,
                   15,17,20,22,25,28,32,36,40,45,50,56,63,71,80,90,101,113,
                   127,144,162,182,203,226,255,255], np.int32)
BETAS = np.array([0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,0,2,2,2,3,3,3,3,4,4,4,6,6,
                  7,7,8,8,9,9,10,10,11,11,12,12,13,13,14,14,15,15,16,16,17,
                  17,18,18], np.int32)
TC0 = np.array([
    [0,0,0]]*17 + [[0,0,1],[0,0,1],[0,0,1],[0,0,1],[0,1,1],[0,1,1],[1,1,1],
    [1,1,1],[1,1,1],[1,1,1],[1,1,2],[1,1,2],[1,1,2],[1,1,2],[1,2,3],[1,2,3],
    [2,2,3],[2,2,4],[2,3,4],[2,3,4],[3,3,5],[3,4,6],[3,4,6],[4,5,7],[4,5,8],
    [4,6,9],[5,7,10],[6,8,11],[6,8,13],[7,10,14],[8,11,16],[9,12,18],
    [10,13,20],[11,15,23],[13,17,25]], np.int32)


def _is_intra_class(mb_class):
    # intra for deblocking: I4x4, I16x16, I_PCM, concealed
    return (mb_class >= 3) & (mb_class <= 6)


def boundary_strengths(mb_class, nnz, mv, ref_slot, slice_id, disable_dblk,
                       width_mbs, height_mbs):
    """Per-4x4-block boundary strengths for the whole frame.

    Returns bs_left, bs_top: (nMB, 16) int32 in raster block order
    (bS[k].left / bS[k].top of the reference, deblocking.c:1187-1379),
    already zeroed where the MB's filtering flags disable the edge.
    """
    n_mb = mb_class.shape[0]
    grid = lambda x: x.reshape((height_mbs, width_mbs) + x.shape[1:])
    cls = grid(mb_class)
    nnz_l = grid(nnz[:, :16].astype(jnp.bool_))      # (h, w, 16) has-coeffs
    mvg = grid(mv)                                    # (h, w, 16, 2)
    ref = grid(ref_slot)                              # (h, w, 16)
    sid = grid(slice_id)
    dis = grid(disable_dblk)

    intra = _is_intra_class(cls)

    def pair_bs(n1, m1, r1, n2, m2, r2):
        # uniform InnerBoundaryStrength/EdgeBoundaryStrength rule
        # (deblocking.c:324-419): coeffs -> 2; mv/ref mismatch -> 1; else 0
        coeffs = n1 | n2
        mv_diff = (jnp.abs(m1[..., 0] - m2[..., 0]) >= 4) | \
                  (jnp.abs(m1[..., 1] - m2[..., 1]) >= 4) | (r1 != r2)
        return jnp.where(coeffs, 2, jnp.where(mv_diff, 1, 0))

    # ---- inner edges (within MB) ----
    blocks = np.arange(16)
    left_nb = blocks - 1          # valid when col>0
    top_nb = blocks - 4           # valid when row>0
    inner_left = pair_bs(nnz_l, mvg, ref,
                         nnz_l[..., left_nb], mvg[..., left_nb, :],
                         ref[..., left_nb])
    inner_top = pair_bs(nnz_l, mvg, ref,
                        nnz_l[..., top_nb], mvg[..., top_nb, :],
                        ref[..., top_nb])
    inner_left = jnp.where(intra[..., None], 3, inner_left)
    inner_top = jnp.where(intra[..., None], 3, inner_top)

    # ---- MB-edge values ----
    # left edge: cur blocks {0,4,8,12} vs A blocks {3,7,11,15}
    cur_l = np.array([0, 4, 8, 12])
    nb_l = np.array([3, 7, 11, 15])
    a_cls = jnp.pad(cls, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    a_nnz = jnp.pad(nnz_l, ((0, 0), (1, 0), (0, 0)), mode="edge")[:, :-1]
    a_mv = jnp.pad(mvg, ((0, 0), (1, 0), (0, 0), (0, 0)), mode="edge")[:, :-1]
    a_ref = jnp.pad(ref, ((0, 0), (1, 0), (0, 0)), mode="edge")[:, :-1]
    a_sid = jnp.pad(sid, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    edge_left = pair_bs(nnz_l[..., cur_l], mvg[..., cur_l, :],
                        ref[..., cur_l], a_nnz[..., nb_l],
                        a_mv[..., nb_l, :], a_ref[..., nb_l])
    edge_left = jnp.where((intra | _is_intra_class(a_cls))[..., None], 4,
                          edge_left)

    # top edge: cur blocks {0,1,2,3} vs B blocks {12,13,14,15}
    cur_t = np.array([0, 1, 2, 3])
    nb_t = np.array([12, 13, 14, 15])
    b_cls = jnp.pad(cls, ((1, 0), (0, 0)), mode="edge")[:-1]
    b_nnz = jnp.pad(nnz_l, ((1, 0), (0, 0), (0, 0)), mode="edge")[:-1]
    b_mv = jnp.pad(mvg, ((1, 0), (0, 0), (0, 0), (0, 0)), mode="edge")[:-1]
    b_ref = jnp.pad(ref, ((1, 0), (0, 0), (0, 0)), mode="edge")[:-1]
    b_sid = jnp.pad(sid, ((1, 0), (0, 0)), mode="edge")[:-1]
    edge_top = pair_bs(nnz_l[..., cur_t], mvg[..., cur_t, :],
                       ref[..., cur_t], b_nnz[..., nb_t],
                       b_mv[..., nb_t, :], b_ref[..., nb_t])
    edge_top = jnp.where((intra | _is_intra_class(b_cls))[..., None], 4,
                         edge_top)

    # ---- filtering flags (GetMbFilteringFlags :280) ----
    col = jnp.arange(width_mbs)[None, :]
    row = jnp.arange(height_mbs)[:, None]
    enabled = dis != 1
    f_left = enabled & (col > 0) & ((dis != 2) | (sid == a_sid))
    f_top = enabled & (row > 0) & ((dis != 2) | (sid == b_sid))

    bs_left = jnp.where(enabled[..., None], inner_left, 0)
    bs_left = bs_left.at[..., cur_l].set(
        jnp.where(f_left[..., None], edge_left, 0))
    bs_top = jnp.where(enabled[..., None], inner_top, 0)
    bs_top = bs_top.at[..., cur_t].set(
        jnp.where(f_top[..., None], edge_top, 0))

    return (bs_left.reshape(n_mb, 16), bs_top.reshape(n_mb, 16))


def edge_thresholds(qp_y, slice_id, filter_off_a, filter_off_b,
                    chroma_qp_offset, width_mbs, height_mbs, chroma):
    """(alpha, beta, tc0[3]) per MB for INNER/TOP/LEFT edge classes
    (GetLumaEdgeThresholds :1390 / GetChromaEdgeThresholds :1462).
    Returns dict of (nMB, 3) / (nMB, 3, 3) arrays indexed [mb, cls]
    with cls 0=inner, 1=top, 2=left."""
    grid = lambda x: x.reshape(height_mbs, width_mbs)
    qp = grid(qp_y.astype(jnp.int32))
    offa = grid(filter_off_a.astype(jnp.int32))
    offb = grid(filter_off_b.astype(jnp.int32))

    qp_a = jnp.pad(qp, ((0, 0), (1, 0)), mode="edge")[:, :-1]
    qp_b = jnp.pad(qp, ((1, 0), (0, 0)), mode="edge")[:-1]

    def qmap(q):
        if chroma:
            off = grid(chroma_qp_offset.astype(jnp.int32))
            from .transform import lut_onehot
            return lut_onehot(QP_C, jnp.clip(q + off, 0, 51))
        return q

    qp_inner = qmap(qp)
    # averaged QP across MB edges; the reference averages the *mapped*
    # chroma QPs (GetChromaEdgeThresholds :1478-1484)
    qp_top = (qp_inner + qmap(qp_b) + 1) >> 1
    qp_left = (qp_inner + qmap(qp_a) + 1) >> 1

    qps = jnp.stack([qp_inner, qp_top, qp_left], axis=-1)  # (h, w, 3)
    idx_a = jnp.clip(qps + offa[..., None], 0, 51)
    idx_b = jnp.clip(qps + offb[..., None], 0, 51)

    # one-hot contraction instead of row gathers: a (nMB*3,) gather from
    # a 52-entry table costs ~73 ns/row on the TPU (these lookups
    # measured 0.78 ms/frame at 1080p); the (nMB, 3, 52) select+sum is
    # plain vector math the compiler fuses
    def lut(table, idx):
        oh = idx[..., None] == jnp.arange(52)[None, None, None, :]
        t = jnp.asarray(table)
        if t.ndim == 1:
            return jnp.where(oh, t[None, None, None, :], 0).sum(-1)
        # TC0 is (52, 3): contract per tc column
        return jnp.stack(
            [jnp.where(oh, t[None, None, None, :, k], 0).sum(-1)
             for k in range(t.shape[1])], axis=-1)

    alpha = lut(ALPHAS, idx_a).reshape(-1, 3)
    beta = lut(BETAS, idx_b).reshape(-1, 3)
    tc0 = lut(TC0, idx_a).reshape(-1, 3, 3)
    return alpha, beta, tc0


# ---------------------------------------------------------------------------
# Edge kernels (vectorized over the pixels along the edge).
# p/q: (N, 4) int32 with p[:, k] = p_k, q[:, k] = q_k.
# bs, alpha, beta: (N,); tc0v: (N,) = tc0[indexA][bs-1].
# Return new (p, q).
# ---------------------------------------------------------------------------

def _filter_luma_edge(p, q, bs, alpha, beta, tc0v):
    p0, p1, p2, p3 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    q0, q1, q2, q3 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    on = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
         (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)

    # weak filter (bS < 4), FilterVerLumaEdge :681-722
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta
    avg = (p0 + q0 + 1) >> 1
    p1w = p1 + jnp.clip((p2 + avg - (p1 << 1)) >> 1, -tc0v, tc0v)
    q1w = q1 + jnp.clip((q2 + avg - (q1 << 1)) >> 1, -tc0v, tc0v)
    tc = tc0v + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0w = jnp.clip(p0 + delta, 0, 255)
    q0w = jnp.clip(q0 - delta, 0, 255)

    # strong filter (bS == 4), :723-759
    sflag = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = sflag & ap
    sq = sflag & aq
    tp = p1 + p0 + q0
    p0s = jnp.where(sp, (p2 + 2 * tp + q1 + 4) >> 3, (2 * p1 + p0 + q1 + 2) >> 2)
    p1s = jnp.where(sp, (p2 + tp + 2) >> 2, p1)
    p2s = jnp.where(sp, (2 * p3 + 3 * p2 + tp + 4) >> 3, p2)
    tq = p0 + q0 + q1
    q0s = jnp.where(sq, (p1 + 2 * tq + q2 + 4) >> 3, (2 * q1 + q0 + p1 + 2) >> 2)
    q1s = jnp.where(sq, (tq + q2 + 2) >> 2, q1)
    q2s = jnp.where(sq, (2 * q3 + 3 * q2 + tq + 4) >> 3, q2)

    strong = bs == 4
    new_p0 = jnp.where(strong, p0s, p0w)
    new_p1 = jnp.where(strong, p1s, jnp.where(ap, p1w, p1))
    new_p2 = jnp.where(strong, p2s, p2)
    new_q0 = jnp.where(strong, q0s, q0w)
    new_q1 = jnp.where(strong, q1s, jnp.where(aq, q1w, q1))
    new_q2 = jnp.where(strong, q2s, q2)

    sel = lambda new, old: jnp.where(on, new, old)
    p = jnp.stack([sel(new_p0, p0), sel(new_p1, p1), sel(new_p2, p2), p3], 1)
    q = jnp.stack([sel(new_q0, q0), sel(new_q1, q1), sel(new_q2, q2), q3], 1)
    return p, q


def _filter_chroma_edge(p, q, bs, alpha, beta, tc0v):
    # FilterVerChromaEdge :961-1030: 2-pel reach, tc = tc0 + 1
    p0, p1 = p[:, 0], p[:, 1]
    q0, q1 = q[:, 0], q[:, 1]
    on = (bs > 0) & (jnp.abs(p0 - q0) < alpha) & \
         (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta)
    tc = tc0v + 1
    delta = jnp.clip((((q0 - p0) << 2) + (p1 - q1) + 4) >> 3, -tc, tc)
    p0w = jnp.clip(p0 + delta, 0, 255)
    q0w = jnp.clip(q0 - delta, 0, 255)
    p0s = (2 * p1 + p0 + q1 + 2) >> 2
    q0s = (2 * q1 + q0 + p1 + 2) >> 2
    strong = bs == 4
    new_p0 = jnp.where(on, jnp.where(strong, p0s, p0w), p0)
    new_q0 = jnp.where(on, jnp.where(strong, q0s, q0w), q0)
    return (p.at[:, 0].set(new_p0), q.at[:, 0].set(new_q0))


# ---------------------------------------------------------------------------
# Sequential whole-frame pass.
# ---------------------------------------------------------------------------

def _luma_mb(region, bs_left, bs_top, alpha, beta, tc0v):
    """Filter one MB. region: (20, 20) int32, MB at [4:20, 4:20].
    alpha/beta: (3,), tc0v: (3, 3) indexed [edge_class][bs-1]."""

    def tc_for(bs, cls):
        return jnp.asarray(tc0v)[cls, jnp.clip(bs - 1, 0, 2)]

    # vertical edges, left to right; each filters 16 pixel rows with the
    # per-block-row bS
    def v_edge(e, region):
        x = 4 + 4 * e
        cls = jnp.where(e == 0, 2, 0)
        bs = bs_left[jnp.arange(16) // 4 * 4 + e]
        # cols x-4..x+3 hold [p3 p2 p1 p0 | q0 q1 q2 q3] for all 16 rows
        pcols = lax.dynamic_slice(region, (4, x - 4), (16, 8))
        pv = pcols[:, 0:4][:, ::-1]
        qv = pcols[:, 4:8]
        pv, qv = _filter_luma_edge(pv, qv, bs, alpha[cls], beta[cls],
                                   tc_for(bs, cls))
        out = jnp.concatenate([pv[:, ::-1], qv], axis=1)
        return lax.dynamic_update_slice(region, out, (4, x - 4))

    region = lax.fori_loop(0, 4, v_edge, region)

    # horizontal edges, top to bottom
    def h_edge(v, region):
        y = 4 + 4 * v
        cls = jnp.where(v == 0, 1, 0)
        bs = bs_top[v * 4 + jnp.arange(16) // 4]
        rows = lax.dynamic_slice(region, (y - 4, 4), (8, 16))
        pv = rows[0:4][::-1].T  # (16, 4) p0..p3 per column
        qv = rows[4:8].T
        pv, qv = _filter_luma_edge(pv, qv, bs, alpha[cls], beta[cls],
                                   tc_for(bs, cls))
        out = jnp.concatenate([pv.T[::-1], qv.T], axis=0)
        return lax.dynamic_update_slice(region, out, (y - 4, 4))

    return lax.fori_loop(0, 4, h_edge, region)


def _chroma_mb(region, bs_left, bs_top, alpha, beta, tc0v):
    """Filter one chroma MB. region: (12, 12) int32, MB at [4:12, 4:12].
    Chroma reuses the luma bS: each luma block-row bS covers 2 chroma rows."""

    def tc_for(bs, cls):
        return jnp.asarray(tc0v)[cls, jnp.clip(bs - 1, 0, 2)]

    # vertical edges at chroma cols 0 and 4 (luma cols 0 and 8)
    def v_edge(e, region):
        x = 4 + 4 * e
        cls = jnp.where(e == 0, 2, 0)
        lum_col = e * 2  # luma block column 0 or 2
        bs = bs_left[(jnp.arange(8) // 2) * 4 + lum_col]
        pcols = lax.dynamic_slice(region, (4, x - 2), (8, 4))
        pv = pcols[:, 0:2][:, ::-1]
        qv = pcols[:, 2:4]
        pv, qv = _filter_chroma_edge(pv, qv, bs, alpha[cls], beta[cls],
                                     tc_for(bs, cls))
        out = jnp.concatenate([pv[:, ::-1], qv], axis=1)
        return lax.dynamic_update_slice(region, out, (4, x - 2))

    region = lax.fori_loop(0, 2, v_edge, region)

    def h_edge(v, region):
        y = 4 + 4 * v
        cls = jnp.where(v == 0, 1, 0)
        lum_row = v * 2
        bs = bs_top[lum_row * 4 + jnp.arange(8) // 2]
        rows = lax.dynamic_slice(region, (y - 2, 4), (4, 8))
        pv = rows[0:2][::-1].T
        qv = rows[2:4].T
        pv, qv = _filter_chroma_edge(pv, qv, bs, alpha[cls], beta[cls],
                                     tc_for(bs, cls))
        out = jnp.concatenate([pv.T[::-1], qv.T], axis=0)
        return lax.dynamic_update_slice(region, out, (y - 2, 4))

    return lax.fori_loop(0, 2, h_edge, region)


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs"))
def deblock_frame(y, cb, cr, mb_class, nnz, mv, ref_slot, slice_id,
                  disable_dblk, qp_y, filter_off_a, filter_off_b,
                  chroma_qp_offset, width_mbs, height_mbs):
    """Filter the whole picture in place (reference h264bsdFilterPicture
    deblocking.c:575-640). Returns filtered (y, cb, cr) uint8."""
    mb_class = mb_class.astype(jnp.int32)

    bs_left, bs_top = boundary_strengths(
        mb_class, nnz.astype(jnp.int32), mv.astype(jnp.int32),
        ref_slot.astype(jnp.int32), slice_id.astype(jnp.int32),
        disable_dblk.astype(jnp.int32), width_mbs, height_mbs)
    l_alpha, l_beta, l_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        width_mbs, height_mbs, chroma=False)
    c_alpha, c_beta, c_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        width_mbs, height_mbs, chroma=True)
    return deblock_frame_with_bs(
        y, cb, cr, bs_left, bs_top, (l_alpha, l_beta, l_tc0),
        (c_alpha, c_beta, c_tc0), width_mbs, height_mbs)


def deblock_frame_with_bs(y, cb, cr, bs_left, bs_top, luma_thr, chroma_thr,
                          width_mbs, height_mbs):
    """The order-dependent pixel half of deblock_frame with the parallel
    half (bS values + thresholds) supplied by the caller — the seam the
    row-sharded step (parallel.rowshard) uses to patch boundary strengths
    at stripe borders before filtering."""
    n_mb = bs_left.shape[0]
    l_alpha, l_beta, l_tc0 = luma_thr
    c_alpha, c_beta, c_tc0 = chroma_thr

    # 4-pixel top/left pad keeps all windows in bounds
    yp = jnp.pad(y.astype(jnp.int32), ((4, 0), (4, 0)))
    cbp = jnp.pad(cb.astype(jnp.int32), ((4, 0), (4, 0)))
    crp = jnp.pad(cr.astype(jnp.int32), ((4, 0), (4, 0)))

    def body(i, planes):
        yp, cbp, crp = planes
        mb_x = (i % width_mbs) * 16
        mb_y = (i // width_mbs) * 16

        def run(planes):
            yp, cbp, crp = planes
            region = lax.dynamic_slice(yp, (mb_y, mb_x), (20, 20))
            region = _luma_mb(region, bs_left[i], bs_top[i], l_alpha[i],
                              l_beta[i], l_tc0[i])
            yp = lax.dynamic_update_slice(yp, region, (mb_y, mb_x))

            cx, cy = mb_x // 2, mb_y // 2
            creg = lax.dynamic_slice(cbp, (cy, cx), (12, 12))
            creg = _chroma_mb(creg, bs_left[i], bs_top[i], c_alpha[i],
                              c_beta[i], c_tc0[i])
            cbp = lax.dynamic_update_slice(cbp, creg, (cy, cx))
            creg = lax.dynamic_slice(crp, (cy, cx), (12, 12))
            creg = _chroma_mb(creg, bs_left[i], bs_top[i], c_alpha[i],
                              c_beta[i], c_tc0[i])
            crp = lax.dynamic_update_slice(crp, creg, (cy, cx))
            return (yp, cbp, crp)

        any_bs = (bs_left[i].max() > 0) | (bs_top[i].max() > 0)
        return lax.cond(any_bs, run, lambda p: p, (yp, cbp, crp))

    yp, cbp, crp = lax.fori_loop(0, n_mb, body, (yp, cbp, crp))
    return (yp[4:, 4:].astype(jnp.uint8), cbp[4:, 4:].astype(jnp.uint8),
            crp[4:, 4:].astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Wavefront-parallel whole-frame pass.
#
# Cross-MB dependencies of the standard's raster filtering order: MB(r,c)
# needs (r,c-1) fully filtered (its vertical edges read the left MB's last
# columns after that MB's horizontal filtering) and (r-1,c)/(r-1,c+1)
# (its top edge reads bottom rows also touched by the upper-right MB's
# left-edge filtering). All three precede (r,c) on anti-diagonals of slope
# 2 (t = 2r + c), so every diagonal filters in parallel; the 20x20 windows
# of one diagonal are pairwise disjoint (columns 32 pels apart).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("width_mbs", "height_mbs"))
def deblock_frame_wavefront(y, cb, cr, mb_class, nnz, mv, ref_slot, slice_id,
                            disable_dblk, qp_y, filter_off_a, filter_off_b,
                            chroma_qp_offset, width_mbs, height_mbs):
    """Same semantics as deblock_frame, 2r+c wavefront schedule."""
    w, h = width_mbs, height_mbs
    mb_class = mb_class.astype(jnp.int32)

    bs_left, bs_top = boundary_strengths(
        mb_class, nnz.astype(jnp.int32), mv.astype(jnp.int32),
        ref_slot.astype(jnp.int32), slice_id.astype(jnp.int32),
        disable_dblk.astype(jnp.int32), w, h)
    l_alpha, l_beta, l_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        w, h, chroma=False)
    c_alpha, c_beta, c_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        w, h, chroma=True)

    yp = jnp.pad(y.astype(jnp.int32), ((4, 0), (4, 0)))
    cbp = jnp.pad(cb.astype(jnp.int32), ((4, 0), (4, 0)))
    crp = jnp.pad(cr.astype(jnp.int32), ((4, 0), (4, 0)))

    max_diag = min(h, w // 2 + 1)
    n_steps = 2 * (h - 1) + w
    lane = jnp.arange(max_diag)
    far = jnp.int32(1 << 28)  # out-of-bounds => scatter mode="drop"

    def step(t, planes):
        yp, cbp, crp = planes
        r_lo = jnp.maximum(0, (t - w + 2) // 2)
        rs = r_lo + lane
        cs = t - 2 * rs
        valid = (rs < h) & (cs >= 0) & (cs < w)
        mbi = jnp.where(valid, rs * w + cs, 0)

        def filt(planes, region_fn, size, scale):
            plane_i = planes
            rows = jnp.where(valid, rs * scale, far)[:, None, None] + \
                jnp.arange(size)[None, :, None]
            cols = jnp.where(valid, cs * scale, far)[:, None, None] + \
                jnp.arange(size)[None, None, :]
            regions = plane_i.at[rows, cols].get(mode="fill", fill_value=0)
            filtered = region_fn(regions, mbi)
            return plane_i.at[rows, cols].set(filtered, mode="drop",
                                              unique_indices=True)

        yp = filt(yp, lambda reg, mbi: jax.vmap(_luma_mb)(
            reg, bs_left[mbi], bs_top[mbi], l_alpha[mbi], l_beta[mbi],
            l_tc0[mbi]), 20, 16)
        chroma_fn = lambda reg, mbi: jax.vmap(_chroma_mb)(
            reg, bs_left[mbi], bs_top[mbi], c_alpha[mbi], c_beta[mbi],
            c_tc0[mbi])
        cbp = filt(cbp, chroma_fn, 12, 8)
        crp = filt(crp, chroma_fn, 12, 8)
        return (yp, cbp, crp)

    yp, cbp, crp = lax.fori_loop(0, n_steps, step, (yp, cbp, crp))
    return (yp[4:, 4:].astype(jnp.uint8), cbp[4:, 4:].astype(jnp.uint8),
            crp[4:, 4:].astype(jnp.uint8))


# ---------------------------------------------------------------------------
# Skewed wavefront: MB (r, c) is stored at skewed MB column c + 2r, which
# turns every slope-2 anti-diagonal {2r + c == t} into the single skewed
# column t. Each wavefront step then works on rectangular column slabs
# (dynamic slices, no gathers):
#   * vertical edges: slab t plus a 4-column halo from slab t-1 (the left
#     neighbour (r, c-1) sits at skew column t-1 in the same pixel rows)
#   * horizontal edges: the top-edge p-pels come from slab t-2 (the above
#     neighbour (r-1, c) sits at skew column t-2, same pixel rows)
# Invalid lanes (t-2r outside the picture) carry bS == 0 in the skewed
# bS arrays, so their lanes no-op automatically.
# ---------------------------------------------------------------------------

def _skew_plane(plane, mb_size, width_mbs, height_mbs):
    h, w = height_mbs, width_mbs
    wsk = (w + 2 * (h - 1)) * mb_size
    out = jnp.zeros((h * mb_size, wsk), plane.dtype)
    for r in range(h):
        band = lax.dynamic_slice(plane, (r * mb_size, 0),
                                 (mb_size, w * mb_size))
        out = lax.dynamic_update_slice(out, band,
                                       (r * mb_size, 2 * r * mb_size))
    return out


def _unskew_plane(sk, mb_size, width_mbs, height_mbs):
    h, w = height_mbs, width_mbs
    rows = []
    for r in range(h):
        rows.append(lax.dynamic_slice(
            sk, (r * mb_size, 2 * r * mb_size), (mb_size, w * mb_size)))
    return jnp.concatenate(rows, axis=0)


def _skew_mb_array(arr, width_mbs, height_mbs):
    """(nMB, ...) -> (h, w + 2(h-1), ...) with zeros outside the picture."""
    h, w = height_mbs, width_mbs
    wsk = w + 2 * (h - 1)
    a = arr.reshape((h, w) + arr.shape[1:])
    out = jnp.zeros((h, wsk) + arr.shape[1:], arr.dtype)
    for r in range(h):
        out = out.at[r, 2 * r:2 * r + w].set(a[r])
    return out


def _expand_rows(per_mb_row, reps):
    """(h, k) -> (h*k*reps,) repeating each value reps times."""
    return jnp.repeat(per_mb_row.reshape(-1), reps)


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs"))
def deblock_frame_skewed(y, cb, cr, mb_class, nnz, mv, ref_slot, slice_id,
                         disable_dblk, qp_y, filter_off_a, filter_off_b,
                         chroma_qp_offset, width_mbs, height_mbs):
    """Same semantics as deblock_frame; wavefront over skewed columns."""
    w, h = width_mbs, height_mbs
    H = h * 16
    mb_class = mb_class.astype(jnp.int32)

    bs_left, bs_top = boundary_strengths(
        mb_class, nnz.astype(jnp.int32), mv.astype(jnp.int32),
        ref_slot.astype(jnp.int32), slice_id.astype(jnp.int32),
        disable_dblk.astype(jnp.int32), w, h)
    l_alpha, l_beta, l_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        w, h, chroma=False)
    c_alpha, c_beta, c_tc0 = edge_thresholds(
        qp_y, slice_id, filter_off_a, filter_off_b, chroma_qp_offset,
        w, h, chroma=True)

    bsl = _skew_mb_array(bs_left, w, h)       # (h, wsk, 16)
    bst = _skew_mb_array(bs_top, w, h)
    lal = _skew_mb_array(l_alpha, w, h)       # (h, wsk, 3)
    lbe = _skew_mb_array(l_beta, w, h)
    ltc = _skew_mb_array(l_tc0, w, h)         # (h, wsk, 3, 3)
    cal = _skew_mb_array(c_alpha, w, h)
    cbe = _skew_mb_array(c_beta, w, h)
    ctc = _skew_mb_array(c_tc0, w, h)

    ysk = _skew_plane(y.astype(jnp.int32), 16, w, h)
    cbsk = _skew_plane(cb.astype(jnp.int32), 8, w, h)
    crsk = _skew_plane(cr.astype(jnp.int32), 8, w, h)
    n_steps = 2 * (h - 1) + w

    def mb_col(arr, t):
        return lax.dynamic_slice_in_dim(arr, t, 1, axis=1)[:, 0]

    def luma_step(t, ysk):
        bsl_t = mb_col(bsl, t)               # (h, 16)
        bst_t = mb_col(bst, t)
        al_t = mb_col(lal, t)                # (h, 3)
        be_t = mb_col(lbe, t)
        tc_t = mb_col(ltc, t)                # (h, 3, 3)

        # ---- vertical edges: slab t with a 4-col halo from slab t-1 ----
        halo_at = jnp.maximum(t - 1, 0) * 16 + 12
        halo = lax.dynamic_slice(ysk, (0, halo_at), (H, 4))
        blk = lax.dynamic_slice(ysk, (0, t * 16), (H, 16))
        cols = jnp.concatenate([halo, blk], axis=1)    # (H, 20)

        for e in range(4):
            x = 4 + 4 * e
            cls = 2 if e == 0 else 0
            bs_rows = _expand_rows(bsl_t[:, [e, 4 + e, 8 + e, 12 + e]], 4)
            al_rows = jnp.repeat(al_t[:, cls], 16)
            be_rows = jnp.repeat(be_t[:, cls], 16)
            tc_r = jnp.repeat(tc_t[:, cls], 16, axis=0)       # (H, 3)
            tcv = jnp.take_along_axis(
                tc_r, jnp.clip(bs_rows - 1, 0, 2)[:, None], axis=1)[:, 0]
            p = cols[:, x - 4:x][:, ::-1]
            q = cols[:, x:x + 4]
            p, q = _filter_luma_edge(p, q, bs_rows, al_rows, be_rows, tcv)
            cols = lax.dynamic_update_slice(
                cols, jnp.concatenate([p[:, ::-1], q], axis=1), (0, x - 4))

        ysk = lax.dynamic_update_slice(ysk, cols[:, 0:4], (0, halo_at))
        ysk = lax.dynamic_update_slice(ysk, cols[:, 4:20], (0, t * 16))

        # ---- horizontal edges ----
        slab = lax.dynamic_slice(ysk, (0, t * 16), (H, 16)).reshape(h, 16, 16)
        m2_at = jnp.maximum(t - 2, 0) * 16
        slab2 = lax.dynamic_slice(ysk, (0, m2_at), (H, 16)).reshape(h, 16, 16)

        for v in range(4):
            cls = 1 if v == 0 else 0
            # per-column bs: column x uses bs_top[v*4 + x//4]
            bs_cols = jnp.repeat(bst_t[:, v * 4:v * 4 + 4], 4, axis=1)  # (h,16)
            bs_n = bs_cols.reshape(-1)                # (h*16,) band-major cols
            al_n = jnp.repeat(al_t[:, cls], 16)
            be_n = jnp.repeat(be_t[:, cls], 16)
            tc_b = jnp.repeat(tc_t[:, cls], 16, axis=0)
            tc_n = jnp.take_along_axis(
                tc_b, jnp.clip(bs_n - 1, 0, 2)[:, None], axis=1)[:, 0]
            if v == 0:
                # the above MB of lane (r, c) is band r-1 of slab t-2
                prows = jnp.roll(slab2, 1, axis=0)[:, 15:11:-1]
            else:
                prows = slab[:, v * 4 - 4:v * 4][:, ::-1]
            qrows = slab[:, v * 4:v * 4 + 4]
            p = prows.transpose(0, 2, 1).reshape(-1, 4)   # (h*16, 4)
            q = qrows.transpose(0, 2, 1).reshape(-1, 4)
            p, q = _filter_luma_edge(p, q, bs_n, al_n, be_n, tc_n)
            pr = p.reshape(h, 16, 4).transpose(0, 2, 1)[:, ::-1]  # p3..p0
            qr = q.reshape(h, 16, 4).transpose(0, 2, 1)
            if v == 0:
                slab2 = slab2.at[:, 12:16].set(jnp.roll(pr, -1, axis=0))
            else:
                slab = slab.at[:, v * 4 - 4:v * 4].set(pr)
            slab = slab.at[:, v * 4:v * 4 + 4].set(qr)

        # slab2 aliases slab when t < 2 (clamped offset): write it first so
        # the filtered slab wins
        ysk = lax.dynamic_update_slice(ysk, slab2.reshape(H, 16), (0, m2_at))
        ysk = lax.dynamic_update_slice(ysk, slab.reshape(H, 16), (0, t * 16))
        return ysk

    def chroma_step(t, csk, cal_t, cbe_t, ctc_t, bsl_t, bst_t):
        Hc = h * 8
        halo_at = jnp.maximum(t - 1, 0) * 8 + 6
        halo = lax.dynamic_slice(csk, (0, halo_at), (Hc, 2))
        blk = lax.dynamic_slice(csk, (0, t * 8), (Hc, 8))
        cols = jnp.concatenate([halo, blk], axis=1)    # (Hc, 10)

        for e in range(2):
            x = 2 + 4 * e
            cls = 2 if e == 0 else 0
            lum_col = e * 2
            # chroma row cr uses luma bS[(cr//2)*4 + lum_col]
            bs_rows = _expand_rows(
                bsl_t[:, [lum_col, 4 + lum_col, 8 + lum_col, 12 + lum_col]], 2)
            al_rows = jnp.repeat(cal_t[:, cls], 8)
            be_rows = jnp.repeat(cbe_t[:, cls], 8)
            tc_r = jnp.repeat(ctc_t[:, cls], 8, axis=0)
            tcv = jnp.take_along_axis(
                tc_r, jnp.clip(bs_rows - 1, 0, 2)[:, None], axis=1)[:, 0]
            p = cols[:, x - 2:x][:, ::-1]
            q = cols[:, x:x + 2]
            p, q = _filter_chroma_edge(p, q, bs_rows, al_rows, be_rows, tcv)
            cols = cols.at[:, x - 1].set(p[:, 0])
            cols = cols.at[:, x].set(q[:, 0])

        csk = lax.dynamic_update_slice(csk, cols[:, 0:2], (0, halo_at))
        csk = lax.dynamic_update_slice(csk, cols[:, 2:10], (0, t * 8))

        slab = lax.dynamic_slice(csk, (0, t * 8), (Hc, 8)).reshape(h, 8, 8)
        m2_at = jnp.maximum(t - 2, 0) * 8
        slab2 = lax.dynamic_slice(csk, (0, m2_at), (Hc, 8)).reshape(h, 8, 8)

        for v in range(2):
            cls = 1 if v == 0 else 0
            lum_row = v * 2
            bs_cols = jnp.repeat(bst_t[:, lum_row * 4:lum_row * 4 + 4], 2,
                                 axis=1)               # (h, 8)
            bs_n = bs_cols.reshape(-1)
            al_n = jnp.repeat(cal_t[:, cls], 8)
            be_n = jnp.repeat(cbe_t[:, cls], 8)
            tc_b = jnp.repeat(ctc_t[:, cls], 8, axis=0)
            tc_n = jnp.take_along_axis(
                tc_b, jnp.clip(bs_n - 1, 0, 2)[:, None], axis=1)[:, 0]
            if v == 0:
                prows = jnp.roll(slab2, 1, axis=0)[:, 7:5:-1]  # p0, p1
            else:
                prows = slab[:, v * 4 - 2:v * 4][:, ::-1]
            qrows = slab[:, v * 4:v * 4 + 2]
            p = prows.transpose(0, 2, 1).reshape(-1, 2)
            q = qrows.transpose(0, 2, 1).reshape(-1, 2)
            p, q = _filter_chroma_edge(p, q, bs_n, al_n, be_n, tc_n)
            if v == 0:
                slab2 = slab2.at[:, 7].set(
                    jnp.roll(p[:, 0].reshape(h, 8), -1, axis=0))
            else:
                slab = slab.at[:, v * 4 - 1].set(p[:, 0].reshape(h, 8))
            slab = slab.at[:, v * 4].set(q[:, 0].reshape(h, 8))

        csk = lax.dynamic_update_slice(csk, slab2.reshape(Hc, 8), (0, m2_at))
        csk = lax.dynamic_update_slice(csk, slab.reshape(Hc, 8), (0, t * 8))
        return csk

    def step(t, state):
        ysk, cbsk, crsk = state
        ysk = luma_step(t, ysk)
        cal_t = mb_col(cal, t)
        cbe_t = mb_col(cbe, t)
        ctc_t = mb_col(ctc, t)
        bsl_t = mb_col(bsl, t)
        bst_t = mb_col(bst, t)
        cbsk = chroma_step(t, cbsk, cal_t, cbe_t, ctc_t, bsl_t, bst_t)
        crsk = chroma_step(t, crsk, cal_t, cbe_t, ctc_t, bsl_t, bst_t)
        return (ysk, cbsk, crsk)

    ysk, cbsk, crsk = lax.fori_loop(0, n_steps, step, (ysk, cbsk, crsk))
    return (_unskew_plane(ysk, 16, w, h).astype(jnp.uint8),
            _unskew_plane(cbsk, 8, w, h).astype(jnp.uint8),
            _unskew_plane(crsk, 8, w, h).astype(jnp.uint8))
