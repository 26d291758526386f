"""Inverse quantization + inverse transform, whole-frame batched.

Behavioral parity: reference h264bsd_transform.c (h264bsdProcessBlock :97,
h264bsdProcessLumaDc :255, h264bsdProcessChromaDc :359) and the residual
orchestration in ProcessResidual (h264bsd_macroblock_layer.c:1340-1421).

TPU-native design: the reference processes one 4x4 block at a time inside the
per-MB decode loop; here every residual block of the frame is transformed in
one batched integer pass over (nMB, 24, 16) tensors — pure VPU-friendly
elementwise/butterfly math, fully parallel, no intra-frame dependencies.
The host front-end delivers coefficients already inverse-zigzagged into
raster positions (mbparse.cpp emit_mb), so no gathers are needed here.

All arithmetic is int32; right shifts are arithmetic, matching the C.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# level scale table, spec 8.5.9 (reference transform.c:58-59)
LEVEL_SCALE = np.array(
    [[10, 13, 16], [11, 14, 18], [13, 16, 20],
     [14, 18, 23], [16, 20, 25], [18, 23, 29]], np.int32)

# dequant scale column by raster position within the 4x4 block
# (reference transform.c:120-155 tmp1/tmp2/tmp3 assignment pattern)
SCALE_IDX = np.array([0, 1, 0, 1, 1, 2, 1, 2, 0, 1, 0, 1, 1, 2, 1, 2], np.int32)

# chroma QP mapping, spec Table 8-15 (reference h264bsd_util.c:53)
QP_C = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
                 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 29, 30,
                 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
                 38, 39, 39, 39, 39], np.int32)


def lut_onehot(table, idx):
    """Small-table row lookup as a one-hot select+sum: a row gather costs
    ~73 ns per row on the TPU regardless of row size, so table lookups
    over per-MB/per-block vectors dominated profiles; the (N, K) one-hot
    contraction (K <= 52 here) is fused vector math instead. `table` is
    (K,) or (K, C); returns (N,) / (N, C)."""
    t = jnp.asarray(table)
    oh = idx[..., None] == jnp.arange(t.shape[0])
    if t.ndim == 1:
        return jnp.where(oh, t, 0).sum(-1)
    return jnp.where(oh[..., None], t, 0).sum(-2)


# levelScale[qp%6][SCALE_IDX] pre-expanded per raster position: one
# (N, 6) one-hot contraction yields all 16 positions at once
LEVEL_SCALE_POS = LEVEL_SCALE[:, SCALE_IDX]             # (6, 16)


def _dequant_scales(qp):
    """Per-raster-position dequant multipliers for a (nMB,) qp vector ->
    (nMB, 16) int32 (levelScale[qp%6][SCALE_IDX] << qp//6)."""
    per_pos = lut_onehot(LEVEL_SCALE_POS, qp % 6)        # (nMB, 16)
    return per_pos << (qp // 6)[:, None]


def idct_butterflies(d):
    """The LINEAR part of the H.264 integer inverse transform on
    raster-ordered (…, 16) int32 blocks — butterflies only, WITHOUT the
    final (x+32)>>6 rounding (reference transform.c:157-186). Linear in
    the coefficients, and a DC-only input spreads to a constant block:
    butterflies(DC·e0) == DC at all 16 positions — which lets callers
    add an externally transformed DC AFTER the per-entry butterflies
    and round once, densely (residual_planes_sparse)."""
    d = d.reshape(d.shape[:-1] + (4, 4))
    # horizontal butterflies
    t0 = d[..., 0] + d[..., 2]
    t1 = d[..., 0] - d[..., 2]
    t2 = (d[..., 1] >> 1) - d[..., 3]
    t3 = d[..., 1] + (d[..., 3] >> 1)
    d = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    # vertical butterflies
    t0 = d[..., 0, :] + d[..., 2, :]
    t1 = d[..., 0, :] - d[..., 2, :]
    t2 = (d[..., 1, :] >> 1) - d[..., 3, :]
    t3 = d[..., 1, :] + (d[..., 3, :] >> 1)
    d = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-2)
    return d.reshape(d.shape[:-2] + (16,))


def idct4x4(d):
    """H.264 integer inverse transform on raster-ordered (…, 16) int32 blocks
    including the final (x+32)>>6 rounding (reference transform.c:157-190)."""
    return (idct_butterflies(d) + 32) >> 6


def luma_dc_transform(dc, qp):
    """4x4 Hadamard + scaling of the Intra_16x16 luma DC block
    (reference h264bsdProcessLumaDc transform.c:255-338). dc is
    raster-ordered (nMB, 16); qp is (nMB,)."""
    d = dc.reshape(-1, 4, 4)
    t0 = d[..., 0] + d[..., 2]
    t1 = d[..., 0] - d[..., 2]
    t2 = d[..., 1] - d[..., 3]
    t3 = d[..., 1] + d[..., 3]
    d = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)
    t0 = d[..., 0, :] + d[..., 2, :]
    t1 = d[..., 0, :] - d[..., 2, :]
    t2 = d[..., 1, :] - d[..., 3, :]
    t3 = d[..., 1, :] + d[..., 3, :]
    d = jnp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-2)
    d = d.reshape(-1, 16)

    lev = lut_onehot(LEVEL_SCALE[:, 0], qp % 6)      # (nMB,)
    qp_div = qp // 6
    hi = d * (lev << jnp.maximum(qp_div - 2, 0))[:, None]
    rnd = jnp.where(qp_div == 1, 1, 2)
    lo = (d * lev[:, None] + rnd[:, None]) >> jnp.maximum(2 - qp_div, 0)[:, None]
    return jnp.where((qp >= 12)[:, None], hi, lo)


def chroma_dc_transform(cdc, chroma_qp):
    """2x2 transform + scaling of both chroma DC blocks
    (reference h264bsdProcessChromaDc transform.c:359-401). cdc is
    (nMB, 8) = cb[4] + cr[4]; chroma_qp is (nMB,)."""
    d = cdc.reshape(-1, 2, 4)
    t0 = d[..., 0] + d[..., 2]
    t1 = d[..., 0] - d[..., 2]
    t2 = d[..., 1] - d[..., 3]
    t3 = d[..., 1] + d[..., 3]
    out = jnp.stack([t0 + t3, t0 - t3, t1 + t2, t1 - t2], axis=-1)
    out = out.reshape(-1, 8)

    lev = lut_onehot(LEVEL_SCALE[:, 0], chroma_qp % 6)
    qp_div = chroma_qp // 6
    hi = out * (lev << jnp.maximum(qp_div - 1, 0))[:, None]
    lo = out * lev[:, None] >> 1
    return jnp.where((chroma_qp >= 6)[:, None], hi, lo)


def residual_transform(coeff, luma_dc, chroma_dc, qp_y, chroma_qp_offset,
                       nnz, nnz_dc, is_i16):
    """Full-frame residual processing (ProcessResidual equivalent).

    Args:
      coeff: (nMB, 24, 16) int32 raw levels, raster positions; blocks
             0..15 luma (raster), 16..19 cb, 20..23 cr.
      luma_dc: (nMB, 16) int32 raw Intra_16x16 luma DC (raster).
      chroma_dc: (nMB, 8) int32 raw chroma DC (cb then cr).
      qp_y: (nMB,) int32; chroma_qp_offset: scalar or (nMB,) int32.
      nnz: (nMB, 24) int32 totalCoeff per block.
      nnz_dc: (nMB, 3) int32 totalCoeff of luma DC / cb DC / cr DC blocks.
      is_i16: (nMB,) bool.

    Returns:
      residual: (nMB, 24, 16) int32 pixel-domain residual.
      empty: (nMB, 24) bool — blocks whose residual is skipped entirely
             (reference MARK_RESIDUAL_EMPTY path).
    """
    n_mb = coeff.shape[0]
    chroma_qp = lut_onehot(QP_C, jnp.clip(qp_y + chroma_qp_offset, 0, 51))

    # --- DC paths ---
    ldc = jnp.where((nnz_dc[:, 0] > 0)[:, None],
                    luma_dc_transform(luma_dc, qp_y), luma_dc)
    has_cdc = (nnz_dc[:, 1] > 0) | (nnz_dc[:, 2] > 0)
    cdc = jnp.where(has_cdc[:, None],
                    chroma_dc_transform(chroma_dc, chroma_qp), chroma_dc)

    # --- dequant ---
    luma_scales = _dequant_scales(qp_y)        # (nMB, 16)
    chroma_scales = _dequant_scales(chroma_qp)
    d = coeff.astype(jnp.int32)
    d = d.at[:, :16, :].multiply(luma_scales[:, None, :])
    d = d.at[:, 16:, :].multiply(chroma_scales[:, None, :])

    # --- DC insertion (skip-dc blocks get externally computed DC) ---
    # luma blocks of I16 MBs take the transformed DC; chroma blocks always
    d = d.at[:, :16, 0].set(jnp.where(is_i16[:, None], ldc, d[:, :16, 0]))
    d = d.at[:, 16:, 0].set(cdc)

    # --- inverse transform, all 24 blocks at once ---
    res = idct4x4(d)

    # --- empty-block mask (ProcessResidual's MARK_RESIDUAL_EMPTY logic) ---
    luma_empty = jnp.where(is_i16[:, None],
                           (ldc == 0) & (nnz[:, :16] == 0),
                           nnz[:, :16] == 0)
    chroma_empty = (cdc == 0) & (nnz[:, 16:] == 0)
    empty = jnp.concatenate([luma_empty, chroma_empty], axis=1)

    res = jnp.where(empty[:, :, None], 0, res)
    return res, empty


def mb_residual_planes(residual):
    """Scatter (nMB, 24, 16) block residuals into per-MB pixel layouts:
    luma (nMB, 16, 16) and chroma (nMB, 2, 8, 8)."""
    n_mb = residual.shape[0]
    luma = residual[:, :16].reshape(n_mb, 4, 4, 4, 4)      # (by, bx, y, x)
    luma = luma.transpose(0, 1, 3, 2, 4).reshape(n_mb, 16, 16)
    chroma = residual[:, 16:].reshape(n_mb, 2, 2, 2, 4, 4)  # (pl, by, bx, y, x)
    chroma = chroma.transpose(0, 1, 2, 4, 3, 5).reshape(n_mb, 2, 8, 8)
    return luma, chroma


def residual_planes_sparse(sparse_ids, sparse_levels, qp_y,
                           chroma_qp_offset, nnz_dc, is_i16, n_mb,
                           luma_rowtile=False):
    """Sparse-domain ProcessResidual: dequant+IDCT only the non-empty
    blocks (a few percent of the frame) instead of the dense
    (nMB, 24, 16) array, then scatter pixel-domain residuals.

    sparse_ids: (cap,) int32 block ids (mb*26 + b, b 0..23 AC / 24 luma
    DC / 25 chroma DC; padding == nMB*26); sparse_levels: (cap, 16) int.
    Returns (res_l (nMB,16,16), res_c (nMB,2,8,8)) int32, identical to
    mb_residual_planes(residual_transform(...)[0]).

    A block carrying only an (externally transformed) DC has the closed
    form residual (dc + 32) >> 6 broadcast over the block (the reference's
    DC-only fast path, transform.c:191-229 with a single coefficient), so
    absent-from-stream blocks of Intra_16x16 MBs and chroma blocks get
    their DC-only base vectorized per MB; sparse AC entries overwrite it.
    """
    cap = sparse_ids.shape[0]
    chroma_qp = lut_onehot(QP_C, jnp.clip(qp_y + chroma_qp_offset, 0, 51))

    valid = sparse_ids < n_mb * 26
    ids = jnp.minimum(sparse_ids, n_mb * 26 - 1)
    mb = ids // 26
    b = ids % 26

    # dense DC arrays from the sparse DC entries (AC/padding entries are
    # remapped to distinct spare rows so the scatter keeps truly unique
    # indices — XLA's fast path; a shared spare row is the slow generic
    # scatter and UB under unique_indices). ONE scatter over the stacked
    # [luma DC | chroma DC] domain: separate per-kind scatters each
    # walk the full cap-sized entry stream (scatter cost is per entry)
    from .unpack import scatter_unique
    lv32 = sparse_levels.astype(jnp.int32)
    dc_id = jnp.where(valid & (b == 24), mb,
                      jnp.where(valid & (b == 25), n_mb + mb, 2 * n_mb))
    dc_buf = scatter_unique(jnp.zeros((2 * n_mb, 16), jnp.int32),
                            dc_id, lv32, 2 * n_mb)
    ldc_raw = dc_buf[:n_mb]
    cdc_raw = dc_buf[n_mb:, :8]

    ldc = jnp.where((nnz_dc[:, 0] > 0)[:, None],
                    luma_dc_transform(ldc_raw, qp_y), ldc_raw)
    has_cdc = (nnz_dc[:, 1] > 0) | (nnz_dc[:, 2] > 0)
    cdc = jnp.where(has_cdc[:, None],
                    chroma_dc_transform(cdc_raw, chroma_qp), cdc_raw)

    # per-entry dequant + LINEAR butterflies (AC entries only; DC
    # entries compute garbage and are dropped by the scatter id below).
    # The externally transformed DC is NOT injected per entry: the
    # butterflies are linear in the DC slot (idct_butterflies docstring),
    # so the DC term adds DENSELY after the scatter and the (x+32)>>6
    # rounding happens once — this removes three per-entry row gathers
    # (ldc/cdc take_along_axis + the inject selects, ~0.3 ms/frame at
    # 1080p) and makes the empty-block DC-only base the same formula
    # (scattered butterflies are zero there).
    is_luma = b < 16
    qp_e = jnp.where(is_luma, qp_y[mb], chroma_qp[mb])
    scales = _dequant_scales(qp_e)                       # (cap, 16)
    d = sparse_levels.astype(jnp.int32) * scales
    # blocks whose DC arrives via the external DC path carry level 0 in
    # slot 0 by construction (the AC scan skips it); zero it anyway for
    # non-injected garbage entries' safety
    bf_e = idct_butterflies(d)                           # (cap, 16)

    from .unpack import scatter_present
    dc_l = jnp.where(is_i16[:, None] != 0, ldc, 0)       # (nMB, 16)

    if luma_rowtile:
        # luma in plane-chunk "rowtile" layout (nG, 16, 128): group g =
        # MBs [8g, 8g+8), MB m's pixel (r, c) at [g, r, 16m + c] — the
        # layout the Pallas MC kernel emits and one major-dim reshape
        # from the plane itself. The butterflied 4x4 blocks scatter as
        # 16-value rows in the PLACEMENT-ID domain (each block's (group,
        # row-band, lane-slot) triple is unique), then one int32
        # relayout yields the pixel tiles — a 2D-window scatter here
        # lowered to a serialized per-window loop on TPU (~150 ms/frame,
        # the round-4 negative result). Caller guarantees n_mb % 8 == 0.
        from .unpack import (rowtile_cell_ids, rowtile_cell_scatter,
                             rowtile_cells_to_tiles)
        n_g8 = n_mb // 8
        # ONE scatter over the unified [luma | cb | cr] placement
        # domain: per-plane scatters each walked the full cap-sized
        # entry stream, tripling the per-entry scatter cost (the
        # single biggest glue item of the round-5 attr trace)
        n_cl, n_cc = n_g8 * 128, n_g8 * 32
        is_lac = valid & (b < 16)
        is_chr = valid & (b >= 16) & (b < 24)
        blk_c = (b - 16) & 3
        pid = jnp.where(
            is_lac, rowtile_cell_ids(mb, b // 4, b % 4, 4, 32),
            n_cl + jnp.where(b >= 20, n_cc, 0)
            + rowtile_cell_ids(mb, blk_c // 2, blk_c % 2, 2, 16))
        cells, _ = rowtile_cell_scatter(pid, is_lac | is_chr, bf_e,
                                        n_cl + 2 * n_cc)
        lt = rowtile_cells_to_tiles(cells[:n_cl], n_g8, 4, 32)
        # DC lane map: dc_l[8g+m, 4*by+bx] broadcast over its 4x4 patch
        dcrt = jnp.repeat(dc_l.reshape(n_g8, 8, 4, 4)
                          .transpose(0, 2, 1, 3), 4, axis=3)
        dcrt = jnp.repeat(dcrt.reshape(n_g8, 4, 128), 4, axis=1)
        res_l = (lt + dcrt + 32) >> 6
        # chroma in HALF-chunk rowtile tiles (nG, 8, 64): 8 consecutive
        # MBs' 8-px chroma rows are 64 contiguous plane pixels under the
        # same width_mbs % 8 == 0 gate (full 128-lane chunks would need
        # 16 MBs and wrap rows at 1080p's 120). One (cb, cr) pair of
        # tile stacks; the plane is again a major-dim reshape away.
        res_c = []
        for p in range(2):
            ct = rowtile_cells_to_tiles(
                cells[n_cl + p * n_cc:n_cl + (p + 1) * n_cc],
                n_g8, 2, 16)
            # DC lane map: cdc[8g+m, 4p + 2by + bx] over its 4x4 patch
            dcc = jnp.repeat(cdc[:, 4 * p:4 * p + 4]
                             .reshape(n_g8, 8, 2, 2)
                             .transpose(0, 2, 1, 3), 4, axis=3)
            dcc = jnp.repeat(dcc.reshape(n_g8, 2, 64), 4, axis=1)
            res_c.append((ct + dcc + 32) >> 6)
        return res_l, tuple(res_c)

    scatter_id = jnp.where(valid & (b < 24), mb * 24 + b, n_mb * 24)
    buf, _ = scatter_present(scatter_id, bf_e, n_mb * 24, jnp.int32)
    dc = jnp.concatenate([dc_l, cdc], axis=1)            # (nMB, 24)
    residual = (buf.reshape(n_mb, 24, 16)
                + dc[:, :, None] + 32) >> 6
    return mb_residual_planes(residual)
