"""Whole-frame reconstruction: residual + inter MC + intra prediction + PCM.

Orchestrates the per-frame phase passes that replace the reference's
per-macroblock interleaved loop (h264bsd_slice_data.c:131-220 driving
h264bsdDecodeMacroblock macroblock_layer.c:965-1131):

  1. batched dequant+IDCT                     (ops.transform, parallel)
  2. motion compensation for inter/skip MBs   (ops.inter, parallel)
  3. prediction+residual+clip combine         (image.c:172 semantics)
  4. I_PCM raw-sample scatter                 (macroblock_layer.c:992-1022)
  5. sequential intra pass                    (ops.intra, wavefront-bound)

The output planes are the pre-deblocking picture, bit-exact with the
reference's currImage before h264bsdFilterPicture.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .inter import inter_predict_frame
from .intra import intra_pass
from .transform import mb_residual_planes, residual_transform


def mb_grid_to_plane(mbs, width_mbs, height_mbs):
    """(nMB, S, S) -> (height_mbs*S, width_mbs*S)."""
    s = mbs.shape[-1]
    x = mbs.reshape(height_mbs, width_mbs, s, s).transpose(0, 2, 1, 3)
    return x.reshape(height_mbs * s, width_mbs * s)


def plane_to_mb_grid(plane, size):
    h, w = plane.shape
    x = plane.reshape(h // size, size, w // size, size).transpose(0, 2, 1, 3)
    return x.reshape(-1, size, size)


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs"))
def reconstruct_frame(tensors, dpb_y, dpb_cb, dpb_cr, width_mbs, height_mbs):
    """Reconstruct the pre-deblock picture from host tensors + device DPB.

    tensors: dict of jnp arrays (see frontend binding _TENSORS) plus
    pcm_y (nMB,16,16)/pcm_cb/pcm_cr (nMB,8,8) uint8 raw I_PCM samples
    (zeros when absent). Returns (y, cb, cr) uint8 planes.
    """
    t = tensors
    mb_class = t["mb_class"].astype(jnp.int32)
    n_mb = mb_class.shape[0]

    res, _ = residual_transform(
        t["coeff"].astype(jnp.int32), t["luma_dc"].astype(jnp.int32),
        t["chroma_dc"].astype(jnp.int32), t["qp_y"].astype(jnp.int32),
        t["chroma_qp_offset"].astype(jnp.int32), t["nnz"].astype(jnp.int32),
        t["nnz_dc"].astype(jnp.int32), mb_class == 4)
    res_l, res_c = mb_residual_planes(res)

    pred_y, pred_cb, pred_cr = inter_predict_frame(
        dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
        t["ref_slot"].astype(jnp.int32), width_mbs, height_mbs)

    inter_mask = (mb_class == 1) | (mb_class == 2)
    pcm_mask = mb_class == 5
    mb_y = jnp.where(inter_mask[:, None, None],
                     jnp.clip(pred_y + res_l, 0, 255), 0).astype(jnp.uint8)
    mb_cb = jnp.where(inter_mask[:, None, None],
                      jnp.clip(pred_cb + res_c[:, 0], 0, 255), 0)
    mb_cr = jnp.where(inter_mask[:, None, None],
                      jnp.clip(pred_cr + res_c[:, 1], 0, 255), 0)
    # I_PCM raw samples land before the intra pass: intra neighbours may
    # predict from PCM pels (macroblock_layer.c:992-1022 writes them inline)
    mb_y = jnp.where(pcm_mask[:, None, None], t["pcm_y"], mb_y)
    mb_cb = jnp.where(pcm_mask[:, None, None], t["pcm_cb"], mb_cb)
    mb_cr = jnp.where(pcm_mask[:, None, None], t["pcm_cr"], mb_cr)

    y = mb_grid_to_plane(mb_y, width_mbs, height_mbs)
    cb = mb_grid_to_plane(mb_cb.astype(jnp.uint8), width_mbs, height_mbs)
    cr = mb_grid_to_plane(mb_cr.astype(jnp.uint8), width_mbs, height_mbs)

    y, cb, cr = intra_pass(
        y, cb, cr, mb_class, t["i4_modes"].astype(jnp.int32),
        t["i4_avail"].astype(jnp.int32), t["mb_avail"].astype(jnp.int32),
        t["i16_mode"].astype(jnp.int32), t["chroma_mode"].astype(jnp.int32),
        res_l, res_c, width_mbs)
    return y, cb, cr


def build_pcm_tensors(n_mbs, ipcm_mb, ipcm_data):
    """Host-side: densify the sparse I_PCM list (mb indices + 384-byte blobs)
    into (nMB,16,16)/(nMB,8,8) uint8 arrays for reconstruct_frame."""
    pcm_y = np.zeros((n_mbs, 16, 16), np.uint8)
    pcm_cb = np.zeros((n_mbs, 8, 8), np.uint8)
    pcm_cr = np.zeros((n_mbs, 8, 8), np.uint8)
    for i, mb in enumerate(np.asarray(ipcm_mb)):
        blob = np.asarray(ipcm_data[i], np.uint8)
        pcm_y[mb] = blob[:256].reshape(16, 16)
        pcm_cb[mb] = blob[256:320].reshape(8, 8)
        pcm_cr[mb] = blob[320:].reshape(8, 8)
    return pcm_y, pcm_cb, pcm_cr


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs",
                                   "intra_wavefront", "mc_pallas",
                                   "intra_pallas", "luma_rowtile",
                                   "interpret"))
def reconstruct_frame_fast(packed, slice_table, sparse_ids, sparse_levels,
                           mv_exc_ids, mv_exc_payload, intra_mbs,
                           intra_payload, pcm_y, pcm_cb, pcm_cr,
                           dpb_y, dpb_cb, dpb_cr,
                           width_mbs, height_mbs, intra_wavefront=False,
                           used_slots=None, mc_pallas=False,
                           intra_pallas=False, slice_ids=None,
                           luma_rowtile=False, interpret=False):
    """Transfer-optimized variant: unpack the single metadata buffer and the
    sparse residual stream on device, then run the same phase passes. The
    intra stage either iterates the (padded) intra-MB list (sparse intra,
    typical P frames) or runs the anti-diagonal wavefront (intra-heavy
    frames), chosen statically by the caller. With mc_pallas the motion
    compensation runs as the Pallas window kernels (ops.pallas_mc; the
    referenced DPB slots must be listed in used_slots); otherwise the XLA
    gather path (ops.inter)."""
    from .intra import intra_pass_list, intra_pass_wavefront
    from .transform import residual_planes_sparse
    from .unpack import unpack_meta

    if luma_rowtile and not (mc_pallas and intra_pallas
                             and not intra_wavefront
                             and width_mbs % 8 == 0):
        raise ValueError("luma_rowtile requires the Pallas MC + list-"
                         "intra path and width_mbs % 8 == 0")

    n_mb = width_mbs * height_mbs
    t = unpack_meta(packed, slice_table, mv_exc_ids, mv_exc_payload,
                    intra_mbs, intra_payload, n_mb, slice_ids,
                    sparse_ids=sparse_ids)
    mb_class = t["mb_class"].astype(jnp.int32)

    # sparse-domain dequant+IDCT: only the non-empty blocks are
    # transformed (a few percent of the frame) instead of a dense
    # (nMB, 24, 16) pass
    res_l, res_c = residual_planes_sparse(
        sparse_ids.reshape(-1).astype(jnp.int32),
        sparse_levels.astype(jnp.int32), t["qp_y"].astype(jnp.int32),
        t["chroma_qp_offset"].astype(jnp.int32),
        t["nnz_dc"].astype(jnp.int32), mb_class == 4, n_mb,
        luma_rowtile=luma_rowtile)

    if mc_pallas:
        from .pallas_mc import mc_predict_grids
        pred_y, pred_cb, pred_cr = mc_predict_grids(
            dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
            t["ref_slot"].astype(jnp.int32),
            mv_exc_ids.reshape(-1).astype(jnp.int32), used_slots,
            width_mbs, height_mbs, interpret=interpret,
            luma_rowtile=luma_rowtile)
        pred_y = pred_y.astype(jnp.int32)
        pred_cb = pred_cb.astype(jnp.int32)
        pred_cr = pred_cr.astype(jnp.int32)
    else:
        pred_y, pred_cb, pred_cr = inter_predict_frame(
            dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
            t["ref_slot"].astype(jnp.int32), width_mbs, height_mbs)

    inter_mask = (mb_class == 1) | (mb_class == 2)
    pcm_mask = mb_class == 5
    if luma_rowtile:
        # luma combine in rowtile layout: per-MB masks become 16-lane
        # bands, clip+merge runs on the plane-chunk tiles, and ONE
        # major-dim reshape (no minor-dim relayout at all) yields the
        # plane. pcm_y arrives pre-laid-out in rowtile by the caller.
        n_g8 = n_mb // 8
        inter_l = jnp.repeat(inter_mask.reshape(n_g8, 8), 16,
                             axis=1)[:, None, :]
        pcm_l = jnp.repeat(pcm_mask.reshape(n_g8, 8), 16,
                           axis=1)[:, None, :]
        y_rt = jnp.where(inter_l,
                         jnp.clip(pred_y + res_l, 0, 255),
                         0).astype(jnp.uint8)
        y_rt = jnp.where(pcm_l, pcm_y, y_rt)
        y = y_rt.reshape(height_mbs, width_mbs // 8, 16, 128) \
            .transpose(0, 2, 1, 3) \
            .reshape(height_mbs * 16, width_mbs * 16)
        # chroma in the 64-lane half-chunk tiles (pcm_cb/pcm_cr arrive
        # pre-laid-out by the caller, like pcm_y)
        inter_c = jnp.repeat(inter_mask.reshape(n_g8, 8), 8,
                             axis=1)[:, None, :]
        pcm_c = jnp.repeat(pcm_mask.reshape(n_g8, 8), 8,
                           axis=1)[:, None, :]
        cb, cr = [
            jnp.where(pcm_c, pcm_p,
                      jnp.where(inter_c, jnp.clip(pred_p + res_p, 0, 255),
                                0).astype(jnp.uint8))
            .reshape(height_mbs, width_mbs // 8, 8, 64)
            .transpose(0, 2, 1, 3)
            .reshape(height_mbs * 8, width_mbs * 8)
            for pred_p, res_p, pcm_p in
            ((pred_cb, res_c[0], pcm_cb), (pred_cr, res_c[1], pcm_cr))]
    else:
        mb_y = jnp.where(inter_mask[:, None, None],
                         jnp.clip(pred_y + res_l, 0, 255),
                         0).astype(jnp.uint8)
        mb_y = jnp.where(pcm_mask[:, None, None], pcm_y, mb_y)
        y = mb_grid_to_plane(mb_y, width_mbs, height_mbs)
        mb_cb = jnp.where(inter_mask[:, None, None],
                          jnp.clip(pred_cb + res_c[:, 0], 0, 255), 0)
        mb_cr = jnp.where(inter_mask[:, None, None],
                          jnp.clip(pred_cr + res_c[:, 1], 0, 255), 0)
        mb_cb = jnp.where(pcm_mask[:, None, None], pcm_cb, mb_cb)
        mb_cr = jnp.where(pcm_mask[:, None, None], pcm_cr, mb_cr)

        cb = mb_grid_to_plane(mb_cb.astype(jnp.uint8), width_mbs,
                              height_mbs)
        cr = mb_grid_to_plane(mb_cr.astype(jnp.uint8), width_mbs,
                              height_mbs)

    intra_args = (mb_class, t["i4_modes"].astype(jnp.int32),
                  t["i4_avail"].astype(jnp.int32),
                  t["mb_avail"].astype(jnp.int32),
                  t["i16_mode"].astype(jnp.int32),
                  t["chroma_mode"].astype(jnp.int32), res_l, res_c)
    if intra_pallas and intra_wavefront:
        # intra-heavy frames: the wavefront-batched kernel processes G
        # same-anti-diagonal MBs per step (the raster kernel's 8160
        # sequential MB bodies cost ~29 ms on a 1080p I frame)
        from .pallas_intra_wf import intra_pass_wavefront_pallas
        y, cb, cr = intra_pass_wavefront_pallas(
            y, cb, cr, *intra_args, width_mbs, height_mbs,
            interpret=interpret)
    elif intra_pallas:
        from .pallas_intra import intra_pass_pallas
        # the sparse intra-MB list bounds the kernel's sequential walk
        y, cb, cr = intra_pass_pallas(
            y, cb, cr, *intra_args, width_mbs, height_mbs,
            interpret=interpret,
            intra_ids=intra_mbs.reshape(-1).astype(jnp.int32))
    elif intra_wavefront:
        y, cb, cr = intra_pass_wavefront(y, cb, cr, *intra_args,
                                         width_mbs, height_mbs)
    else:
        y, cb, cr = intra_pass_list(y, cb, cr, intra_mbs.astype(jnp.int32),
                                    *intra_args, width_mbs)
    return y, cb, cr, t
