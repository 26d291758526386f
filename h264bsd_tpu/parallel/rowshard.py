"""MB-row sharding of one frame across a device mesh axis, with real halo
exchange — SURVEY.md §2.4's tensor/context-parallel analogue.

Each device owns a contiguous stripe of MB rows. The frame step becomes:

  phase A (fully parallel): residual dequant+IDCT, motion compensation
    against the replicated DPB (stencil reach handled by reading whole
    reference planes; MB coordinates offset per stripe), pred+residual
    combine, I_PCM scatter — per-MB work with no cross-stripe dependency.

  phase B (intra pipeline): H.264 intra prediction reads *reconstructed*
    pels of the left/above neighbours (reference
    h264bsd_intra_prediction.c:501, :723-829), so stripe k needs the
    bottom pel row of stripe k-1 after its intra pass. The stripes form a
    software pipeline: at step k stripe k runs its intra pass with a halo
    of ONE luma + two chroma boundary pel rows ppermuted down the mesh
    axis (lax.ppermute) at step k-1.

  phase C (deblock pipeline): the in-loop filter's top-edge kernels read
    4 luma / 2 chroma rows across the MB edge and write 3 / 1 of them
    (reference FilterVerLumaEdge h264bsd_deblocking.c:687-759,
    FilterHorChromaEdge :1036). Stripe k therefore receives a
    4-luma/2-chroma-row halo of stripe k-1's *filtered* bottom rows,
    filters its stripe extended by one dummy MB row that carries the halo
    and the real above-row metadata (so boundary strengths and averaged-QP
    thresholds across the stripe edge are exact,
    GetBoundaryStrengths :1187-1379 / GetLumaEdgeThresholds :1420), and
    finally ppermutes the 3 luma + 1 chroma rows it modified *back up* to
    patch stripe k-1.

The pipelines serialize stripes within one frame — inherent to H.264's
raster decode order — but every stripe's phase-A work (the bulk of the
FLOPs) runs concurrently, and across frames the stripes overlap
wavefront-style. The step's output frame is assembled from the stripe
results by an all_gather along the axis (the DPB handoff collective) and
stored into every device's DPB replica.

Bit-exactness vs the single-device step is pinned by
tests/test_rowshard.py on a virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.deblock import (boundary_strengths, deblock_frame_with_bs,
                           edge_thresholds)
from ..ops.inter import inter_predict_frame
from ..ops.intra import intra_pass
from ..ops.reconstruct import mb_grid_to_plane
from ..ops.transform import mb_residual_planes, residual_transform

# per-MB metadata the deblocking filter needs from the stripe above
_DEBLOCK_FIELDS = ("mb_class", "nnz", "mv", "ref_slot", "slice_id",
                   "disable_dblk", "qp_y", "filter_off_a", "filter_off_b",
                   "chroma_qp_offset")


def _ext0(x, width_mbs):
    """Prepend one zeroed MB row to a per-MB tensor."""
    return jnp.concatenate(
        [jnp.zeros((width_mbs,) + x.shape[1:], x.dtype), x], axis=0)


def _stripe_step(t, dpb_y, dpb_cb, dpb_cr, slot, *, width_mbs, stripe_rows,
                 n_row, axis):
    pid = lax.axis_index(axis)
    W = width_mbs * 16
    Wc = W // 2
    down = [(i, i + 1) for i in range(n_row - 1)]

    mb_class = t["mb_class"].astype(jnp.int32)

    # ---- phase A: residual + MC + combine (parallel across stripes) ----
    res, _ = residual_transform(
        t["coeff"].astype(jnp.int32), t["luma_dc"].astype(jnp.int32),
        t["chroma_dc"].astype(jnp.int32), t["qp_y"].astype(jnp.int32),
        t["chroma_qp_offset"].astype(jnp.int32), t["nnz"].astype(jnp.int32),
        t["nnz_dc"].astype(jnp.int32), mb_class == 4)
    res_l, res_c = mb_residual_planes(res)

    pred_y, pred_cb, pred_cr = inter_predict_frame(
        dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
        t["ref_slot"].astype(jnp.int32), width_mbs, stripe_rows,
        mb_row_offset=pid * stripe_rows)

    inter_mask = (mb_class == 1) | (mb_class == 2)
    pcm_mask = mb_class == 5
    mb_y = jnp.where(inter_mask[:, None, None],
                     jnp.clip(pred_y + res_l, 0, 255), 0).astype(jnp.uint8)
    mb_cb = jnp.where(inter_mask[:, None, None],
                      jnp.clip(pred_cb + res_c[:, 0], 0, 255), 0)
    mb_cr = jnp.where(inter_mask[:, None, None],
                      jnp.clip(pred_cr + res_c[:, 1], 0, 255), 0)
    mb_y = jnp.where(pcm_mask[:, None, None], t["pcm_y"], mb_y)
    mb_cb = jnp.where(pcm_mask[:, None, None], t["pcm_cb"], mb_cb)
    mb_cr = jnp.where(pcm_mask[:, None, None], t["pcm_cr"], mb_cr)

    y = mb_grid_to_plane(mb_y, width_mbs, stripe_rows)
    cb = mb_grid_to_plane(mb_cb.astype(jnp.uint8), width_mbs, stripe_rows)
    cr = mb_grid_to_plane(mb_cr.astype(jnp.uint8), width_mbs, stripe_rows)

    # ---- phase B: intra pipeline over stripes ----
    # The stripe is extended by one dummy MB row whose bottom pel row
    # carries the halo; the dummy row's mb_class is 0 so the pass never
    # writes it. For stripe 0 the halo stays zero and every read of it is
    # gated off by the host-computed availability flags (frame row 0 has
    # no above neighbour).
    i_class = _ext0(mb_class, width_mbs)
    i4m = _ext0(t["i4_modes"].astype(jnp.int32), width_mbs)
    i4a = _ext0(t["i4_avail"].astype(jnp.int32), width_mbs)
    mba = _ext0(t["mb_avail"].astype(jnp.int32), width_mbs)
    i16 = _ext0(t["i16_mode"].astype(jnp.int32), width_mbs)
    cmode = _ext0(t["chroma_mode"].astype(jnp.int32), width_mbs)
    rl_e = _ext0(res_l, width_mbs)
    rc_e = _ext0(res_c, width_mbs)

    y_e = jnp.concatenate([jnp.zeros((16, W), jnp.uint8), y], axis=0)
    cb_e = jnp.concatenate([jnp.zeros((8, Wc), jnp.uint8), cb], axis=0)
    cr_e = jnp.concatenate([jnp.zeros((8, Wc), jnp.uint8), cr], axis=0)
    halo = (jnp.zeros((W,), jnp.uint8), jnp.zeros((Wc,), jnp.uint8),
            jnp.zeros((Wc,), jnp.uint8))
    for k in range(n_row):
        y2, cb2, cr2 = intra_pass(
            y_e.at[15].set(halo[0]), cb_e.at[7].set(halo[1]),
            cr_e.at[7].set(halo[2]), i_class, i4m, i4a, mba, i16, cmode,
            rl_e, rc_e, width_mbs)
        act = pid == k
        y_e = jnp.where(act, y2, y_e)
        cb_e = jnp.where(act, cb2, cb_e)
        cr_e = jnp.where(act, cr2, cr_e)
        if k < n_row - 1:
            halo = tuple(lax.ppermute(h, axis, down)
                         for h in (y_e[-1], cb_e[-1], cr_e[-1]))
    y, cb, cr = y_e[16:], cb_e[8:], cr_e[8:]

    # ---- phase C: deblock pipeline over stripes ----
    # Extension MB row carries the REAL metadata of the stripe above
    # (ppermuted once, in parallel) with deblocking disabled, so the
    # extension's own edges have bS 0 while the stripe-boundary edge gets
    # exact bS and averaged-QP thresholds.
    above = {f: lax.ppermute(t[f][-width_mbs:], axis, down)
             for f in _DEBLOCK_FIELDS}
    above["disable_dblk"] = jnp.ones_like(above["disable_dblk"])
    ext = {f: jnp.concatenate([above[f], t[f]], axis=0)
           for f in _DEBLOCK_FIELDS}

    bs_left, bs_top = boundary_strengths(
        ext["mb_class"].astype(jnp.int32), ext["nnz"].astype(jnp.int32),
        ext["mv"].astype(jnp.int32), ext["ref_slot"].astype(jnp.int32),
        ext["slice_id"].astype(jnp.int32),
        ext["disable_dblk"].astype(jnp.int32), width_mbs, stripe_rows + 1)
    # stripe 0's first real MB row is the picture's top row: no top edge
    # (GetMbFilteringFlags deblocking.c:280 — picture border), but in the
    # extended grid it sits at row 1 where `row > 0` holds. Zero it.
    n_ext_mb = (stripe_rows + 1) * width_mbs
    first_real = jnp.arange(n_ext_mb) // width_mbs == 1
    kill = (pid == 0) & first_real
    bs_top = jnp.where(kill[:, None] & (jnp.arange(16)[None, :] < 4),
                       0, bs_top)
    l_thr = edge_thresholds(
        ext["qp_y"], ext["slice_id"], ext["filter_off_a"],
        ext["filter_off_b"], ext["chroma_qp_offset"], width_mbs,
        stripe_rows + 1, chroma=False)
    c_thr = edge_thresholds(
        ext["qp_y"], ext["slice_id"], ext["filter_off_a"],
        ext["filter_off_b"], ext["chroma_qp_offset"], width_mbs,
        stripe_rows + 1, chroma=True)

    y_e = jnp.concatenate([jnp.zeros((16, W), jnp.uint8), y], axis=0)
    cb_e = jnp.concatenate([jnp.zeros((8, Wc), jnp.uint8), cb], axis=0)
    cr_e = jnp.concatenate([jnp.zeros((8, Wc), jnp.uint8), cr], axis=0)
    halo4 = (jnp.zeros((4, W), jnp.uint8), jnp.zeros((2, Wc), jnp.uint8),
             jnp.zeros((2, Wc), jnp.uint8))
    patch = (jnp.zeros((3, W), jnp.uint8), jnp.zeros((1, Wc), jnp.uint8),
             jnp.zeros((1, Wc), jnp.uint8))
    for k in range(n_row):
        y2, cb2, cr2 = deblock_frame_with_bs(
            lax.dynamic_update_slice(y_e, halo4[0], (12, 0)),
            lax.dynamic_update_slice(cb_e, halo4[1], (6, 0)),
            lax.dynamic_update_slice(cr_e, halo4[2], (6, 0)),
            bs_left, bs_top, l_thr, c_thr, width_mbs, stripe_rows + 1)
        act = pid == k
        y_e = jnp.where(act, y2, y_e)
        cb_e = jnp.where(act, cb2, cb_e)
        cr_e = jnp.where(act, cr2, cr_e)
        # rows the boundary filter wrote INTO the halo (stripe k-1's
        # bottom 3 luma / 1 chroma rows)
        patch = (jnp.where(act, y2[13:16], patch[0]),
                 jnp.where(act, cb2[7:8], patch[1]),
                 jnp.where(act, cr2[7:8], patch[2]))
        if k < n_row - 1:
            halo4 = tuple(lax.ppermute(h, axis, down)
                          for h in (y_e[-4:], cb_e[-2:], cr_e[-2:]))
    y, cb, cr = y_e[16:], cb_e[8:], cr_e[8:]

    # patch stripe k-1's bottom rows with what stripe k's boundary filter
    # wrote (reverse ppermute up the axis)
    up = [(i, i - 1) for i in range(1, n_row)]
    pu = tuple(lax.ppermute(p, axis, up) for p in patch)
    has_patch = pid < n_row - 1
    y = jnp.where(has_patch, lax.dynamic_update_slice(
        y, pu[0], (stripe_rows * 16 - 3, 0)), y)
    cb = jnp.where(has_patch, lax.dynamic_update_slice(
        cb, pu[1], (stripe_rows * 8 - 1, 0)), cb)
    cr = jnp.where(has_patch, lax.dynamic_update_slice(
        cr, pu[2], (stripe_rows * 8 - 1, 0)), cr)

    # ---- DPB handoff: assemble the frame FROM the stripe results ----
    frame_y = lax.all_gather(y, axis, axis=0, tiled=True)
    frame_cb = lax.all_gather(cb, axis, axis=0, tiled=True)
    frame_cr = lax.all_gather(cr, axis, axis=0, tiled=True)
    return (dpb_y.at[slot].set(frame_y), dpb_cb.at[slot].set(frame_cb),
            dpb_cr.at[slot].set(frame_cr))


def make_row_sharded_step(mesh, axis, width_mbs, height_mbs):
    """Build the jitted row-sharded frame step for a mesh axis.

    Returns fn(tensors, dpb_y, dpb_cb, dpb_cr, slot) -> new DPB (replicated
    on the axis). `tensors` is the dense per-MB dict (frontend
    FrontendDecoder.tensors plus pcm_y/pcm_cb/pcm_cr); height_mbs must be
    divisible by the axis size.
    """
    n_row = mesh.shape[axis]
    if height_mbs % n_row:
        raise ValueError(f"height_mbs={height_mbs} not divisible by "
                         f"axis {axis!r} size {n_row}")
    stripe_rows = height_mbs // n_row

    body = partial(_stripe_step, width_mbs=width_mbs,
                   stripe_rows=stripe_rows, n_row=n_row, axis=axis)
    t_spec = P(axis)     # shard the per-MB leading axis into row stripes
    rep = P()            # DPB and slot replicated along the axis
    # t_spec is a pytree prefix: it applies to every leaf of the dict
    fn = shard_map(body, mesh=mesh,
                   in_specs=(t_spec, rep, rep, rep, rep),
                   out_specs=(rep, rep, rep), check_vma=False)
    return jax.jit(fn)


def make_batched_row_sharded_step(mesh, stream_axis, row_axis, width_mbs,
                                  height_mbs):
    """2D variant: a batch of independent streams sharded over
    `stream_axis` (data parallel), each frame's MB rows sharded over
    `row_axis` with the halo pipelines of make_row_sharded_step.

    fn(tensors, dpb_y, dpb_cb, dpb_cr, slots) with tensors (B, nMB, ...),
    DPB (B, nSlots, ...), slots (B,); B divisible by the stream axis,
    height_mbs by the row axis.
    """
    n_row = mesh.shape[row_axis]
    if height_mbs % n_row:
        raise ValueError(f"height_mbs={height_mbs} not divisible by "
                         f"axis {row_axis!r} size {n_row}")
    stripe_rows = height_mbs // n_row
    body = partial(_stripe_step, width_mbs=width_mbs,
                   stripe_rows=stripe_rows, n_row=n_row, axis=row_axis)

    def batched(t, dpb_y, dpb_cb, dpb_cr, slots):
        return jax.vmap(body)(t, dpb_y, dpb_cb, dpb_cr, slots)

    t_spec = P(stream_axis, row_axis)   # (batch, MB) leading axes
    d_spec = P(stream_axis)             # DPB replicated along rows
    fn = shard_map(batched, mesh=mesh,
                   in_specs=(t_spec, d_spec, d_spec, d_spec, d_spec),
                   out_specs=(d_spec, d_spec, d_spec), check_vma=False)
    return jax.jit(fn)
