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
FLOPs) runs concurrently, and in phases B/C only the ACTIVE stripe
computes at each pipeline step (lax.cond; the others wait at the halo
collective), so per-frame intra/deblock compute is one stripe pass per
device rather than n_row masked full passes.

MEASURED LIMIT (round 4, pinned-core methodology — SCALING_r04.json):
this axis is LATENCY-BOUND BY DESIGN. With host compute scaled 1:1 with
the device count, per-frame efficiency is 0.36 at 2 shards and 0.13 at
4: the B/C pipelines cost n_row sequential stripe passes of wall clock
per frame, and at the bench's small frames phase A is a minority of the
step. Cross-frame wavefront overlap (stripe k of frame f concurrent
with stripe k+1 of frame f-1 — legal because vertical MV reach is
bounded by ~8 MB rows, less than a stripe) would recover throughput but
turns the step into a multi-frame pipelined scan with per-stripe DPB
row propagation. ROUND-5 DESIGN DECISION: that overlap is deliberately
NOT implemented and this axis is formally scoped as a LATENCY/MEMORY
tool — the gop/multistream axes (0.84-0.90+ efficiency, same
artifact) are the throughput answer, and real streams give them
closed GOPs every few dozen frames; the overlap machinery would buy
throughput those axes already deliver at a fraction of the
complexity. See README "Scaling-axis guidance". The step stays fully
tested and bit-exact. The step's output frame is assembled from the
stripe results by an all_gather along the axis (the DPB handoff
collective) and stored into every device's DPB replica.

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
    """Dense-tensor stripe step: dequant+IDCT on the stripe's dense
    coefficients, then the shared stripe phases."""
    mb_class = t["mb_class"].astype(jnp.int32)
    res, _ = residual_transform(
        t["coeff"].astype(jnp.int32), t["luma_dc"].astype(jnp.int32),
        t["chroma_dc"].astype(jnp.int32), t["qp_y"].astype(jnp.int32),
        t["chroma_qp_offset"].astype(jnp.int32), t["nnz"].astype(jnp.int32),
        t["nnz_dc"].astype(jnp.int32), mb_class == 4)
    res_l, res_c = mb_residual_planes(res)
    return _stripe_phases(t, res_l, res_c, dpb_y, dpb_cb, dpb_cr, slot,
                          width_mbs=width_mbs, stripe_rows=stripe_rows,
                          n_row=n_row, axis=axis)


def _stripe_phases(t, res_l, res_c, dpb_y, dpb_cb, dpb_cr, slot, *,
                   width_mbs, stripe_rows, n_row, axis, mc_pallas=False,
                   deblock_pallas=False, used_slots=None, exc_ids=None,
                   interpret=False):
    """Phases A(MC/combine)/B(intra)/C(deblock) of one stripe, residual
    planes precomputed by the caller (dense path: residual_transform;
    blob path: residual_planes_sparse).

    mc_pallas/deblock_pallas put the PRODUCTION Pallas kernels on the
    stripe phases (ops.pallas_mc with mb_row_offset, ops.pallas_intra on
    the halo-extended stripe, ops.pallas_deblock_wf on the externally
    adjusted stripe boundary strengths); the XLA formulations remain the
    default for non-TPU meshes. mc_pallas additionally needs used_slots
    (the referenced DPB slots, padded by repetition) and exc_ids (the
    frame-global quad exception ids) rebased per stripe."""
    pid = lax.axis_index(axis)
    W = width_mbs * 16
    Wc = W // 2
    down = [(i, i + 1) for i in range(n_row - 1)]
    n_stripe = stripe_rows * width_mbs

    mb_class = t["mb_class"].astype(jnp.int32)

    # ---- phase A: MC + combine (parallel across stripes) ----
    if mc_pallas:
        from ..ops.pallas_mc import mc_predict_grids
        # rebase the frame-global quad exception ids onto this stripe
        # (entries outside the stripe become padding)
        base_q = pid * n_stripe * 4
        local = exc_ids.astype(jnp.int32) - base_q
        local = jnp.where((local >= 0) & (local < n_stripe * 4), local,
                          n_stripe * 4)
        pred_y, pred_cb, pred_cr = mc_predict_grids(
            dpb_y, dpb_cb, dpb_cr, t["mv"].astype(jnp.int32),
            t["ref_slot"].astype(jnp.int32), local, used_slots,
            width_mbs, stripe_rows, interpret=interpret,
            mb_row_offset=pid * stripe_rows)
        pred_y = pred_y.astype(jnp.int32)
        pred_cb = pred_cb.astype(jnp.int32)
        pred_cr = pred_cr.astype(jnp.int32)
    else:
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
    def _intra_active(args):
        ye, cbe, cre, h = args
        planes = (ye.at[15].set(h[0]), cbe.at[7].set(h[1]),
                  cre.at[7].set(h[2]))
        if deblock_pallas:
            from ..ops.pallas_intra import intra_pass_pallas
            return intra_pass_pallas(
                *planes, i_class, i4m, i4a, mba, i16, cmode, rl_e, rc_e,
                width_mbs, stripe_rows + 1, intra_ids=None,
                interpret=interpret)
        return intra_pass(*planes, i_class, i4m, i4a, mba, i16, cmode,
                          rl_e, rc_e, width_mbs)

    for k in range(n_row):
        # only the active stripe runs the pass (lax.cond, not a masked
        # full recompute): per-frame intra cost is one stripe pass per
        # device, not n_row of them — the inactive devices just wait at
        # the halo collective
        y_e, cb_e, cr_e = lax.cond(
            pid == k, _intra_active, lambda a: a[:3],
            (y_e, cb_e, cr_e, halo))
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
    def _deblock_active(args):
        ye, cbe, cre, _patch, h4 = args
        planes = (lax.dynamic_update_slice(ye, h4[0], (12, 0)),
                  lax.dynamic_update_slice(cbe, h4[1], (6, 0)),
                  lax.dynamic_update_slice(cre, h4[2], (6, 0)))
        if deblock_pallas:
            from ..ops.pallas_deblock_wf import \
                deblock_frame_wavefront_from_bs
            y2, cb2, cr2 = deblock_frame_wavefront_from_bs(
                *planes, bs_left, bs_top, *l_thr, *c_thr, width_mbs,
                stripe_rows + 1, interpret=interpret)
        else:
            y2, cb2, cr2 = deblock_frame_with_bs(
                *planes, bs_left, bs_top, l_thr, c_thr, width_mbs,
                stripe_rows + 1)
        # rows the boundary filter wrote INTO the halo (stripe k-1's
        # bottom 3 luma / 1 chroma rows)
        return y2, cb2, cr2, (y2[13:16], cb2[7:8], cr2[7:8])

    for k in range(n_row):
        # as in phase B, only the active stripe filters (lax.cond)
        y_e, cb_e, cr_e, patch = lax.cond(
            pid == k, _deblock_active, lambda a: a[:4],
            (y_e, cb_e, cr_e, patch, halo4))
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


def make_row_sharded_blob_step(mesh, axis, width_mbs, height_mbs, caps,
                               mc_pallas=False, deblock_pallas=False,
                               interpret=False):
    """Row-sharded step that consumes the PRODUCTION transfer format: the
    single tier-padded blob built by the C++ front-end (the same buffer
    the single-chip fast path ships — FrameTensors::build_blob), unpacked
    on device (ops.unpack) with the sparse-domain residual transform
    (ops.transform.residual_planes_sparse), then the stripe MC/intra/
    deblock pipelines with halo exchange. This is what a multi-chip
    deployment would actually run: one ~100 KB blob replicated to the
    mesh instead of ~9 MB of dense host tensors.

    Unpack and the (sparse, few-percent-density) residual transform run
    replicated on every device — they are a rounding error next to the
    pixel phases; each device then slices its stripe of the per-MB
    tensors. With mc_pallas/deblock_pallas the stripe phases run the
    PRODUCTION Pallas kernels (per-stripe variants: MC with
    mb_row_offset, intra on the halo-extended stripe, deblock on the
    externally adjusted stripe boundary strengths); the XLA paths remain
    the default for non-TPU meshes and are bit-exact with the kernels by
    tests/test_pallas*.

    Returns fn(blob, pcm_y, pcm_cb, pcm_cr, dpb_y, dpb_cb, dpb_cr, slot,
    used_slots) -> new replicated DPB (used_slots: the referenced DPB
    slots, padded by repetition — Decoder._prepare's used_slots; only
    consumed by the Pallas MC). Bit-exactness vs the single-chip fast
    step is pinned by tests/test_rowshard.py::test_rowshard_blob_step.
    """
    n_row = mesh.shape[axis]
    if height_mbs % n_row:
        raise ValueError(f"height_mbs={height_mbs} not divisible by "
                         f"axis {axis!r} size {n_row}")
    stripe_rows = height_mbs // n_row
    n_mbs = width_mbs * height_mbs
    n_stripe = stripe_rows * width_mbs

    def body(blob, pcm_y, pcm_cb, pcm_cr, dpb_y, dpb_cb, dpb_cr, slot,
             used_slots):
        from ..ops.transform import residual_planes_sparse
        from ..ops.unpack import unpack_blob, unpack_meta

        (packed, stab, sp_ids, sp_lv, eids, epay, imbs, ipay,
         sids) = unpack_blob(blob, n_mbs, *caps)
        tf = unpack_meta(packed, stab, eids, epay, imbs, ipay, n_mbs,
                         sids, sparse_ids=sp_ids)
        mb_class_full = tf["mb_class"].astype(jnp.int32)
        rl_full, rc_full = residual_planes_sparse(
            sp_ids.reshape(-1).astype(jnp.int32), sp_lv.astype(jnp.int32),
            tf["qp_y"].astype(jnp.int32),
            tf["chroma_qp_offset"].astype(jnp.int32),
            tf["nnz_dc"].astype(jnp.int32), mb_class_full == 4, n_mbs)

        pid = lax.axis_index(axis)
        base = pid * n_stripe
        cut = lambda x: lax.dynamic_slice_in_dim(x, base, n_stripe, 0)
        t = {k: cut(v) for k, v in tf.items()}
        t["pcm_y"], t["pcm_cb"], t["pcm_cr"] = (
            cut(pcm_y), cut(pcm_cb), cut(pcm_cr))
        return _stripe_phases(
            t, cut(rl_full), cut(rc_full), dpb_y, dpb_cb, dpb_cr, slot,
            width_mbs=width_mbs, stripe_rows=stripe_rows, n_row=n_row,
            axis=axis, mc_pallas=mc_pallas,
            deblock_pallas=deblock_pallas, used_slots=used_slots,
            exc_ids=eids.reshape(-1), interpret=interpret)

    rep = P()
    fn = shard_map(body, mesh=mesh, in_specs=(rep,) * 9,
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
