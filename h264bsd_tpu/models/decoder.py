"""Top-level TPU-native H.264 baseline decoder.

Public API mirrors the reference library surface (h264bsd_decoder.h:64-93):
decode one NAL per call, drain display-order output pictures, query stream
geometry, convert to RGBA/BGRA/YCbCrA. The bitstream front-end runs in C++
(h264bsd_tpu.frontend); everything pixel-related runs as jitted JAX passes
over whole frames with a device-resident DPB ring
(reconstruct -> conceal -> deblock -> store slot).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import binding as fe
from ..ops.deblock import deblock_frame
from ..ops.pallas_deblock_wf import deblock_frame_wavefront
from ..ops.reconstruct import (build_pcm_tensors, reconstruct_frame,
                               reconstruct_frame_fast)
from ..utils import golden

MC_REF_CAP = 4          # DPB slots resident in VMEM per Pallas MC pass
MC_REF_MAX = 16         # DPB reference maximum (h264bsd_cfg.h:44); frames
                        # referencing more than MC_REF_CAP slots run the
                        # kernels as merged multi-group passes
_MC_MODE = os.environ.get("H264TPU_MC", "auto")   # auto | pallas | xla
# rowtile (round 5): the round-4 2D-window scatter (serialized
# per-window loop on TPU, ~150 ms/frame) is re-expressed as unique-ROW
# scatters in the placement-id domain — each 4x4 block's (group,
# row-band, lane-slot) triple is unique, so one (nG*128, 16) row
# scatter plus a single int32 relayout
# (ops.unpack.rowtile_cell_scatter/rowtile_cells_to_tiles) replaces the
# window scatter. MEASURED OUTCOME (round 5, same-process A/B xplane
# traces on a 16-frame 1080p window): the fix removes the 14x
# catastrophe and the path is bit-exact on hardware (bench verify
# pass), but rowtile is perf-NEUTRAL at best — 8.4-8.7 ms/frame module
# time vs 8.3 for the MB-grid layouts. The relayouts it eliminates
# were already being fused/cheapened by XLA, while the placement-domain
# scatters pay ~40 ns/entry over cap-sized streams per plane domain.
# Default OFF on the measurement; H264TPU_ROWTILE=1 selects the tile
# layouts (kept tested: tests/test_rowtile.py incl. the randomized
# residual-parity sweep that caught the chroma group-stride bug).
_ROWTILE = os.environ.get("H264TPU_ROWTILE", "0") == "1"

# intra-MB count above which a frame runs the dense anti-diagonal
# wavefront intra pass instead of the padded-list pass. The list pass
# walks only the actual intra MBs (the raster/wavefront pass visits the
# whole grid), so scene-change P frames with ~1k intra MBs are much
# cheaper on the list path: on the bundled 1080p stream only the two
# IDRs exceed 2048, and keeping the other 15 intra-heavy frames in the
# P caps class also keeps them windowable (fewer scan flushes).
WF_THRESH = int(os.environ.get("H264TPU_WF_THRESH", "2048"))


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def tier(length, tiers):
    """Smallest tier >= length."""
    return next(c for c in tiers if c >= length)


def ladder(base, steps):
    """~1.5x tier ladder: on tunneled TPUs the host->device pipe is the
    stream's bottleneck, so transfer padding directly costs fps (a
    power-of-two ladder wastes ~30% of the blob on typical 1080p frames).
    Each new tier combo compiles once and is then cached. Shared by the
    single-stream and multistream paths so compiled shapes coincide."""
    out = []
    for i in range(steps):
        out += [base << i, (base << i) + (base << i >> 1)]
    return tuple(out)


def caps_from_counts(mx, n_mbs, wavefront):
    """Tier-select the transfer-blob section caps from raw per-class
    counts (FrontendDecoder.blob_counts order). One function shared by
    the sticky-caps path, caps pinning, and multistream so every path
    lands on identical compiled shapes."""
    sgl = tier(mx[0], ladder(2048, 8) + (max(n_mbs * 26, 2048),))
    sht = tier(mx[1], ladder(1024, 8) + (max(n_mbs * 26, 1024),))
    cap = tier(mx[2], ladder(512, 8) + (max(n_mbs * 26, 512),))
    wcap = tier(mx[3], (64, 1024, 16384, max(cap * 16, 64)))
    # exceptions are quad-grained (up to 4 per MB)
    ecap = tier(mx[4], ladder(256, 8) + (max(n_mbs * 4, 256),))
    scap = tier(mx[6], (32, max(n_mbs, 32)))
    icap = tier(mx[5], (512, 1024, 1536, 2048, 3072, n_mbs)
                if not wavefront else (n_mbs,))
    # dense per-MB slice ids travel only for multi-slice pictures;
    # rounded up to even so every later blob section stays 4-byte
    # aligned for the host-side u32/i32 writes (odd n_mbs pictures)
    sidcap = 0 if mx[6] <= 1 else (n_mbs + 1) & ~1
    return (sgl, sht, cap, wcap, ecap, icap, scap, sidcap)


# status re-exports (reference h264bsd_decoder.h:46-55)
RDY = fe.RDY
PIC_RDY = fe.PIC_RDY
HDRS_RDY = fe.HDRS_RDY
ERROR = fe.ERROR
PARAM_SET_ERROR = fe.PARAM_SET_ERROR


def _frame_decode_body(blob, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr,
                       slot, conceal_from_ref, conceal_ref_slot, width_mbs,
                       height_mbs, caps, intra_wavefront, used_slots=None,
                       mc_pallas=False, deblock_pallas=False,
                       luma_rowtile=False, interpret=False):
    """One full frame on device: unpack, reconstruct, conceal, deblock,
    store. ONE host->device buffer per frame (tier-padded blob built by the
    C++ front-end) instead of ~19 dense tensors. Traced both standalone
    (_decode_step) and as a lax.scan body (_decode_window_step)."""
    from ..ops.unpack import unpack_blob
    n_mbs = width_mbs * height_mbs
    (packed, slice_table, sparse_ids, sparse_levels, mv_exc_ids,
     mv_exc_payload, intra_mbs, intra_payload, slice_ids) = unpack_blob(
        blob, n_mbs, *caps)
    y, cb, cr, tensors = reconstruct_frame_fast(
        packed, slice_table, sparse_ids, sparse_levels, mv_exc_ids,
        mv_exc_payload, intra_mbs, intra_payload, pcm_y, pcm_cb, pcm_cr,
        dpb_y, dpb_cb, dpb_cr, width_mbs, height_mbs, intra_wavefront,
        used_slots=used_slots, mc_pallas=mc_pallas,
        intra_pallas=deblock_pallas, slice_ids=slice_ids,
        luma_rowtile=luma_rowtile, interpret=interpret)

    # concealment of lost MBs (mb_class 6). P-type loss copies the
    # co-located MB from the first available reference (ConcealMb
    # conceal.c:318-338 = zero-MV prediction); whole-picture I-type loss is
    # a grey fill (conceal.c:172-199). Partial I-type loss never reaches
    # this step: _submit routes it through the host-side exact spiral
    # synthesis (ops.conceal + _deblock_store_step).
    width_mbs_, height_mbs_ = width_mbs, height_mbs
    mb_class = tensors["mb_class"].astype(jnp.int32)
    concealed = mb_class == 6

    def apply_conceal(planes):
        y, cb, cr = planes
        ref = jnp.maximum(conceal_ref_slot, 0)
        rep_y = jnp.where(conceal_from_ref & (conceal_ref_slot >= 0),
                          dpb_y[ref], jnp.uint8(128))
        rep_cb = jnp.where(conceal_from_ref & (conceal_ref_slot >= 0),
                           dpb_cb[ref], jnp.uint8(128))
        rep_cr = jnp.where(conceal_from_ref & (conceal_ref_slot >= 0),
                           dpb_cr[ref], jnp.uint8(128))
        mask16 = jnp.repeat(jnp.repeat(
            concealed.reshape(height_mbs, width_mbs), 16, 0), 16, 1)
        mask8 = jnp.repeat(jnp.repeat(
            concealed.reshape(height_mbs, width_mbs), 8, 0), 8, 1)
        return (jnp.where(mask16, rep_y, y), jnp.where(mask8, rep_cb, cb),
                jnp.where(mask8, rep_cr, cr))

    y, cb, cr = jax.lax.cond(concealed.any(), apply_conceal,
                             lambda p: p, (y, cb, cr))

    # the wavefront-batched kernel beats the raster kernel on both frame
    # types (P: 6.25 vs 6.58 ms, I: 9.67 vs 14.33 ms at 1080p) since the
    # gather-free map prep landed
    if deblock_pallas:
        dblk = partial(deblock_frame_wavefront, interpret=interpret)
    else:
        dblk = deblock_frame
    y, cb, cr = dblk(
        y, cb, cr, tensors["mb_class"], tensors["nnz"], tensors["mv"],
        tensors["ref_slot"], tensors["slice_id"], tensors["disable_dblk"],
        tensors["qp_y"], tensors["filter_off_a"], tensors["filter_off_b"],
        tensors["chroma_qp_offset"], width_mbs, height_mbs)

    dpb_y = dpb_y.at[slot].set(y)
    dpb_cb = dpb_cb.at[slot].set(cb)
    dpb_cr = dpb_cr.at[slot].set(cr)
    return (dpb_y, dpb_cb, dpb_cr), (y, cb, cr)


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs",
                                   "intra_wavefront", "caps", "mc_pallas",
                                   "deblock_pallas", "luma_rowtile",
                                   "interpret"))
def _decode_step(blob, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr, slot,
                 conceal_from_ref, conceal_ref_slot, width_mbs, height_mbs,
                 caps, intra_wavefront=False, used_slots=None,
                 mc_pallas=False, deblock_pallas=False, luma_rowtile=False,
                 interpret=False):
    ring, _ = _frame_decode_body(
        blob, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr, slot,
        conceal_from_ref, conceal_ref_slot, width_mbs, height_mbs, caps,
        intra_wavefront, used_slots, mc_pallas, deblock_pallas,
        luma_rowtile, interpret)
    return ring


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs",
                                   "intra_wavefront", "caps", "mc_pallas",
                                   "deblock_pallas", "luma_rowtile",
                                   "stack_outputs"))
def _decode_window_step(blobs, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr,
                        slots, conceal_from_ref, conceal_ref_slot,
                        width_mbs, height_mbs, caps, intra_wavefront=False,
                        used_slots=None, mc_pallas=False,
                        deblock_pallas=False, luma_rowtile=False,
                        stack_outputs=True):
    """K frames in ONE dispatch: lax.scan of the per-frame body over
    stacked blobs, threading the DPB ring as carry. Amortizes the
    per-dispatch tunnel round trip (the steady-state limiter of the
    per-frame path) across the window; frame k reads references written
    by frame k-1 directly from the carried ring, with zero host
    involvement between frames.

    With stack_outputs the scan additionally stacks every frame's
    decoded planes as (K, H, W) outputs, so output pictures pending
    inside the window can read their planes even when a later frame of
    the same window reuses their DPB slot. When the decoder's DPB runs
    with a slot margin >= K (Dpb::init slot-pool rotation: no ring slot
    is reused within K consecutive frames), the stack is pure overhead —
    ~0.9 ms/frame re-materializing full planes at 1080p — and
    stack_outputs=False returns only the ring carry; output pictures
    then read their slots from the post-window ring snapshot."""

    if used_slots is None:
        used_slots = jnp.zeros((blobs.shape[0], 2), jnp.int32)

    def body(carry, per_frame):
        dy, dcb, dcr = carry
        blob, slot, cfr, crs, used = per_frame
        (dy, dcb, dcr), planes = _frame_decode_body(
            blob, dy, dcb, dcr, pcm_y, pcm_cb, pcm_cr, slot, cfr, crs,
            width_mbs, height_mbs, caps, intra_wavefront, used, mc_pallas,
            deblock_pallas, luma_rowtile)
        return (dy, dcb, dcr), (planes if stack_outputs else None)

    (dpb_y, dpb_cb, dpb_cr), stack = jax.lax.scan(
        body, (dpb_y, dpb_cb, dpb_cr),
        (blobs, slots, conceal_from_ref, conceal_ref_slot, used_slots))
    return (dpb_y, dpb_cb, dpb_cr), stack


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs",
                                   "intra_wavefront", "caps", "mc_pallas",
                                   "deblock_pallas", "luma_rowtile"))
def _recon_only_step(blob, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr,
                     width_mbs, height_mbs, caps, intra_wavefront=False,
                     used_slots=None, mc_pallas=False,
                     deblock_pallas=False, luma_rowtile=False):
    """Error path, stage 1: reconstruct the decoded MBs only (no
    concealment/deblocking) so the exact spiral concealment can run on
    host between the stages."""
    from ..ops.unpack import unpack_blob
    n_mbs = width_mbs * height_mbs
    (packed, slice_table, sparse_ids, sparse_levels, mv_exc_ids,
     mv_exc_payload, intra_mbs, intra_payload, slice_ids) = unpack_blob(
        blob, n_mbs, *caps)
    y, cb, cr, _ = reconstruct_frame_fast(
        packed, slice_table, sparse_ids, sparse_levels, mv_exc_ids,
        mv_exc_payload, intra_mbs, intra_payload, pcm_y, pcm_cb, pcm_cr,
        dpb_y, dpb_cb, dpb_cr, width_mbs, height_mbs, intra_wavefront,
        used_slots=used_slots, mc_pallas=mc_pallas,
        intra_pallas=deblock_pallas, slice_ids=slice_ids,
        luma_rowtile=luma_rowtile)
    return y, cb, cr


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs", "caps",
                                   "deblock_pallas"))
def _deblock_store_step(y, cb, cr, blob, dpb_y, dpb_cb, dpb_cr, slot,
                        width_mbs, height_mbs, caps, deblock_pallas=False):
    """Error path, stage 2: deblock the concealed picture and store it."""
    from ..ops.unpack import unpack_blob, unpack_meta
    n_mbs = width_mbs * height_mbs
    (packed, slice_table, sparse_ids, _, mv_exc_ids, mv_exc_payload,
     intra_mbs, intra_payload, slice_ids) = unpack_blob(blob, n_mbs, *caps)
    t = unpack_meta(packed, slice_table, mv_exc_ids, mv_exc_payload,
                    intra_mbs, intra_payload, n_mbs, slice_ids,
                    sparse_ids=sparse_ids)
    dblk = deblock_frame_wavefront if deblock_pallas else deblock_frame
    y, cb, cr = dblk(
        y, cb, cr, t["mb_class"], t["nnz"], t["mv"], t["ref_slot"],
        t["slice_id"], t["disable_dblk"], t["qp_y"], t["filter_off_a"],
        t["filter_off_b"], t["chroma_qp_offset"], width_mbs, height_mbs)
    return (dpb_y.at[slot].set(y), dpb_cb.at[slot].set(cb),
            dpb_cr.at[slot].set(cr))


@partial(jax.jit, static_argnames=("full_range",))
def _to_rgba(y, cb, cr, full_range=False):
    """BT.601 fixed-point YUV->RGBA (reference h264bsdConvertToRGBA
    decoder.c:1163-1216). full_range applies the full-swing matrix for
    streams whose VUI signals video_full_range_flag (vui.c; surfaced as
    Decoder.video_full_range()) — the reference ships only the limited-
    range converter and leaves range handling to the caller."""
    d = jnp.repeat(jnp.repeat(cb.astype(jnp.int32), 2, 0), 2, 1) - 128
    e = jnp.repeat(jnp.repeat(cr.astype(jnp.int32), 2, 0), 2, 1) - 128
    if full_range:
        c = y.astype(jnp.int32)
        r = jnp.clip((256 * c + 359 * e + 128) >> 8, 0, 255)
        g = jnp.clip((256 * c - 88 * d - 183 * e + 128) >> 8, 0, 255)
        b = jnp.clip((256 * c + 454 * d + 128) >> 8, 0, 255)
    else:
        c = y.astype(jnp.int32) - 16
        r = jnp.clip((298 * c + 409 * e + 128) >> 8, 0, 255)
        g = jnp.clip((298 * c - 100 * d - 208 * e + 128) >> 8, 0, 255)
        b = jnp.clip((298 * c + 516 * d + 128) >> 8, 0, 255)
    a = jnp.full_like(r, 255)
    return jnp.stack([r, g, b, a], axis=-1).astype(jnp.uint8)


@dataclass
class OutputPicture:
    pic_id: int
    is_idr: bool
    num_err_mbs: int
    width: int          # uncropped, pels
    height: int
    crop: tuple         # (left, width, top, height)
    _dpb: tuple         # DPB arrays snapshot (immutable device arrays)
    _slot: int
    # VUI video_full_range_flag of the stream (used by render sinks to
    # pick the RGB matrix, reference wasm/h264bsd_canvas.js YUV shader)
    full_range: bool = False

    def yuv_planes(self):
        # lazy: slicing dispatches device work only when a consumer asks
        return (self._dpb[0][self._slot], self._dpb[1][self._slot],
                self._dpb[2][self._slot])

    def detach(self):
        """Copy this picture's planes out of the DPB-ring snapshot so the
        snapshot can be freed. A pending OutputPicture otherwise pins its
        whole ring version (~(dpbSize+1) frames of HBM); a consumer that
        accumulates pictures (e.g. GOP-parallel decode) detaches each one,
        bounding held memory to one frame per picture."""
        y, cb, cr = self.yuv_planes()
        self._dpb = (y[None], cb[None], cr[None])
        self._slot = 0
        return self

    def yuv_bytes(self) -> bytes:
        """Planar uncropped YUV420, reference picture-buffer layout."""
        y, cb, cr = (np.asarray(p) for p in self.yuv_planes())
        return y.tobytes() + cb.tobytes() + cr.tobytes()

    def rgba(self, full_range=False) -> np.ndarray:
        return np.asarray(_to_rgba(*self.yuv_planes(),
                                   full_range=full_range))

    def bgra(self, full_range=False) -> np.ndarray:
        rgba = self.rgba(full_range)
        return rgba[..., [2, 1, 0, 3]]

    def ycbcra(self) -> np.ndarray:
        """Packed YCbCrA u32 pixels (reference h264bsdNextOutputPictureYCbCrA
        decoder.c:732; chroma upsampled by replication)."""
        y, cb, cr = (np.asarray(p) for p in self.yuv_planes())
        cb = cb.repeat(2, 0).repeat(2, 1)
        cr = cr.repeat(2, 0).repeat(2, 1)
        a = np.full_like(y, 255)
        return np.stack([y, cb, cr, a], axis=-1)


class Decoder:
    """Reference-equivalent decoder instance (h264bsdAlloc+Init ->
    h264bsdDecode loop -> h264bsdShutdown)."""

    def __init__(self, no_output_reordering: bool = False,
                 intra_concealment: bool = False, caps_pin: dict = None,
                 slot_margin: int = 0):
        """intra_concealment = the reference's intraConcealmentFlag
        (h264bsd_storage.h:148-149; settable there only by poking the
        struct, read at conceal.c:146-186): with the flag set a fully
        lost I picture copies the reference picture instead of going
        grey. P-picture concealment is unchanged either way.

        slot_margin enlarges the device DPB ring by up to that many
        spare slots (FIFO-rotated by the C++ allocator) so scanned
        window dispatches of that many frames never reuse a ring slot
        and can skip stacking per-frame plane outputs (see
        _decode_window_step)."""
        self._fe = fe.FrontendDecoder(no_output_reordering,
                                      intra_concealment, slot_margin)
        # optional {wavefront_class: caps_tuple} pin from a dry parse
        # (pin_caps_for_stream) — bounds the compile surface up front
        self._caps_pin = caps_pin
        # sticky-caps history per (wavefront,) class: recent frames' raw
        # counts, so consecutive frames share one caps tuple (see _prepare)
        self._cap_hist = {}
        self._dpb = None           # (y, cb, cr) device arrays
        self._geom = None          # stream_info dict
        self._zero_pcm = None

    # -- lifecycle ---------------------------------------------------------

    def close(self):
        self._fe.close()

    # -- decoding ----------------------------------------------------------

    def decode(self, data, pic_id: int = 0, offset: int = 0,
               length: int | None = None):
        """Decode one NAL unit; returns (status, bytes_consumed)."""
        status, read = self._fe.decode(data, pic_id, offset, length)
        if status == fe.HDRS_RDY:
            self._geom = self._fe.stream_info()
            self._dpb = None  # realloc lazily at the next picture
        elif status == fe.PIC_RDY:
            self._reconstruct()
        return status, read

    def _ensure_dpb(self):
        info = self._fe.stream_info()
        self._geom = info
        n_slots = info["dpb_slots"]
        h, w = info["height_mbs"] * 16, info["width_mbs"] * 16
        if (self._dpb is not None and self._dpb[0].shape ==
                (n_slots, h, w)):
            return
        self._dpb = (jnp.zeros((n_slots, h, w), jnp.uint8),
                     jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8),
                     jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8))

    def _reconstruct(self):
        self._submit(self._prepare())

    def _prepare(self):
        """Host-only half of a frame: gather everything the device step
        needs (no JAX calls — safe to run on a parse-ahead thread)."""
        g = self._geom or self._fe.stream_info()
        self._geom = g
        info = self._fe.pic_info()
        w_mbs, h_mbs = g["width_mbs"], g["height_mbs"]
        n_mbs = w_mbs * h_mbs
        non_existing = self._fe.take_non_existing()

        # tier selection so only a handful of step shapes ever compile;
        # the C++ side pads every sparse stream into one transfer blob
        n_single, n_short, n_full, n_wide, n_exc, n_intra, n_slices = (
            int(x) for x in self._fe.blob_counts())

        # sparse intra (typical P frame) -> padded-list pass; intra-heavy
        # (I frames) -> anti-diagonal wavefront pass
        wavefront = n_intra > WF_THRESH

        counts = (n_single, n_short, n_full, n_wide, n_exc, n_intra,
                  n_slices)
        from ..ops.unpack import compact_blob_words

        def fits(p):
            return (all(counts[k] <= p[k] for k in range(7))
                    and (n_slices <= 1 or p[7] > 0))

        pin = None
        if self._caps_pin is not None and wavefront in self._caps_pin:
            # first pinned (caps, total_words) tier the frame fits (fit
            # covers both the caps and the compact-blob total); the
            # TYPICAL tier comes first — sparse-scatter cost on device
            # scales with the cap, not the actual count, so common P
            # frames must not pay the worst frame's caps. A frame beyond
            # every pinned tier falls back to the sticky path.
            for caps_p, tot_p in self._caps_pin[wavefront]:
                if fits(caps_p) and compact_blob_words(
                        counts, n_mbs, caps_p)[1] <= tot_p:
                    pin = (caps_p, tot_p)
                    break
        if pin is not None:
            # PINNED caps (pin_caps_for_stream dry parse): exactly one
            # (caps, total) pair per tier for the whole stream, so the
            # compile surface is bounded up front — the sticky history
            # below can still step tiers as it warms, and every step is a
            # fresh multi-second XLA compile on the tunneled TPU.
            caps, total_w = pin
        else:
            # STICKY caps: tier over the max counts of the last 8 frames
            # of this wavefront class, not this frame alone. Per-frame
            # tiering makes consecutive frames land in different caps
            # tuples, which breaks the multi-frame window dispatch (one
            # tunnel round trip per window instead of per frame — the
            # round trip, ~9 ms on the tunneled link, dominates the frame
            # budget). The 8-frame max decays I-frame spikes after one
            # window. The compact-blob total words tier from the same
            # history so consecutive frames share one blob shape.
            hist = self._cap_hist.setdefault(wavefront, [])
            hist.append(counts)
            del hist[:-8]
            mx = [max(h[k] for h in hist) for k in range(7)]
            caps = caps_from_counts(mx, n_mbs, wavefront)
            _, need_w = compact_blob_words(mx, n_mbs, caps)
            total_w = tier(need_w, ladder(8192, 12) + (need_w,))
        blob = self._fe.blob_compact(*caps, total_w * 4)

        ipcm = self._fe.ipcm()

        # MC path: Pallas window kernels (up to MC_REF_MAX referenced DPB
        # slots; MC_REF_CAP planes are VMEM-resident per pass, more slots
        # run as merged multi-group passes — ops.pallas_mc). XLA gather
        # path on non-TPU backends (H264TPU_MC overrides).
        mask = info.get("used_slot_mask", 0)
        used = [s for s in range(32) if mask >> s & 1][:MC_REF_MAX]
        kernels_on = _MC_MODE == "pallas" or \
            (_MC_MODE == "auto" and _on_tpu())
        count = info.get("used_slot_count", 99)
        mc_pallas = kernels_on and count <= MC_REF_MAX
        if not used:
            used = [0]
        # tiered pad (4/8/16) so only three used_slots shapes ever compile
        cap_len = next(c for c in (MC_REF_CAP, 2 * MC_REF_CAP, MC_REF_MAX)
                       if c >= min(len(used), MC_REF_MAX))
        used_slots = np.asarray((used + [used[0]] * cap_len)[:cap_len],
                                np.int32)
        # luma rowtile: MC/residual/combine in plane-chunk (nG, 16, 128)
        # tiles (one major-dim reshape from the plane) — needs the Pallas
        # MC + list-intra path, groups that never wrap MB rows, and a
        # single VMEM reference pass (ops.reconstruct docstring)
        rowtile = (_ROWTILE and mc_pallas and kernels_on
                   and not wavefront and w_mbs % 8 == 0
                   and cap_len <= MC_REF_CAP)
        return dict(info=info, w_mbs=w_mbs, h_mbs=h_mbs, n_mbs=n_mbs,
                    blob=blob, caps=caps,
                    wavefront=wavefront, ipcm=ipcm,
                    non_existing=non_existing, mc_pallas=mc_pallas,
                    deblock_pallas=kernels_on, used_slots=used_slots,
                    rowtile=rowtile)

    def _submit(self, prep):
        """Device half: transfer the blob and dispatch the frame step."""
        self._ensure_dpb()
        info = prep["info"]
        n_mbs = prep["n_mbs"]

        # zero-fill slots of synthesized non-existing frames (the reference
        # leaves them as uninitialized malloc memory; we define them)
        for slot in prep["non_existing"]:
            y, cb, cr = self._dpb
            self._dpb = (y.at[slot].set(0), cb.at[slot].set(0),
                         cr.at[slot].set(0))

        ipcm_mb, ipcm_data = prep["ipcm"]
        rowtile = prep["rowtile"]
        if len(ipcm_mb):
            py, pcb, pcr = build_pcm_tensors(n_mbs, ipcm_mb, ipcm_data)
            if rowtile:
                # host-side relayout into the plane-chunk tiles the
                # rowtile combine consumes (free: numpy, once per frame
                # with I_PCM content)
                py = py.reshape(n_mbs // 8, 8, 16, 16)                     .transpose(0, 2, 1, 3).reshape(n_mbs // 8, 16, 128)
            pcm = tuple(jnp.asarray(p) for p in (py, pcb, pcr))
        else:
            pcm = self._get_zero_pcm(n_mbs, rowtile)

        n_conc = info["num_concealed_mbs"]
        partial_loss = 0 < n_conc < n_mbs
        # partial loss without a usable reference needs the reference's
        # sequential neighbour-DC synthesis (exact spiral, host-side);
        # partial P-type loss with a reference and all whole-picture cases
        # stay on the fast device path (both exact)
        needs_exact = partial_loss and (
            not info["conceal_from_ref"] or info["conceal_ref_slot"] < 0)

        y, cb, cr = self._dpb
        # free uint32 view: the device parses the blob as words (every
        # section is 4-aligned); shipping words avoids a u8 bitcast pass
        blob = jnp.asarray(prep["blob"].view(np.uint32))
        if needs_exact:
            from ..ops.conceal import conceal_picture
            ry, rcb, rcr = _recon_only_step(
                blob, y, cb, cr, *pcm, prep["w_mbs"], prep["h_mbs"],
                prep["caps"], prep["wavefront"],
                jnp.asarray(prep["used_slots"]), prep["mc_pallas"],
                prep["deblock_pallas"], rowtile)
            yn = np.asarray(ry).copy()
            cbn = np.asarray(rcb).copy()
            crn = np.asarray(rcr).copy()
            # derive from the frame's own blob (the parser may already be
            # ahead on the pipelined producer thread); packed records
            # (8 B/MB) start after the 64-byte compact-blob count header
            mb_class = prep["blob"][64:64 + n_mbs * 8] \
                .reshape(n_mbs, 8)[:, 1] & 7
            decoded = mb_class != 6
            conceal_picture(yn, cbn, crn, decoded, prep["w_mbs"],
                            prep["h_mbs"], bool(info["conceal_from_ref"]),
                            None)
            self._dpb = _deblock_store_step(
                jnp.asarray(yn), jnp.asarray(cbn), jnp.asarray(crn), blob,
                y, cb, cr, np.int32(info["slot"]), prep["w_mbs"],
                prep["h_mbs"], prep["caps"], prep["deblock_pallas"])
        else:
            # host numpy scalars, NOT jnp wraps: jnp.int32(x) runs a
            # tiny convert_element_type program on the DEVICE — three
            # of them per frame occupied ~1.6 ms/frame of device time
            # at 1080p (each mini-program costs ~0.5 ms of occupancy on
            # the tunneled runtime); np scalars reach the step as plain
            # transfers
            self._dpb = _decode_step(
                blob, y, cb, cr, *pcm,
                np.int32(info["slot"]), np.bool_(info["conceal_from_ref"]),
                np.int32(info["conceal_ref_slot"]), prep["w_mbs"],
                prep["h_mbs"], prep["caps"], prep["wavefront"],
                prep["used_slots"], prep["mc_pallas"],
                prep["deblock_pallas"], rowtile)

    def _windowable(self, prep) -> bool:
        """True when the frame can join a scanned multi-frame dispatch:
        the fast path of _submit with nothing frame-individual (no I_PCM
        tensors, no exact spiral concealment, no non-existing-frame slot
        zeroing)."""
        info = prep["info"]
        n_conc = info["num_concealed_mbs"]
        partial_loss = 0 < n_conc < prep["n_mbs"]
        needs_exact = partial_loss and (
            not info["conceal_from_ref"] or info["conceal_ref_slot"] < 0)
        return (not needs_exact and not prep["non_existing"]
                and not len(prep["ipcm"][0]))

    def _submit_window(self, preps):
        """Dispatch a window of compatible frames as scanned steps.
        Caller guarantees every prep is _windowable and shares (caps,
        wavefront, n_mbs).

        Dispatch sizes are quantized to powers of two (64/32/16/8/4/2/1
        chunks) so each (caps, wavefront) tier compiles at most six
        scan variants instead of one per window length. Long scans are
        worth real fps on the tunneled link: each dispatch pays ~17 ms
        of serialization the device cannot hide, so a 64-frame chunk
        amortizes it to ~0.3 ms/frame.

        Returns `views`, one (planes_tuple, index) per frame: where that
        frame's decoded planes can be read independently of later ring
        writes — the consumer resolves pending output pictures against
        these, so a frame may reuse a DPB slot an earlier output of the
        same window still references (windows are NOT cut at the DPB
        ring period). With a slot margin covering the chunk size (the
        C++ allocator then never reuses a slot within the chunk) a view
        is simply (post-chunk ring snapshot, slot) and the scan returns
        only the carry; otherwise the chunk's stacked per-frame scan
        outputs serve as the view (and cost ~0.9 ms/frame at 1080p)."""
        margin = (self._geom or {}).get("slot_margin", 0)
        views = []
        i = 0
        while len(preps) - i > 1:
            k = next(k for k in (64, 32, 16, 8, 4, 2)
                     if k <= len(preps) - i and (margin < 2
                                                 or k <= margin))
            chunk = preps[i:i + k]
            stack = self._submit_window_exact(chunk,
                                              stack_outputs=k > margin)
            if stack is None:
                views += [(self._dpb, p["info"]["slot"]) for p in chunk]
            else:
                views += [(stack, j) for j in range(k)]
            i += k
        if len(preps) - i:
            self._submit(preps[i])
            views.append((self._dpb, preps[i]["info"]["slot"]))
        return views

    def _get_zero_pcm(self, n_mbs, rowtile):
        if rowtile:
            ly = (n_mbs // 8, 16, 128)
            lc = (n_mbs // 8, 8, 64)
        else:
            ly = (n_mbs, 16, 16)
            lc = (n_mbs, 8, 8)
        key = (n_mbs, rowtile)
        if self._zero_pcm is None or self._zero_pcm[0] != key:
            self._zero_pcm = (key, (jnp.zeros(ly, jnp.uint8),
                                    jnp.zeros(lc, jnp.uint8),
                                    jnp.zeros(lc, jnp.uint8)))
        return self._zero_pcm[1]

    def _submit_window_exact(self, preps, stack_outputs=True):
        self._ensure_dpb()
        n_mbs = preps[0]["n_mbs"]
        zero_pcm = self._get_zero_pcm(n_mbs, preps[0]["rowtile"])
        blobs = np.stack([p["blob"].view(np.uint32) for p in preps])
        slots = np.array([p["info"]["slot"] for p in preps], np.int32)
        cfr = np.array([bool(p["info"]["conceal_from_ref"]) for p in preps])
        crs = np.array([p["info"]["conceal_ref_slot"] for p in preps],
                       np.int32)
        used = np.stack([p["used_slots"] for p in preps])
        y, cb, cr = self._dpb
        self._dpb, stack = _decode_window_step(
            blobs, y, cb, cr, *zero_pcm, slots, cfr, crs,
            preps[0]["w_mbs"], preps[0]["h_mbs"], preps[0]["caps"],
            preps[0]["wavefront"], used,
            preps[0]["mc_pallas"], preps[0]["deblock_pallas"],
            preps[0]["rowtile"], stack_outputs)
        return stack

    # -- output ------------------------------------------------------------

    def next_output_picture(self):
        """Next display-order picture, or None (reference
        h264bsdNextOutputPicture decoder.c:599)."""
        out = self._fe.next_output()
        if out is None or self._dpb is None:
            return None
        return self._make_output(out)

    def _make_output(self, out, planes=None, index=None):
        """planes/index override where the picture's planes are read
        (the stacked scan outputs of a window chunk); default is the
        current ring snapshot at the picture's DPB slot."""
        g = self._geom
        crop = (g["crop_left"], g["crop_width"], g["crop_top"],
                g["crop_height"]) if g["crop_flag"] else \
            (0, g["width_mbs"] * 16, 0, g["height_mbs"] * 16)
        return OutputPicture(
            pic_id=out["pic_id"], is_idr=bool(out["is_idr"]),
            num_err_mbs=out["num_err_mbs"],
            width=g["width_mbs"] * 16, height=g["height_mbs"] * 16,
            crop=crop, _dpb=self._dpb if planes is None else planes,
            _slot=out["slot"] if index is None else index,
            full_range=bool(g.get("full_range", 0)))

    # -- metadata (reference decoder.c:771-1105) ---------------------------

    def pic_width(self):
        return self._geom["width_mbs"] * 16 if self._geom else 0

    def pic_height(self):
        return self._geom["height_mbs"] * 16 if self._geom else 0

    def cropping_params(self):
        g = self._geom
        return (bool(g["crop_flag"]), g["crop_left"], g["crop_width"],
                g["crop_top"], g["crop_height"])

    def sample_aspect_ratio(self):
        return (self._geom["sar_width"], self._geom["sar_height"])

    def profile(self):
        return self._geom["profile"]

    def matrix_coefficients(self):
        """VUI matrix_coefficients, 2 (unspecified) when absent
        (reference h264bsdMatrixCoefficients decoder.c:928)."""
        return self._geom["matrix_coefficients"] if self._geom else 2

    def flush_buffer(self):
        """Force every pending picture into the display-order output
        queue (reference h264bsdFlushBuffer decoder.c:834); drain with
        next_output_picture(). Useful at end of stream when reordering
        holds the last pictures back."""
        self._fe.flush_buffer()

    def video_full_range(self):
        return bool(self._geom["full_range"])

    def check_valid_param_sets(self) -> bool:
        """True when at least one valid SPS/PPS combination has been
        received (reference h264bsdCheckValidParamSets decoder.h:82)."""
        return self._fe.valid_param_sets()

    def take_sei_messages(self):
        """Drain and decode every SEI message received since the last
        call (list of frontend.sei.SeiMessage). Goes beyond the reference,
        whose SEI parser is dead code (h264bsd_sei.c; decoder.c:464-466
        skips the NAL): here the front-end queues each SEI NAL's RBSP and
        the messages are decoded host-side, with buffering-period /
        pic-timing HRD geometry looked up from the stored SPSs."""
        from ..frontend.sei import parse_sei_rbsp

        def hrd_lookup(sps_id):
            h = self._fe.sps_hrd(sps_id)
            if h is None or not h["vui_present"]:
                return None
            return {"nal_hrd_present": h["nal_hrd_present"],
                    "vcl_hrd_present": h["vcl_hrd_present"],
                    "nal_cpb_cnt": h["nal_cpb_cnt"],
                    "vcl_cpb_cnt": h["vcl_cpb_cnt"],
                    "nal_initial_len": h["nal_initial_len"],
                    "vcl_initial_len": h["vcl_initial_len"]}

        active = None
        g = self._geom
        if g is not None:
            # pic-timing geometry comes from the active SPS
            for sid in range(32):
                h = self._fe.sps_hrd(sid)
                if h is not None:
                    active = h
                    break
        msgs = []
        pic_size = 0
        if g:
            pic_size = g["width_mbs"] * g["height_mbs"]
        while (rbsp := self._fe.take_sei()) is not None:
            msgs.extend(parse_sei_rbsp(
                rbsp, hrd_lookup=hrd_lookup, active_hrd=active,
                pic_size_in_map_units=pic_size))
        return msgs


def pin_caps_for_stream(data: bytes, typical_pct: float = 75.0) -> dict:
    """Dry-parse a stream (C++ front-end only, no device work) and return
    a {wavefront_class: [(typical_caps, total_words),
    (max_caps, total_words)]} pin — pass as Decoder(caps_pin=...) so the
    whole decode uses at most two (caps, blob-shape) pairs per class and
    the XLA compile surface is bounded before the first dispatch (each
    novel tier combo costs a multi-second compile on the tunneled TPU;
    the sticky-caps history discovers tiers incrementally and can step
    through several).

    TWO tiers per class because cap size is not just padding: the
    device-side sparse-residual scatter costs ~40-73 ns per CAP row on
    a v5e, so typical frames must not pay the worst frame's caps. The
    typical tier covers `typical_pct` percent of the class's frames
    (per-component percentile); the rest use the max tier. Each tier's
    compact-blob total is the max need of the frames assigned to it
    (first tier they fit), so the transfer ships content, not caps.

    Default 75 (round-5 measurement, 1080p): vs the round-4 default of
    90 the typical P tier shrinks from 12032 to 8704 residual rows,
    saving 0.49 ms/frame of module time (8.30 -> 7.81, same-process
    xplane A/B) and 16% of the typical blob (178 -> 149 KB); the extra
    window fragmentation from ~25% of P frames riding the max tier was
    e2e-neutral in the same A/B."""
    from ..ops.unpack import compact_blob_words
    d = fe.FrontendDecoder(no_output_reordering=True)
    per: dict = {}
    n_mbs = 0
    pos = 0
    while pos < len(data):
        status, read = d.decode(data[pos:], 0)
        pos += read
        if status == fe.HDRS_RDY:
            g = d.stream_info()
            n_mbs = g["width_mbs"] * g["height_mbs"]
        elif status == fe.PIC_RDY:
            counts = [int(x) for x in d.blob_counts()]
            wf = counts[5] > WF_THRESH
            per.setdefault(wf, []).append(counts)
            while d.next_output() is not None:
                pass
        elif status >= fe.ERROR and read == 0:
            break
    d.close()
    pins = {}
    for wf, rows in per.items():
        a = np.asarray(rows)
        mx = a.max(axis=0).tolist()
        typ = np.percentile(a, typical_pct, axis=0,
                            method="higher").astype(int).tolist()
        c_max = caps_from_counts(mx, n_mbs, wf)
        c_typ = caps_from_counts(typ, n_mbs, wf)
        tiers = [c_typ, c_max] if c_typ != c_max else [c_max]

        def fits(counts, p):
            return (all(counts[k] <= p[k] for k in range(7))
                    and (counts[6] <= 1 or p[7] > 0))

        assigned = [[] for _ in tiers]
        for counts in rows:
            for k, caps in enumerate(tiers):
                if fits(counts, caps):
                    assigned[k].append(counts)
                    break
        entries = []
        for k, caps in enumerate(tiers):
            needs = [compact_blob_words(c, n_mbs, caps)[1]
                     for c in assigned[k]] or \
                [compact_blob_words([0] * 7, n_mbs, caps)[1]]
            tot = -(-max(needs) // 256) * 256
            entries.append((caps, tot))
        pins[wf] = entries
    return pins


def decode_stream(data: bytes, max_pictures: int | None = None,
                  pipelined: bool = True, caps_pin: dict = None):
    """Convenience: full posix-test-app decode loop (reference
    posix/test_h264bsd.c:146-177). Yields OutputPicture in display order.

    With pipelined=True the bitstream parse (C++, releases the GIL) runs
    one frame ahead on a worker thread, overlapping with the previous
    frame's host->device transfer and dispatch — the double-buffering
    SURVEY.md §7 step 8 calls for."""
    WINDOW = int(os.environ.get("H264TPU_WINDOW", "16"))
    # slot margin = window length: scanned window chunks then return
    # only the ring carry (no stacked per-frame outputs — see
    # _decode_window_step)
    dec = Decoder(caps_pin=caps_pin, slot_margin=WINDOW)
    if not pipelined:
        pos = 0
        n_out = 0
        while pos < len(data):
            status, read = dec.decode(data[pos:], pic_id=n_out)
            pos += read
            if status == fe.PIC_RDY:
                while (pic := dec.next_output_picture()) is not None:
                    yield pic
                    n_out += 1
                    if max_pictures is not None and n_out >= max_pictures:
                        return
            elif status >= fe.ERROR and read == 0:
                return
        return

    import queue
    import threading

    # depth absorbs tunnel-transfer jitter without unbounded
    # parse-ahead memory (one ~0.5 MB blob per slot @1080p)
    q: "queue.Queue" = queue.Queue(maxsize=6)
    counter = {"n": 0}

    def producer():
        pos = 0
        while pos < len(data):
            status, read = dec._fe.decode(data[pos:], counter["n"])
            pos += read
            if status == fe.HDRS_RDY:
                # geometry changes flow through the queue so pending
                # submits of the previous sequence run against its DPB
                dec._geom = dec._fe.stream_info()
                q.put(("reset",))
            elif status == fe.PIC_RDY:
                prep = dec._prepare()
                outs = []
                while (o := dec._fe.next_output()) is not None:
                    outs.append(o)
                counter["n"] += len(outs)
                q.put((prep, outs))
            elif status >= fe.ERROR and read == 0:
                break
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    n_out = 0

    # Consecutive compatible frames are grouped into a scanned window
    # (one device dispatch for up to WINDOW frames). Grouping is greedy
    # over whatever the parse thread has already queued, so it never adds
    # latency when the device is the slower side. Output pictures are
    # yielded only after their window is dispatched, with planes resolved
    # against per-chunk views (the post-chunk ring snapshot under the
    # slot margin, else the chunk's stacked scan outputs) — so a frame
    # may reuse a DPB slot a pending output still references and windows
    # are never cut at the DPB ring period (dpb_slots is 4 for the
    # bundled streams; the old post-window-snapshot scheme capped every
    # window at 4 frames regardless of WINDOW).
    window: list = []          # [(prep, outs)]

    def compatible(prep):
        if not window:
            return True
        head = window[0][0]
        return (prep["caps"] == head["caps"]
                and prep["wavefront"] == head["wavefront"]
                and prep["mc_pallas"] == head["mc_pallas"]
                and prep["deblock_pallas"] == head["deblock_pallas"]
                and prep["n_mbs"] == head["n_mbs"]
                and prep["blob"].nbytes == head["blob"].nbytes
                and prep["used_slots"].shape == head["used_slots"].shape)

    def flush():
        """Dispatch the pending window and materialize its output
        pictures, each resolved to the newest write of its DPB slot AT
        ITS DRAIN POSITION in the window (slot -> chunk-stack view map,
        updated frame by frame; pictures decoded before the window read
        the pre-window ring snapshot, which later writes never mutate)."""
        if not window:
            return []
        old = dec._dpb
        views = dec._submit_window([w[0] for w in window])
        slot_view: dict = {}
        ready = []
        for (prep, outs), view in zip(window, views):
            slot_view[prep["info"]["slot"]] = view
            for o in outs:
                planes, idx = slot_view.get(o["slot"], (old, o["slot"]))
                if planes is None:      # first window after a reset
                    planes, idx = dec._dpb, o["slot"]
                ready.append(dec._make_output(o, planes, idx))
        window.clear()
        return ready

    # Pipeline-ramp flushing: the host parse (~3.4 ms/frame at 1080p)
    # paces this loop, so "flush whenever the queue is empty" degrades
    # every window to 1-2 frames and the decode runs as single-frame
    # dispatches. Instead the flush threshold doubles after each flush
    # (1, 2, 4, ... WINDOW): the first frames dispatch immediately (no
    # startup latency), and once the device is busy with earlier work
    # the windows grow to full scan length behind it — long scans are
    # measurably cheaper per frame than chained single dispatches on
    # the tunneled runtime.
    next_min = 1
    done = False
    while not done:
        item = q.get()
        while True:
            if item is None:
                done = True
                ready = flush()
            elif item[0] == "reset":
                ready = flush()
                dec._dpb = None
            else:
                prep, outs = item
                if not dec._windowable(prep):
                    ready = flush()
                    dec._submit(prep)
                    ready += [dec._make_output(o) for o in outs]
                else:
                    ready = flush() if not compatible(prep) else []
                    window.append((prep, outs))
                    if len(window) >= WINDOW:
                        ready += flush()
            for pic in ready:
                yield pic
                n_out += 1
                if max_pictures is not None and n_out >= max_pictures:
                    return
            if done:
                break
            try:
                item = q.get_nowait()
            except queue.Empty:
                # nothing parsed ahead: dispatch what we have once the
                # ramp threshold is reached (don't idle a starved
                # device, don't fragment windows behind a busy one)
                if len(window) >= next_min:
                    next_min = min(2 * next_min, WINDOW)
                    for pic in flush():
                        yield pic
                        n_out += 1
                        if max_pictures is not None and \
                                n_out >= max_pictures:
                            return
                break


def frame_checksum_host(frame_bytes: bytes) -> int:
    """Weighted uint32 checksum (wraparound) of a truncated YUV frame."""
    x = np.frombuffer(frame_bytes, np.uint8).astype(np.uint32)
    w = (np.arange(x.size, dtype=np.uint32) * np.uint32(2654435761)) \
        + np.uint32(1)
    return int((x * w).sum(dtype=np.uint32))


@partial(jax.jit, static_argnames=("n_trunc",))
def _frame_checksum_device(y, cb, cr, n_trunc):
    flat = jnp.concatenate([y.reshape(-1), cb.reshape(-1), cr.reshape(-1)])
    x = flat[:n_trunc].astype(jnp.uint32)
    w = (jnp.arange(n_trunc, dtype=jnp.uint32) * jnp.uint32(2654435761)) \
        + jnp.uint32(1)
    return (x * w).sum(dtype=jnp.uint32)


def benchmark_decode(stream_name: str, repeats: int = 5):
    """Bench helper: decode a bundled stream, return (fps, bit_exact).

    Timing mirrors the reference harnesses (win/h264bsdTest.cpp:29-84,
    wasm/test_node.js:38-57): the timed pass decodes every picture to the
    point where it is available for consumption — a pointer into decoder
    memory for the reference, a device array in the DPB here (no host copy
    either way). Bit-exactness is verified against the reference decoder's
    YUV output via device-computed frame checksums (the interconnect to a
    tunneled TPU throttles on bulk downloads, so full-frame readback would
    perturb the measurement without changing what is verified)."""
    data = golden.stream_path(stream_name).read_bytes()
    goldens = golden.golden_frames(stream_name)
    n_trunc = len(goldens[0])
    # dry-parse caps pin: bounded compile surface + typical/max tiers
    # (see pin_caps_for_stream)
    pin = pin_caps_for_stream(data)

    # Verification pass FIRST (untimed): device checksums vs golden
    # checksums, stacked on device and fetched in ONE transfer. Ordering
    # and batching are both load-bearing on the tunneled-TPU transport:
    # a device->host read issued after hundreds of MB of uploads (the
    # timed passes) can stall for many minutes, and per-frame scalar
    # int() reads multiply that 73x. One small read on a quiet link,
    # before the timed traffic, completes in milliseconds. The pass also
    # absorbs every jit compile, so the timed passes below are all warm.
    sums = []
    for pic in decode_stream(data, caps_pin=pin):
        sums.append(_frame_checksum_device(*pic.yuv_planes(),
                                           n_trunc=n_trunc))
    got = [int(s) for s in np.asarray(jnp.stack(sums))]
    want = [frame_checksum_host(g) for g in goldens]
    bit_exact = len(got) == len(want) and got == want

    best = float("inf")
    n = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        n = 0
        last = None
        for pic in decode_stream(data, caps_pin=pin):
            last = pic
            n += 1
        jax.block_until_ready(last.yuv_planes())
        best = min(best, time.perf_counter() - t0)
    return n / best, bit_exact
