"""Frame-pipelined decode of GOP-less IPPP streams across a device mesh
axis with DPB reference planes exchanged over ICI — BASELINE config 4,
the TPU-native analogue of the reference's raw `refAddr` pointer into the
DPB (h264bsd_inter_prediction.c:560-563; set per MB from the ref pic list
that h264bsdInitRefPicList builds, dpb.c:1086).

A GOP-less stream's frames form a serial reference chain (frame k motion-
compensates from earlier frames through the DPB), so decode work cannot
fan out the way closed GOPs do (parallel.gop splits at IDR boundaries and
decodes GOPs independently). What a multi-chip deployment still needs is
for the *reference data* to move between chips instead of through a
shared address space: here frames are assigned round-robin to the devices
of a mesh axis, one host front-end parses every slice (DPB bookkeeping is
global state), the owning device runs the frame's reconstruction step
against its local DPB replica, and the newly reconstructed planes are
broadcast along the axis with a masked-psum collective so every replica
stays coherent — the next frame's owner motion-compensates from reference
pictures it never decoded, received over ICI.

Throughput note (honest): the reference chain serializes the device
steps, so this axis adds no frames/s on clean streams — its value is the
DPB-handoff mechanism itself (what the north star's "DPB refs over ICI"
requires for frame-sharded decode of streams whose GOPs don't fit one
chip's memory, and the building block a stage-pipelined decoder would
reuse). Closed-GOP streams should use parallel.gop, which does scale.

Bit-exactness at 2 and 4 devices vs the single-device decoder is pinned
by tests/test_framepipe.py on the virtual CPU mesh, on a no-IDR IPPP
stream built by utils.streamgen.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..frontend import binding as fe
from ..models.decoder import (Decoder, _frame_decode_body,
                              pin_caps_for_stream)
from ..ops.reconstruct import build_pcm_tensors


def make_framepipe_step(mesh, axis, width_mbs, height_mbs, caps,
                        wavefront, mc_pallas=False, deblock_pallas=False):
    """Jitted one-frame step: the `owner` device decodes, then the new
    planes ride the axis collective into every DPB replica.

    mc_pallas/deblock_pallas put the production Pallas kernels on the
    per-frame body (the same flags Decoder._prepare selects on TPU);
    defaults keep the XLA paths for non-TPU meshes."""

    def body(blob, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr, owner,
             slot, cfr, crs, used):
        pid = lax.axis_index(axis)
        h, w = height_mbs * 16, width_mbs * 16

        def active(_):
            _, (y, cb, cr) = _frame_decode_body(
                blob, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr, slot,
                cfr, crs, width_mbs, height_mbs, caps, wavefront, used,
                mc_pallas, deblock_pallas)
            return (y.astype(jnp.uint32), cb.astype(jnp.uint32),
                    cr.astype(jnp.uint32))

        def idle(_):
            return (jnp.zeros((h, w), jnp.uint32),
                    jnp.zeros((h // 2, w // 2), jnp.uint32),
                    jnp.zeros((h // 2, w // 2), jnp.uint32))

        y, cb, cr = lax.cond(pid == owner, active, idle, 0)
        # DPB handoff over ICI: owner contributes the reconstructed
        # planes, everyone else zeros — the psum is a broadcast that
        # replaces the reference's shared-memory refAddr pointer
        y = lax.psum(y, axis).astype(jnp.uint8)
        cb = lax.psum(cb, axis).astype(jnp.uint8)
        cr = lax.psum(cr, axis).astype(jnp.uint8)
        return (dpb_y.at[slot].set(y), dpb_cb.at[slot].set(cb),
                dpb_cr.at[slot].set(cr))

    rep = P()
    fn = shard_map(body, mesh=mesh, in_specs=(rep,) * 12,
                   out_specs=(rep, rep, rep), check_vma=False)
    return jax.jit(fn)


def decode_stream_framepipe(data: bytes, mesh, axis: str = "pipe",
                            max_pictures: int | None = None):
    """Decode a (typically GOP-less) stream with frames round-robined
    over `mesh`'s `axis` and DPB replicas kept coherent via the axis
    collective. Yields OutputPicture in display order, bit-exact with the
    single-device decoder.

    Clean and device-concealable error paths run inside the collective
    step; a picture needing the host-side exact spiral concealment
    (partial loss without a usable reference, the reference's sequential
    neighbour-DC synthesis h264bsd_conceal.c:124-254) is EVICTED from
    the pipeline for that frame: it runs the same exact three-stage path
    as the single-stream decoder (_recon_only_step -> host spiral ->
    _deblock_store_step) and the repaired DPB is re-replicated across
    the mesh — the handoff collective resumes at the next frame. Mirrors
    multistream's eviction so config 4 survives the corrupt streams the
    reference survives, byte-exact (tests/test_framepipe.py)."""
    n_dev = mesh.shape[axis]
    pin = pin_caps_for_stream(data)
    dec = Decoder(caps_pin=pin)
    rep_sharding = NamedSharding(mesh, P())
    steps: dict = {}
    dpb = None
    zero_pcm = None
    frame_i = 0
    n_out = 0
    pos = 0
    while pos < len(data):
        status, read = dec._fe.decode(data[pos:], n_out)
        pos += read
        if status == fe.HDRS_RDY:
            dec._geom = dec._fe.stream_info()
            dpb = None
        elif status == fe.PIC_RDY:
            prep = dec._prepare()
            info = prep["info"]
            n_mbs = prep["n_mbs"]
            n_conc = info["num_concealed_mbs"]
            partial_loss = 0 < n_conc < n_mbs
            needs_exact = partial_loss and (
                not info["conceal_from_ref"]
                or info["conceal_ref_slot"] < 0)
            if dpb is None:
                # re-read: dpb_slots is only final after param-set
                # activation (the HDRS_RDY-time value can be smaller, and
                # an out-of-bounds .at[slot].set silently drops)
                g = dec._fe.stream_info()
                dec._geom = g
                n_slots = g["dpb_slots"]
                h, w = g["height_mbs"] * 16, g["width_mbs"] * 16
                dpb = tuple(jax.device_put(z, rep_sharding) for z in (
                    jnp.zeros((n_slots, h, w), jnp.uint8),
                    jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8),
                    jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8)))
            for s in prep["non_existing"]:
                dpb = tuple(p.at[s].set(0) for p in dpb)
            ipcm_mb, ipcm_data = prep["ipcm"]
            if len(ipcm_mb):
                pcm = tuple(jnp.asarray(p) for p in build_pcm_tensors(
                    n_mbs, ipcm_mb, ipcm_data))
            else:
                if zero_pcm is None or zero_pcm[0].shape[0] != n_mbs:
                    zero_pcm = (jnp.zeros((n_mbs, 16, 16), jnp.uint8),
                                jnp.zeros((n_mbs, 8, 8), jnp.uint8),
                                jnp.zeros((n_mbs, 8, 8), jnp.uint8))
                pcm = zero_pcm
            if needs_exact:
                # EVICTION: exact three-stage concealment outside the
                # collective (multistream's pattern), then re-replicate
                from ..models.decoder import (_deblock_store_step,
                                              _recon_only_step)
                from ..ops.conceal import conceal_picture
                blob = jnp.asarray(prep["blob"].view(np.uint32))
                ry, rcb, rcr = _recon_only_step(
                    blob, *dpb, *pcm, prep["w_mbs"], prep["h_mbs"],
                    prep["caps"], prep["wavefront"],
                    jnp.asarray(prep["used_slots"]), prep["mc_pallas"],
                    prep["deblock_pallas"])
                yn = np.asarray(ry).copy()
                cbn = np.asarray(rcb).copy()
                crn = np.asarray(rcr).copy()
                mb_class = prep["blob"][64:64 + n_mbs * 8].reshape(
                    n_mbs, 8)[:, 1] & 7
                conceal_picture(yn, cbn, crn, mb_class != 6,
                                prep["w_mbs"], prep["h_mbs"],
                                bool(info["conceal_from_ref"]), None)
                new = _deblock_store_step(
                    jnp.asarray(yn), jnp.asarray(cbn), jnp.asarray(crn),
                    blob, *dpb, jnp.int32(info["slot"]), prep["w_mbs"],
                    prep["h_mbs"], prep["caps"], prep["deblock_pallas"])
                dpb = tuple(jax.device_put(np.asarray(p), rep_sharding)
                            for p in new)
            else:
                key = (prep["caps"], prep["wavefront"], prep["w_mbs"],
                       prep["h_mbs"], prep["mc_pallas"],
                       prep["deblock_pallas"])
                if key not in steps:
                    steps[key] = make_framepipe_step(
                        mesh, axis, prep["w_mbs"], prep["h_mbs"],
                        prep["caps"], prep["wavefront"],
                        prep["mc_pallas"], prep["deblock_pallas"])
                dpb = steps[key](
                    jnp.asarray(prep["blob"]), *dpb, *pcm,
                    jnp.int32(frame_i % n_dev), jnp.int32(info["slot"]),
                    jnp.bool_(info["conceal_from_ref"]),
                    jnp.int32(info["conceal_ref_slot"]),
                    jnp.asarray(prep["used_slots"]))
            frame_i += 1
            dec._dpb = dpb
            while (o := dec._fe.next_output()) is not None:
                yield dec._make_output(o)
                n_out += 1
                if max_pictures is not None and n_out >= max_pictures:
                    return
        elif status >= fe.ERROR and read == 0:
            return
