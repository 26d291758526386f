"""Batched multi-stream decoding — SURVEY.md §2.4 stream-level sharding
(BASELINE config 5: many independent 640x360 streams decoded concurrently).

Each stream keeps its own host front-end (decoder state is self-contained,
reference h264bsd_storage.h:75-152 -> trivially batchable); the device work
of all streams that produced a picture this round is executed as ONE
batched step (vmapped frame pipeline), optionally sharded over a device
mesh axis ("stream") with shard_map so each chip owns a subset of streams.

On a single chip the batching amortizes the sequential wavefront stages
across streams (all streams advance inside the same fori steps), which is
the TPU-native answer to "many slow scalar decoders" on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import binding as fe
from ..models.decoder import _decode_step
from ..ops.deblock import deblock_frame
from ..ops.reconstruct import reconstruct_frame_fast


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs",
                                   "intra_wavefront"))
def _batched_step(packed, slice_table, sparse_ids, sparse_levels,
                  mv_exc_ids, mv_exc_payload, intra_mbs, intra_payload,
                  dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr, slots,
                  width_mbs, height_mbs, intra_wavefront=False):
    """vmapped per-frame step over the leading stream axis."""

    def one(packed, stab, ids, levels, eids, epay, intra, ipay,
            dy, dcb, dcr, py, pcb, pcr, slot):
        y, cb, cr, t = reconstruct_frame_fast(
            packed, stab, ids, levels, eids, epay, intra, ipay,
            py, pcb, pcr, dy, dcb, dcr,
            width_mbs, height_mbs, intra_wavefront)
        y, cb, cr = deblock_frame(
            y, cb, cr, t["mb_class"], t["nnz"], t["mv"], t["ref_slot"],
            t["slice_id"], t["disable_dblk"], t["qp_y"], t["filter_off_a"],
            t["filter_off_b"], t["chroma_qp_offset"], width_mbs, height_mbs)
        return dy.at[slot].set(y), dcb.at[slot].set(cb), dcr.at[slot].set(cr)

    return jax.vmap(one)(packed, slice_table, sparse_ids, sparse_levels,
                         mv_exc_ids, mv_exc_payload, intra_mbs,
                         intra_payload, dpb_y, dpb_cb, dpb_cr,
                         pcm_y, pcm_cb, pcm_cr, slots)


class MultiStreamDecoder:
    """Decode N same-resolution streams concurrently with one batched
    device step per round. Streams out of data simply stop contributing."""

    def __init__(self, streams: list[bytes], sparse_cap=16384,
                 intra_cap=None):
        self.n = len(streams)
        self.data = streams
        self.pos = [0] * self.n
        self.fes = [fe.FrontendDecoder() for _ in range(self.n)]
        self.geom = None
        self.dpb = None
        self.sparse_cap = sparse_cap
        self.intra_cap = intra_cap
        self.outputs = [[] for _ in range(self.n)]
        self._zero_pcm = None

    def _ensure_dpb(self, info):
        if self.dpb is not None:
            return
        self.geom = info
        # one extra scratch slot: streams without a picture this round run
        # a no-op frame that lands there instead of corrupting live slots
        n_slots = info["dpb_slots"] + 1
        h, w = info["height_mbs"] * 16, info["width_mbs"] * 16
        self.dpb = (
            jnp.zeros((self.n, n_slots, h, w), jnp.uint8),
            jnp.zeros((self.n, n_slots, h // 2, w // 2), jnp.uint8),
            jnp.zeros((self.n, n_slots, h // 2, w // 2), jnp.uint8))

    def step(self) -> int:
        """Advance every live stream to its next picture, then run one
        batched device step. Returns the number of pictures produced."""
        n_mbs = None
        ready = []  # (idx, slot, packed, ids, levels, intra, wavefront)
        for i in range(self.n):
            d, p = self.data[i], self.pos[i]
            while p < len(d):
                status, read = self.fes[i].decode(d[p:], pic_id=len(
                    self.outputs[i]))
                p += read
                if status == fe.PIC_RDY:
                    # allocate on the first picture: dpb_slots is only
                    # final after the two-phase activation completes
                    self._ensure_dpb(self.fes[i].stream_info())
                    info = self.fes[i].pic_info()
                    g = self.geom
                    n_mbs = g["width_mbs"] * g["height_mbs"]
                    packed = self.fes[i].packed_meta()
                    stab = self.fes[i].slice_table()
                    ids, levels = self.fes[i].sparse_residual()
                    eids, epay = self.fes[i].mv_exceptions()
                    intra = self.fes[i].intra_list()
                    ipay = self.fes[i].intra_payload()
                    ready.append((i, info["slot"], packed, ids, levels,
                                  intra, stab, eids, epay, ipay))
                    while (o := self.fes[i].next_output()) is not None:
                        self.outputs[i].append(o)
                    break
                elif status >= fe.ERROR and read == 0:
                    p = len(d)
            self.pos[i] = p
        if not ready:
            return 0

        g = self.geom
        w_mbs, h_mbs = g["width_mbs"], g["height_mbs"]
        n_mbs = w_mbs * h_mbs
        cap = self.sparse_cap
        while any(len(r[3]) > cap for r in ready):
            cap *= 4
        ecap = 2048
        while any(len(r[7]) > ecap for r in ready):
            ecap *= 4
        wavefront = any(len(r[5]) > 512 for r in ready)
        # when the wavefront pass runs, the intra list only drives the
        # modes/avail scatter; keep the transfer small either way
        icap = self.intra_cap or (n_mbs if wavefront else 512)
        scap = 32

        def pad_rows(arr, capn, fill=0):
            out = np.full((capn,) + arr.shape[1:], fill, arr.dtype)
            out[:len(arr)] = arr
            return out

        by_idx = {r[0]: r for r in ready}
        cols = {k: [] for k in ("packed", "stab", "ids", "lv", "eids",
                                "epay", "intra", "ipay", "slots")}
        zero_packed = np.zeros(len(ready[0][2]), np.uint8)
        n_slots = self.dpb[0].shape[1]
        for i in range(self.n):
            if i in by_idx:
                _, slot, pk, ids, lv, il, stab, eids, epay, ipay = by_idx[i]
                cols["packed"].append(pk)
                cols["stab"].append(pad_rows(stab, scap))
                cols["ids"].append(pad_rows(ids.astype(np.int32), cap,
                                            n_mbs * 26))
                cols["lv"].append(pad_rows(lv, cap))
                cols["eids"].append(pad_rows(eids.astype(np.int32), ecap,
                                             n_mbs))
                cols["epay"].append(pad_rows(epay, ecap))
                cols["intra"].append(pad_rows(il.astype(np.int32), icap,
                                              n_mbs))
                cols["ipay"].append(pad_rows(ipay, icap))
                cols["slots"].append(slot)
            else:
                cols["packed"].append(zero_packed)
                cols["stab"].append(np.zeros((scap, 4), np.int8))
                cols["ids"].append(np.full(cap, n_mbs * 26, np.int32))
                cols["lv"].append(np.zeros((cap, 16), np.int16))
                cols["eids"].append(np.full(ecap, n_mbs, np.int32))
                cols["epay"].append(np.zeros((ecap, 80), np.uint8))
                cols["intra"].append(np.full(icap, n_mbs, np.int32))
                cols["ipay"].append(np.zeros((icap, 32), np.uint8))
                cols["slots"].append(n_slots - 1)

        if self._zero_pcm is None or self._zero_pcm[0].shape[1] != n_mbs:
            self._zero_pcm = (
                jnp.zeros((self.n, n_mbs, 16, 16), jnp.uint8),
                jnp.zeros((self.n, n_mbs, 8, 8), jnp.uint8),
                jnp.zeros((self.n, n_mbs, 8, 8), jnp.uint8))

        dy, dcb, dcr = self.dpb
        self.dpb = _batched_step(
            jnp.asarray(np.stack(cols["packed"])),
            jnp.asarray(np.stack(cols["stab"])),
            jnp.asarray(np.stack(cols["ids"])),
            jnp.asarray(np.stack(cols["lv"])),
            jnp.asarray(np.stack(cols["eids"])),
            jnp.asarray(np.stack(cols["epay"])),
            jnp.asarray(np.stack(cols["intra"])),
            jnp.asarray(np.stack(cols["ipay"])),
            dy, dcb, dcr, *self._zero_pcm,
            jnp.asarray(np.array(cols["slots"], np.int32)), w_mbs, h_mbs,
            wavefront)
        return len(ready)

    def run(self):
        """Decode all streams to completion; returns per-stream picture
        counts."""
        while self.step():
            pass
        return [len(o) for o in self.outputs]

    def picture(self, stream_idx, out_idx):
        o = self.outputs[stream_idx][out_idx]
        return (self.dpb[0][stream_idx, o["slot"]],
                self.dpb[1][stream_idx, o["slot"]],
                self.dpb[2][stream_idx, o["slot"]])
