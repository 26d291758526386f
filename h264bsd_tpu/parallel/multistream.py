"""Batched multi-stream decoding — SURVEY.md §2.4 stream-level sharding
(BASELINE config 5: many independent same-resolution streams decoded
concurrently).

Each stream keeps its own host front-end (decoder state is self-contained,
reference h264bsd_storage.h:75-152 -> trivially batchable); every round,
all streams that produced a picture run as ONE batched device step over a
stacked transfer blob. The per-stream layout is identical to the
single-stream fast path (FrameTensors::build_blob): the whole round is a
single (N, blob_bytes) host->device copy.

On a single chip the batching amortizes the sequential intra/deblock
stages across streams (all streams advance inside the same fori steps) —
the TPU-native answer to "many slow scalar decoders" on CPU. With a
`mesh`, the same step runs under shard_map with the stream batch
partitioned over a mesh axis: each device decodes its shard of streams
with no cross-device traffic (streams are independent; the collective
layer is only the program launch).

Concealment: streams whose picture needs the reference's sequential
neighbour-DC synthesis (partial loss without a usable reference,
h264bsd_conceal.c:124-254) are EVICTED from the batch round — their slice
of the DPB runs the same exact three-stage path as the single-stream
decoder (_recon_only_step -> host spiral -> _deblock_store_step), so
batched mode stays byte-exact on corrupt streams. P-type loss with a
reference and whole-picture loss stay on the batched path (both exact).
NOTE: under a mesh the eviction path does per-stream device->host->device
round trips on slices of the sharded DPB (_submit_exact) — it breaks the
one-launch-per-round model for that round; acceptable because spiral
concealment is a rare error path, but don't put it on a hot path.

Host parse for round k+1 overlaps device execution of round k via a
producer thread (ctypes releases the GIL during C++ parse).
"""

from __future__ import annotations

import queue
import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..frontend import binding as fe
from ..models.decoder import (_decode_step, _deblock_store_step,
                              _recon_only_step, caps_from_counts,
                              WF_THRESH)


@partial(jax.jit, static_argnames=("width_mbs", "height_mbs", "caps",
                                   "intra_wavefront"))
def _batched_blob_step(blobs, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb, pcm_cr,
                       slots, conceal_from_ref, conceal_ref_slot,
                       width_mbs, height_mbs, caps, intra_wavefront=False):
    """The single-stream frame step (unpack -> reconstruct -> conceal ->
    deblock -> store) vmapped over the leading stream axis."""

    def one(blob, dy, dcb, dcr, py, pcb, pcr, slot, cfr, crs):
        return _decode_step(blob, dy, dcb, dcr, py, pcb, pcr, slot, cfr,
                            crs, width_mbs, height_mbs, caps,
                            intra_wavefront)

    return jax.vmap(one)(blobs, dpb_y, dpb_cb, dpb_cr, pcm_y, pcm_cb,
                         pcm_cr, slots, conceal_from_ref, conceal_ref_slot)


def _tier(length, tiers):
    return next(c for c in tiers if c >= length)


class MultiStreamDecoder:
    """Decode N same-resolution streams concurrently with one batched
    device step per round. Streams out of data simply stop contributing.

    With `mesh`, the batch is sharded over `stream_axis` of the mesh
    (config 5's cross-chip shape); N must be divisible by the axis size.
    """

    def __init__(self, streams: list[bytes], mesh=None,
                 stream_axis: str = "stream"):
        self.n = len(streams)
        self.data = streams
        self.pos = [0] * self.n
        self.fes = [fe.FrontendDecoder() for _ in range(self.n)]
        self.geom = None
        self.dpb = None
        self.outputs = [[] for _ in range(self.n)]
        self.mesh = mesh
        self.axis = stream_axis
        if mesh is not None and self.n % mesh.shape[stream_axis]:
            raise ValueError(
                f"{self.n} streams not divisible by mesh axis "
                f"{stream_axis!r} size {mesh.shape[stream_axis]}")
        self._zero_pcm = None
        self._zero_blob = {}
        self._sharded = {}

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

    # -- host half (safe on the producer thread: no JAX calls) -------------

    def _parse_round(self):
        """Advance every live stream to its next picture and build the
        stacked round blob. Returns None when every stream is drained."""
        ready = {}  # idx -> (counts, info, non_existing)
        for i in range(self.n):
            d, p = self.data[i], self.pos[i]
            while p < len(d):
                status, read = self.fes[i].decode(
                    d[p:], pic_id=len(self.outputs[i]))
                p += read
                if status == fe.PIC_RDY:
                    self._ensure_dpb(self.fes[i].stream_info())
                    counts = tuple(int(x) for x in self.fes[i].blob_counts())
                    ready[i] = (counts, self.fes[i].pic_info(),
                                self.fes[i].take_non_existing())
                    while (o := self.fes[i].next_output()) is not None:
                        self.outputs[i].append(o)
                    break
                elif status >= fe.ERROR and read == 0:
                    p = len(d)
            self.pos[i] = p
        if not ready:
            return None

        g = self.geom
        n_mbs = g["width_mbs"] * g["height_mbs"]
        # shared tier caps for the round (same ladder as the single-stream
        # path so compiled shapes are shared with it where N matches)
        mx = [max(c[k] for c, _, _ in ready.values()) for k in range(7)]
        wavefront = mx[5] > WF_THRESH
        caps = caps_from_counts(mx, n_mbs, wavefront)
        # shared compact-blob total for the round (np.stack needs one
        # shape; the tier ladder bounds the compile surface)
        from ..models.decoder import ladder, tier
        from ..ops.unpack import compact_blob_words
        _, need_w = compact_blob_words(mx, n_mbs, caps)
        total_w = tier(need_w, ladder(8192, 12) + (need_w,))

        key = (caps, total_w)
        if key not in self._zero_blob:
            # all-zero compact blob: zero header counts = every section
            # empty, a no-op frame for streams without a picture
            self._zero_blob[key] = np.zeros(total_w * 4, np.uint8)
        n_scratch = self.dpb[0].shape[1] - 1

        blobs, slots, cfr, crs = [], [], [], []
        non_existing = []
        ipcm = []
        exact = []   # streams evicted to the exact concealment path
        for i in range(self.n):
            if i in ready:
                _, info, nonex = ready[i]
                blobs.append(self.fes[i].blob_compact(*caps, total_w * 4))
                n_conc = info["num_concealed_mbs"]
                partial_loss = 0 < n_conc < n_mbs
                needs_exact = partial_loss and (
                    not info["conceal_from_ref"] or
                    info["conceal_ref_slot"] < 0)
                if needs_exact:
                    # run as a no-op in the batch (scratch slot); the
                    # exact spiral path handles the real slot afterwards
                    exact.append((i, info))
                    slots.append(n_scratch)
                    cfr.append(False)
                    crs.append(-1)
                else:
                    slots.append(info["slot"])
                    cfr.append(bool(info["conceal_from_ref"]) and
                               n_conc > 0)
                    crs.append(info["conceal_ref_slot"])
                non_existing.extend((i, s) for s in nonex)
                mb, data = self.fes[i].ipcm()
                if len(mb):
                    ipcm.append((i, mb, data))
            else:
                blobs.append(self._zero_blob[key])
                slots.append(n_scratch)
                cfr.append(False)
                crs.append(-1)
        return dict(blobs=np.stack(blobs), slots=np.array(slots, np.int32),
                    cfr=np.array(cfr), crs=np.array(crs, np.int32),
                    caps=caps, wavefront=wavefront, n_mbs=n_mbs,
                    n_ready=len(ready), non_existing=non_existing,
                    ipcm=ipcm, exact=exact)

    # -- device half -------------------------------------------------------

    def _step_fn(self, caps, wavefront, w_mbs, h_mbs):
        """The round's batched step: plain vmapped jit on one device, or
        shard_map over the stream mesh axis."""
        if self.mesh is None:
            return lambda *a: _batched_blob_step(
                *a, width_mbs=w_mbs, height_mbs=h_mbs, caps=caps,
                intra_wavefront=wavefront)
        key = (caps, wavefront, w_mbs, h_mbs)
        if key not in self._sharded:
            def batched(blobs, dy, dcb, dcr, py, pcb, pcr, slots, cfr, crs):
                return _batched_blob_step(
                    blobs, dy, dcb, dcr, py, pcb, pcr, slots, cfr, crs,
                    w_mbs, h_mbs, caps, wavefront)

            sp = P(self.axis)
            fn = shard_map(batched, mesh=self.mesh, in_specs=(sp,) * 10,
                           out_specs=(sp, sp, sp), check_vma=False)
            self._sharded[key] = jax.jit(fn)
        return self._sharded[key]

    def _submit(self, rnd):
        n_mbs = rnd["n_mbs"]
        dy, dcb, dcr = self.dpb
        for i, slot in rnd["non_existing"]:
            dy = dy.at[i, slot].set(0)
            dcb = dcb.at[i, slot].set(0)
            dcr = dcr.at[i, slot].set(0)

        if rnd["ipcm"]:
            from ..ops.reconstruct import build_pcm_tensors
            py = np.zeros((self.n, n_mbs, 16, 16), np.uint8)
            pcb = np.zeros((self.n, n_mbs, 8, 8), np.uint8)
            pcr = np.zeros((self.n, n_mbs, 8, 8), np.uint8)
            for i, mb, data in rnd["ipcm"]:
                py[i], pcb[i], pcr[i] = build_pcm_tensors(n_mbs, mb, data)
            pcm = tuple(jnp.asarray(p) for p in (py, pcb, pcr))
        else:
            if (self._zero_pcm is None or
                    self._zero_pcm[0].shape[1] != n_mbs):
                self._zero_pcm = (
                    jnp.zeros((self.n, n_mbs, 16, 16), jnp.uint8),
                    jnp.zeros((self.n, n_mbs, 8, 8), jnp.uint8),
                    jnp.zeros((self.n, n_mbs, 8, 8), jnp.uint8))
            pcm = self._zero_pcm

        g = self.geom
        step = self._step_fn(rnd["caps"], rnd["wavefront"], g["width_mbs"],
                             g["height_mbs"])
        self.dpb = step(
            jnp.asarray(rnd["blobs"]), dy, dcb, dcr, *pcm,
            jnp.asarray(rnd["slots"]), jnp.asarray(rnd["cfr"]),
            jnp.asarray(rnd["crs"]))

        for i, info in rnd["exact"]:
            self._submit_exact(i, info, rnd, pcm)

    def _submit_exact(self, i, info, rnd, pcm):
        """Exact three-stage concealment for one evicted stream, on its
        slice of the batched DPB (mirrors Decoder._submit's needs_exact
        branch; reference spiral h264bsd_conceal.c:124-254)."""
        from ..ops.conceal import conceal_picture

        g = self.geom
        w_mbs, h_mbs = g["width_mbs"], g["height_mbs"]
        n_mbs = rnd["n_mbs"]
        dy, dcb, dcr = self.dpb
        blob_np = rnd["blobs"][i]
        blob = jnp.asarray(blob_np)
        y, cb, cr = dy[i], dcb[i], dcr[i]
        ry, rcb, rcr = _recon_only_step(
            blob, y, cb, cr, pcm[0][i], pcm[1][i], pcm[2][i], w_mbs, h_mbs,
            rnd["caps"], rnd["wavefront"])
        yn = np.asarray(ry).copy()
        cbn = np.asarray(rcb).copy()
        crn = np.asarray(rcr).copy()
        mb_class = blob_np[64:64 + n_mbs * 8].reshape(n_mbs, 8)[:, 1] & 7
        decoded = mb_class != 6
        conceal_picture(yn, cbn, crn, decoded, w_mbs, h_mbs,
                        bool(info["conceal_from_ref"]), None)
        ny, ncb, ncr = _deblock_store_step(
            jnp.asarray(yn), jnp.asarray(cbn), jnp.asarray(crn), blob,
            y, cb, cr, jnp.int32(info["slot"]), w_mbs, h_mbs, rnd["caps"])
        self.dpb = (dy.at[i].set(ny), dcb.at[i].set(ncb),
                    dcr.at[i].set(ncr))

    def step(self) -> int:
        """Advance every live stream to its next picture, then run one
        batched device step. Returns the number of pictures produced."""
        rnd = self._parse_round()
        if rnd is None:
            return 0
        self._submit(rnd)
        return rnd["n_ready"]

    def run(self, pipelined: bool = True):
        """Decode all streams to completion; returns per-stream picture
        counts. With pipelined=True the host parse of round k+1 overlaps
        the device execution of round k."""
        if not pipelined:
            while self.step():
                pass
            return [len(o) for o in self.outputs]

        q: queue.Queue = queue.Queue(maxsize=4)
        err = []

        def producer():
            try:
                while (rnd := self._parse_round()) is not None:
                    q.put(rnd)
            except Exception as e:          # surface on the consumer side
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while (rnd := q.get()) is not None:
            self._submit(rnd)
        t.join()
        if err:
            raise err[0]
        return [len(o) for o in self.outputs]

    def picture(self, stream_idx, out_idx):
        o = self.outputs[stream_idx][out_idx]
        return (self.dpb[0][stream_idx, o["slot"]],
                self.dpb[1][stream_idx, o["slot"]],
                self.dpb[2][stream_idx, o["slot"]])
