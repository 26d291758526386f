"""Driver hooks: single-chip compile check and multi-chip sharding dry-run.

entry(): a jittable per-frame decode step on the flagship pipeline
(reconstruct + deblock + DPB store) with small example inputs.

run_multichip_dryrun(n): the frame decode step sharded over an n-device
Mesh — the decoder's parallelism axes are the ML-stack analogues called
out in SURVEY.md §2.4: independent streams = data parallel; MB rows
within a frame = tensor/context parallel with real ppermute halo exchange
and all_gather frame assembly (parallel.rowshard; bit-exactness vs the
single-device step pinned by tests/test_rowshard.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deblock import deblock_frame
from ..ops.reconstruct import reconstruct_frame

TENSOR_SPECS = {
    "mb_class": ((), np.uint8), "qp_y": ((), np.uint8),
    "slice_id": ((), np.uint32), "decoded": ((), np.uint8),
    "disable_dblk": ((), np.uint8), "filter_off_a": ((), np.int8),
    "filter_off_b": ((), np.int8), "chroma_qp_offset": ((), np.int8),
    "i16_mode": ((), np.uint8), "chroma_mode": ((), np.uint8),
    "i4_modes": ((16,), np.uint8), "i4_avail": ((16,), np.uint8),
    "mb_avail": ((), np.uint8), "mv": ((16, 2), np.int16),
    "ref_slot": ((16,), np.int8), "nnz": ((24,), np.uint8),
    "nnz_dc": ((3,), np.uint8), "coeff": ((24, 16), np.int16),
    "luma_dc": ((16,), np.int16), "chroma_dc": ((8,), np.int16),
    "pcm_y": ((16, 16), np.uint8), "pcm_cb": ((8, 8), np.uint8),
    "pcm_cr": ((8, 8), np.uint8),
}


def example_tensors(n_mbs, batch=None, rng=None):
    rng = rng or np.random.default_rng(0)
    shape_pre = (batch,) if batch else ()
    t = {}
    for name, (shape, dtype) in TENSOR_SPECS.items():
        t[name] = jnp.zeros(shape_pre + (n_mbs,) + shape, dtype)
    # a few plausible values: everything P_Skip except one intra16 MB
    mb_class = np.ones(shape_pre + (n_mbs,), np.uint8)
    mb_class[..., 0] = 4
    t["mb_class"] = jnp.asarray(mb_class)
    t["qp_y"] = jnp.full(shape_pre + (n_mbs,), 26, np.uint8)
    t["slice_id"] = jnp.ones(shape_pre + (n_mbs,), np.uint32)
    t["decoded"] = jnp.ones(shape_pre + (n_mbs,), np.uint8)
    return t


def frame_step(tensors, dpb_y, dpb_cb, dpb_cr, slot, width_mbs, height_mbs):
    """Jittable flagship forward step: one frame end to end."""
    y, cb, cr = reconstruct_frame(tensors, dpb_y, dpb_cb, dpb_cr,
                                  width_mbs, height_mbs)
    y, cb, cr = deblock_frame(
        y, cb, cr, tensors["mb_class"], tensors["nnz"], tensors["mv"],
        tensors["ref_slot"], tensors["slice_id"], tensors["disable_dblk"],
        tensors["qp_y"], tensors["filter_off_a"], tensors["filter_off_b"],
        tensors["chroma_qp_offset"], width_mbs, height_mbs)
    return (dpb_y.at[slot].set(y), dpb_cb.at[slot].set(cb),
            dpb_cr.at[slot].set(cr))


def entry_fn_and_args():
    w_mbs = h_mbs = 4
    n_mbs = w_mbs * h_mbs
    h, w = h_mbs * 16, w_mbs * 16
    n_slots = 3
    tensors = example_tensors(n_mbs)
    dpb_y = jnp.full((n_slots, h, w), 128, jnp.uint8)
    dpb_cb = jnp.full((n_slots, h // 2, w // 2), 128, jnp.uint8)
    dpb_cr = jnp.full((n_slots, h // 2, w // 2), 128, jnp.uint8)
    fn = partial(frame_step, width_mbs=w_mbs, height_mbs=h_mbs)
    return fn, (tensors, dpb_y, dpb_cb, dpb_cr, jnp.int32(0))


def _real_frame_tensors(w_mbs, h_mbs, n_frames=2):
    """Parse a crafted streamgen stream through the C++ front-end and
    return its frames' dense tensor dicts + DPB slots — the dryrun runs
    on real parse output (IDR intra frame, then a P frame whose MC reads
    the reference written by frame 1), not synthetic zeros."""
    from ..frontend import binding as fe
    from ..ops.reconstruct import build_pcm_tensors
    from ..utils.streamgen import make_conformance_stream

    data = make_conformance_stream(width_mbs=w_mbs, height_mbs=h_mbs,
                                   n_frames=n_frames)
    d = fe.FrontendDecoder()
    frames = []
    info = None
    pos = 0
    while pos < len(data):
        status, read = d.decode(data[pos:], 0)
        pos += read
        if status == fe.HDRS_RDY:
            info = d.stream_info()
        elif status == fe.PIC_RDY:
            n_mbs = info["width_mbs"] * info["height_mbs"]
            t = d.tensors(n_mbs)
            mb, blob = d.ipcm()
            t["pcm_y"], t["pcm_cb"], t["pcm_cr"] = build_pcm_tensors(
                n_mbs, mb, blob)
            frames.append((t, int(d.pic_info()["slot"])))
            while d.next_output() is not None:
                pass
        elif status >= fe.ERROR and read == 0:
            break
    d.close()
    return frames


def run_multichip_dryrun(n_devices: int) -> None:
    """Shard the full frame step over an n-device mesh and run one step
    per frame of a REAL crafted stream (C++ front-end parse output), then
    assert the sharded result is byte-identical to the single-device
    step.

    Mesh axes: ("stream", "row") — stream-batch data parallelism times
    MB-row sharding. The row axis runs parallel.rowshard's real sharded
    step: residual + MC per stripe against the replicated DPB, then the
    intra and deblock stripe pipelines with ppermute halo exchange
    (boundary pel rows / 4-row deblock halos with patch-back), the output
    frame assembled from the stripe results by all_gather (the DPB
    handoff collective).
    """
    from jax.sharding import Mesh

    from ..parallel.rowshard import make_batched_row_sharded_step

    avail = jax.devices()
    if len(avail) < n_devices:
        # the axon TPU plugin overrides JAX_PLATFORMS=cpu; the host
        # backend still exposes the forced virtual device count
        avail = jax.devices("cpu")
    devices = np.array(avail[:n_devices])
    if n_devices % 2 == 0:
        mesh_shape = (n_devices // 2, 2)
    else:
        mesh_shape = (n_devices, 1)
    mesh = Mesh(devices.reshape(mesh_shape), ("stream", "row"))
    n_stream, n_row = mesh_shape

    w_mbs = 4
    h_mbs = 2 * n_row          # 2 MB rows per row-shard
    h, w = h_mbs * 16, w_mbs * 16
    n_slots = 2
    batch = n_stream

    frames = _real_frame_tensors(w_mbs, h_mbs)
    assert len(frames) >= 2, "dryrun stream must parse to >= 2 frames"

    dpb_y = jnp.full((batch, n_slots, h, w), 128, jnp.uint8)
    dpb_cb = jnp.full((batch, n_slots, h // 2, w // 2), 128, jnp.uint8)
    dpb_cr = jnp.full((batch, n_slots, h // 2, w // 2), 128, jnp.uint8)
    # single-device oracle DPB (one stream's worth)
    ref_dpb = (dpb_y[0], dpb_cb[0], dpb_cr[0])

    step = make_batched_row_sharded_step(mesh, "stream", "row", w_mbs,
                                         h_mbs)
    for t, slot in frames:
        tj = {k: jnp.asarray(v) for k, v in t.items()}
        batched = {k: jnp.broadcast_to(v, (batch,) + v.shape)
                   for k, v in tj.items()}
        slots = jnp.full((batch,), slot, jnp.int32)
        dpb_y, dpb_cb, dpb_cr = step(batched, dpb_y, dpb_cb, dpb_cr,
                                     slots)
        ref_dpb = frame_step(tj, *ref_dpb, jnp.int32(slot), w_mbs, h_mbs)
    jax.block_until_ready((dpb_y, dpb_cb, dpb_cr))

    # every stream replica must equal the single-device result exactly
    for b in range(batch):
        for got, want in zip((dpb_y[b], dpb_cb[b], dpb_cr[b]), ref_dpb):
            assert np.array_equal(np.asarray(got), np.asarray(want)), \
                "sharded decode diverged from the single-device step"

    # second phase: the PRODUCTION transfer format through the row axis —
    # the blob-consuming sharded step (device unpack + sparse residual +
    # stripe pipelines) vs the single-chip fast step, byte-compared
    if n_row >= 2:
        _blob_step_dryrun(mesh, n_row, w_mbs, h_mbs)

    # third phase: the framepipe axis — a GOP-less IPPP stream with
    # frames round-robined over ALL n devices and the DPB replicas kept
    # coherent by the masked-psum handoff collective
    # (parallel.framepipe), byte-compared against the single-device
    # decoder. With this, all four parallel components (multistream via
    # the stream axis, rowshard via the row axis, gop implicitly through
    # the same blob step, framepipe here) are driver-verified.
    _framepipe_dryrun(np.asarray(mesh.devices).reshape(-1))


def _framepipe_dryrun(devices) -> None:
    from jax.sharding import Mesh

    from ..models.decoder import decode_stream
    from ..parallel.framepipe import decode_stream_framepipe
    from ..utils.streamgen import make_ippp_stream

    data = make_ippp_stream(width_mbs=4, height_mbs=4, n_frames=5)
    want = [p.yuv_bytes() for p in decode_stream(data, pipelined=False)]
    mesh = Mesh(devices, ("pipe",))
    got = [p.yuv_bytes()
           for p in decode_stream_framepipe(data, mesh, "pipe")]
    assert len(got) == len(want) == 5, (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"framepipe frame {i} diverged across DPB handoff"


def _blob_step_dryrun(mesh, n_row, w_mbs, h_mbs) -> None:
    from jax.sharding import Mesh

    from ..frontend import binding as fe
    from ..models.decoder import (Decoder, _decode_step,
                                  pin_caps_for_stream)
    from ..parallel.rowshard import make_row_sharded_blob_step
    from ..utils.streamgen import make_conformance_stream

    row_mesh = Mesh(np.asarray(mesh.devices).reshape(-1)[:n_row], ("row",))
    data = make_conformance_stream(width_mbs=w_mbs, height_mbs=h_mbs,
                                   n_frames=3)
    dec = Decoder(caps_pin=pin_caps_for_stream(data))
    single = sharded = sharded_k = None
    steps = {}
    pos = 0
    while pos < len(data):
        status, read = dec._fe.decode(data[pos:], 0)
        pos += read
        if status == fe.HDRS_RDY:
            dec._geom = dec._fe.stream_info()
        elif status == fe.PIC_RDY:
            prep = dec._prepare()
            while dec._fe.next_output() is not None:
                pass
            if single is None:
                info = dec._fe.stream_info()
                ns = info["dpb_slots"]
                h, w = h_mbs * 16, w_mbs * 16
                single = (jnp.zeros((ns, h, w), jnp.uint8),
                          jnp.zeros((ns, h // 2, w // 2), jnp.uint8),
                          jnp.zeros((ns, h // 2, w // 2), jnp.uint8))
                sharded = sharded_k = single
            n_mbs = prep["n_mbs"]
            pcm = (jnp.zeros((n_mbs, 16, 16), jnp.uint8),
                   jnp.zeros((n_mbs, 8, 8), jnp.uint8),
                   jnp.zeros((n_mbs, 8, 8), jnp.uint8))
            blob = jnp.asarray(prep["blob"].view(np.uint32))
            pi = prep["info"]
            slot = jnp.int32(pi["slot"])
            single = _decode_step(
                blob, *single, *pcm, slot,
                jnp.bool_(pi["conceal_from_ref"]),
                jnp.int32(pi["conceal_ref_slot"]), w_mbs, h_mbs,
                prep["caps"], prep["wavefront"],
                jnp.asarray(prep["used_slots"]), False, False)
            used = jnp.asarray(prep["used_slots"])
            if prep["caps"] not in steps:
                steps[prep["caps"]] = make_row_sharded_blob_step(
                    row_mesh, "row", w_mbs, h_mbs, prep["caps"])
            sharded = steps[prep["caps"]](blob, *pcm, *sharded, slot,
                                          used)
            # the PRODUCTION Pallas kernels through the row axis
            # (interpret mode off-TPU), byte-compared at the end.
            # Detect from the MESH devices, not default_backend(): under
            # the axon plugin the process default can be TPU while this
            # dryrun runs on the forced virtual CPU devices
            interp = row_mesh.devices.flat[0].platform != "tpu"
            key = ("kern", prep["caps"])
            if key not in steps:
                steps[key] = make_row_sharded_blob_step(
                    row_mesh, "row", w_mbs, h_mbs, prep["caps"],
                    mc_pallas=True, deblock_pallas=True,
                    interpret=interp)
            sharded_k = steps[key](blob, *pcm, *sharded_k, slot, used)
        elif status >= fe.ERROR and read == 0:
            break
    jax.block_until_ready((single, sharded))
    dec.close()
    for got, want in zip(sharded, single):
        assert np.array_equal(np.asarray(got), np.asarray(want)), \
            "blob-path sharded decode diverged from the fast step"
    for got, want in zip(sharded_k, single):
        assert np.array_equal(np.asarray(got), np.asarray(want)), \
            "kernel-path sharded decode diverged from the fast step"


def entry_fn_check():
    fn, args = entry_fn_and_args()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    return out
