"""Row-sharded frame step == single-device frame step, byte-identical.

Decodes crafted streams with the C++ front-end, then reconstructs every
frame twice: once with the single-device phase passes
(ops.reconstruct.reconstruct_frame + ops.deblock.deblock_frame) and once
with parallel.rowshard's shard_map step over a virtual CPU mesh (2 and 4
row shards). The sharded step's halo exchange (intra pel rows, deblock
4-row halos + patch-back) must reproduce the exact same planes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from h264bsd_tpu.frontend import binding as fe
from h264bsd_tpu.models.entry import frame_step
from h264bsd_tpu.ops.reconstruct import build_pcm_tensors
from h264bsd_tpu.parallel.rowshard import make_row_sharded_step
from h264bsd_tpu.utils.streamgen import (make_conformance_stream,
                                         make_intra_in_p_stream,
                                         make_intra_stress_stream)


def _frames(data):
    """Parse a stream; yield (tensors+pcm, pic_info, stream_info)."""
    d = fe.FrontendDecoder()
    info = None
    pos = 0
    while pos < len(data):
        status, read = d.decode(data[pos:], 0)
        pos += read
        if status == fe.HDRS_RDY:
            info = d.stream_info()
        elif status == fe.PIC_RDY:
            info = info or d.stream_info()
            n_mbs = info["width_mbs"] * info["height_mbs"]
            t = d.tensors(n_mbs)
            mb, blob = d.ipcm()
            t["pcm_y"], t["pcm_cb"], t["pcm_cr"] = build_pcm_tensors(
                n_mbs, mb, blob)
            while d.next_output() is not None:
                pass
            yield t, d.pic_info(), info
        elif status >= fe.ERROR and read == 0:
            break
    d.close()


def _decode_both(data, n_row):
    devices = np.array(jax.devices()[:n_row])
    mesh = Mesh(devices, ("row",))

    single = None
    sharded = None
    step = None
    for t, pic, info in _frames(data):
        w_mbs, h_mbs = info["width_mbs"], info["height_mbs"]
        h, w = h_mbs * 16, w_mbs * 16
        if single is None:
            n_slots = info["dpb_slots"]
            single = (jnp.zeros((n_slots, h, w), jnp.uint8),
                      jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8),
                      jnp.zeros((n_slots, h // 2, w // 2), jnp.uint8))
            sharded = single
            step = make_row_sharded_step(mesh, "row", w_mbs, h_mbs)
        tj = {k: jnp.asarray(v) for k, v in t.items()}
        slot = jnp.int32(pic["slot"])
        single = frame_step(tj, *single, slot, width_mbs=w_mbs,
                            height_mbs=h_mbs)
        sharded = step(tj, *sharded, slot)
        yield pic["slot"], single, sharded


STREAMS = {
    "conformance_8x8": lambda: make_conformance_stream(
        width_mbs=8, height_mbs=8, n_frames=4),
    "multi_slice": lambda: make_conformance_stream(
        width_mbs=8, height_mbs=8, n_frames=3, slices_per_frame=4),
    "intra_stress": lambda: make_intra_stress_stream(
        width_mbs=8, height_mbs=8),
    "intra_in_p": lambda: make_intra_in_p_stream(False),
}


@pytest.mark.parametrize("n_row", [2, 4])
@pytest.mark.parametrize("name", sorted(STREAMS))
def test_rowshard_bit_exact(name, n_row):
    data = STREAMS[name]()
    n = 0
    for slot, single, sharded in _decode_both(data, n_row):
        for p in range(3):
            a = np.asarray(single[p][slot])
            b = np.asarray(sharded[p][slot])
            assert (a == b).all(), (
                f"{name} frame {n} plane {p}: "
                f"{int((a != b).sum())} byte diffs")
        n += 1
    assert n > 0


def test_rowshard_requires_divisible_height():
    mesh = Mesh(np.array(jax.devices()[:2]), ("row",))
    with pytest.raises(ValueError):
        make_row_sharded_step(mesh, "row", 4, 5)


def _blob_preps(data):
    """Drive the production front-end exactly like the fast path: pinned
    caps, per-frame transfer blob."""
    from h264bsd_tpu.models.decoder import Decoder, pin_caps_for_stream

    pin = pin_caps_for_stream(data)
    dec = Decoder(caps_pin=pin)
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
            yield prep, dec._fe.stream_info()
        elif status >= fe.ERROR and read == 0:
            break
    dec.close()


@pytest.mark.parametrize("kernels", [False, True])
@pytest.mark.parametrize("n_row", [2, 4])
@pytest.mark.parametrize("name", ["conformance_8x8", "intra_stress"])
def test_rowshard_blob_step(name, n_row, kernels):
    """The blob-consuming sharded step (production transfer format +
    device unpack + sparse residual) must equal the single-chip fast
    step byte-for-byte — on the XLA stripe phases AND on the production
    Pallas kernels (interpret mode on the CPU mesh)."""
    from h264bsd_tpu.models.decoder import _decode_step
    from h264bsd_tpu.parallel.rowshard import make_row_sharded_blob_step

    if kernels and n_row == 4:
        pytest.skip("kernel parity covered at 2 shards (interpret mode "
                    "is slow; the collective pattern is identical)")
    data = STREAMS[name]()
    mesh = Mesh(np.array(jax.devices()[:n_row]), ("row",))
    single = sharded = None
    steps = {}
    n = 0
    for prep, info in _blob_preps(data):
        w_mbs, h_mbs = prep["w_mbs"], prep["h_mbs"]
        n_mbs = prep["n_mbs"]
        h, w = h_mbs * 16, w_mbs * 16
        if single is None:
            ns = info["dpb_slots"]
            single = (jnp.zeros((ns, h, w), jnp.uint8),
                      jnp.zeros((ns, h // 2, w // 2), jnp.uint8),
                      jnp.zeros((ns, h // 2, w // 2), jnp.uint8))
            sharded = single
        pcm = (jnp.zeros((n_mbs, 16, 16), jnp.uint8),
               jnp.zeros((n_mbs, 8, 8), jnp.uint8),
               jnp.zeros((n_mbs, 8, 8), jnp.uint8))
        blob = jnp.asarray(prep["blob"])
        pi = prep["info"]
        slot = jnp.int32(pi["slot"])
        single = _decode_step(
            blob, *single, *pcm, slot,
            jnp.bool_(pi["conceal_from_ref"]),
            jnp.int32(pi["conceal_ref_slot"]), w_mbs, h_mbs,
            prep["caps"], prep["wavefront"],
            jnp.asarray(prep["used_slots"]), False, False)
        if prep["caps"] not in steps:
            steps[prep["caps"]] = make_row_sharded_blob_step(
                mesh, "row", w_mbs, h_mbs, prep["caps"],
                mc_pallas=kernels, deblock_pallas=kernels,
                interpret=kernels)
        sharded = steps[prep["caps"]](
            blob, *pcm, *sharded, slot, jnp.asarray(prep["used_slots"]))
        for p in range(3):
            a = np.asarray(single[p][pi["slot"]])
            b = np.asarray(sharded[p][pi["slot"]])
            assert (a == b).all(), (
                f"{name} frame {n} plane {p}: "
                f"{int((a != b).sum())} byte diffs")
        n += 1
    assert n > 0
