"""Framepipe (BASELINE config 4): GOP-less IPPP decode with frames
round-robined over a mesh axis and DPB reference planes exchanged via the
axis collective must be byte-identical to the single-device decoder.

The stream has NO IDR picture (utils.streamgen.make_ippp_stream), so
parallel.gop cannot split it — every P frame references the previous
frame, decoded on a DIFFERENT device, through the psum-broadcast DPB
handoff (the ICI analogue of the reference's refAddr pointer,
h264bsd_inter_prediction.c:560-563).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.parallel.framepipe import decode_stream_framepipe
from h264bsd_tpu.parallel.gop import split_gops
from h264bsd_tpu.utils.streamgen import make_ippp_stream


def _single_device_frames(data):
    return [p.yuv_bytes() for p in decode_stream(data, pipelined=False)]


@pytest.fixture(scope="module")
def ippp():
    data = make_ippp_stream(width_mbs=4, height_mbs=4, n_frames=6)
    return data, _single_device_frames(data)


def test_ippp_stream_has_no_gop_split(ippp):
    data, frames = ippp
    assert len(split_gops(data)) == 1      # nothing to split: no IDR
    assert len(frames) == 6                # and it decodes standalone


@pytest.mark.parametrize("n_dev", [2, 4])
def test_framepipe_bit_exact(ippp, n_dev):
    data, want = ippp
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("pipe",))
    got = [p.yuv_bytes()
           for p in decode_stream_framepipe(data, mesh, "pipe")]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"frame {i} differs across the DPB handoff"


def test_framepipe_corrupt_i_slice_evicts_and_conceals():
    """Partial I-type loss without a usable reference needs the exact
    host-side neighbour-DC spiral (h264bsd_conceal.c:124-254): framepipe
    must EVICT that frame from the collective step, repair it exactly,
    and continue the DPB handoff — byte-identical to the single-device
    decoder on the same corrupted stream."""
    data = bytearray(make_ippp_stream(width_mbs=4, height_mbs=4,
                                      n_frames=6))
    # corrupt the tail of the FIRST slice NAL (the leading non-IDR I
    # frame): enough MBs decode that the loss is partial, and there is
    # no reference picture to conceal from
    from h264bsd_tpu.parallel.gop import _nal_positions
    nals = _nal_positions(bytes(data))
    slice_nals = [n for n in nals if n[2] in (1, 5)]
    first_payload = slice_nals[0][0]
    first_end = (nals[nals.index(slice_nals[0]) + 1][1]
                 if nals.index(slice_nals[0]) + 1 < len(nals)
                 else len(data))
    pos = first_payload + int((first_end - first_payload) * 0.8)
    data[pos] ^= 0xFF
    data = bytes(data)

    # the corruption must hit the eviction case: PARTIAL loss (some MBs
    # decoded) with no usable reference
    from h264bsd_tpu.frontend import binding as fe
    chk = fe.FrontendDecoder()
    p, hit = 0, False
    while p < len(data):
        st, rd = chk.decode(data[p:], 0)
        p += rd
        if st == fe.PIC_RDY:
            i = chk.pic_info()
            n = i["num_concealed_mbs"]
            hit |= 0 < n < 16 and (not i["conceal_from_ref"]
                                   or i["conceal_ref_slot"] < 0)
            while chk.next_output() is not None:
                pass
        elif st >= fe.ERROR and rd == 0:
            break
    chk.close()
    assert hit, "corruption did not produce the exact-concealment case"

    want = _single_device_frames(data)
    assert want, "corrupted stream must still decode on the exact path"
    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))
    got = [p.yuv_bytes()
           for p in decode_stream_framepipe(data, mesh, "pipe")]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"frame {i} differs after eviction concealment"
