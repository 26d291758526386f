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
