"""Wide CAVLC levels (|level| > 127) through the int8 transfer blob.

The bundled streams never produce levels outside int8 (their QP is too
high for such levels to survive the reference's [-512,511] IDCT range
validation), so the blob's wide-escape section is exercised with crafted
one-macroblock low-QP streams, oracled against the reference decoder
binary itself.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from h264bsd_tpu.frontend.binding import FrontendDecoder, PIC_RDY
from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.utils import golden
from h264bsd_tpu.utils.streamgen import make_lowqp_i_stream


def _reference_yuv(data: bytes, tmp_path) -> bytes:
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True, timeout=60)
    return out.read_bytes()


@pytest.mark.parametrize("level", [200, -200, 128, -1023, 127])
def test_wide_level_bit_exact(level, tmp_path):
    data = make_lowqp_i_stream(dc_level=level, qp=2)
    ref = _reference_yuv(data, tmp_path)
    pics = list(decode_stream(data))
    assert len(pics) == 1
    y, cb, cr = pics[0].yuv_planes()
    got = (np.asarray(y).tobytes() + np.asarray(cb).tobytes() +
           np.asarray(cr).tobytes())
    assert got == ref


def test_wide_escape_engages():
    """|level| > 127 must flow through the blob's wide section (and
    |level| <= 127 must not)."""
    for level, expect_wide in ((200, 1), (-1023, 1), (127, 0)):
        dec = FrontendDecoder()
        data = make_lowqp_i_stream(dc_level=level, qp=2)
        pos = 0
        while pos < len(data):
            s, r = dec.decode(data[pos:], pic_id=0)
            pos += r
            if s == PIC_RDY:
                counts = dec.blob_counts()
                assert int(counts[3]) == expect_wide, level
                ids, lv = dec.sparse_residual()
                assert list(ids) == [0]
                assert int(lv[0][0]) == level
