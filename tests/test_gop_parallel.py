"""GOP-parallel decode: splitting at IDR *picture* boundaries (not every
IDR NAL) and decoding GOPs concurrently on different devices must
reproduce the sequential result exactly."""

import subprocess

import jax
import numpy as np

from h264bsd_tpu.parallel.gop import decode_stream_gop_parallel, split_gops
from h264bsd_tpu.utils import golden
from h264bsd_tpu.utils.golden import (golden_frames, stream_path,
                                      truncate_frame)
from h264bsd_tpu.utils.streamgen import make_conformance_stream


def test_split_gops():
    data = stream_path("640x360").read_bytes()
    segs = split_gops(data)
    assert len(segs) == 2  # 73 frames, keyint=40 -> two IDRs
    # every segment after the first must start with the SPS
    assert segs[1][:5] == data[:5]


def test_split_gops_multislice_idr():
    """An IDR picture coded as several slices (every slice NAL is type 5)
    is ONE access unit (h264bsdCheckAccessUnitBoundary storage.c:593) and
    must stay in one segment."""
    one = make_conformance_stream(width_mbs=8, height_mbs=8, n_frames=3,
                                  slices_per_frame=4)
    segs = split_gops(one)
    assert len(segs) == 1  # a single IDR picture despite 4 IDR NALs

    two = one + one  # two IDR pictures, 4 slices each
    segs = split_gops(two)
    assert len(segs) == 2
    for seg in segs:
        assert seg.count(b"\x00\x00\x01\x65") == 4


def test_split_gops_redundant_idr():
    """A redundant IDR slice (redundant_pic_cnt > 0) with
    first_mb_in_slice == 0 repeats the primary picture it follows
    (reference CheckRedundantPicCnt slice_header.c:1239) and must NOT
    open a new segment."""
    from h264bsd_tpu.utils.streamgen import make_redundant_stream

    one = make_redundant_stream(lost=False)   # IDR + redundant IDR + P
    assert one.count(b"\x00\x00\x01\x65") == 2
    assert len(split_gops(one)) == 1          # one primary IDR picture

    two = one + one
    segs = split_gops(two)
    assert len(segs) == 2                     # splits only at primaries
    for seg in segs:
        assert seg.count(b"\x00\x00\x01\x65") == 2


def test_split_gops_4byte_startcodes():
    """4-byte start codes (leading zero) must stay attached to their NAL
    when segments are cut."""
    base = make_conformance_stream(n_frames=2)
    with4 = base.replace(b"\x00\x00\x01", b"\x00\x00\x00\x01")
    segs = split_gops(with4 + with4)
    assert len(segs) == 2
    # the second segment's IDR NAL must keep its full start code
    assert b"\x00\x00\x00\x01\x65" in segs[1]


def test_gop_parallel_multislice_idr_bit_exact(tmp_path):
    data = make_conformance_stream(width_mbs=8, height_mbs=8, n_frames=3,
                                   slices_per_frame=4) * 2
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    pics = list(decode_stream_gop_parallel(data,
                                           devices=jax.devices()[:2]))
    ours = b"".join(np.asarray(p).tobytes()
                    for pic in pics for p in pic.yuv_planes())
    assert ours == ref


def test_gop_parallel_bit_exact():
    data = stream_path("640x360").read_bytes()
    goldens = golden_frames("640x360")
    n = 0
    for i, pic in enumerate(decode_stream_gop_parallel(
            data, devices=jax.devices()[:2])):
        assert truncate_frame(pic.yuv_bytes(), "640x360") == goldens[i], i
        n += 1
    assert n == 73
