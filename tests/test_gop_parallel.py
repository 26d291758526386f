"""GOP-parallel decode: splitting at IDR boundaries and decoding GOPs on
different devices must reproduce the sequential result exactly."""

import numpy as np
import jax

from h264bsd_tpu.parallel.gop import decode_stream_gop_parallel, split_gops
from h264bsd_tpu.utils.golden import golden_frames, stream_path, truncate_frame


def test_split_gops():
    data = stream_path("640x360").read_bytes()
    segs = split_gops(data)
    assert len(segs) == 2  # 73 frames, keyint=40 -> two IDRs
    # every segment after the first must start with the SPS
    assert segs[1][:5] == data[:5]


def test_gop_parallel_bit_exact():
    data = stream_path("640x360").read_bytes()
    goldens = golden_frames("640x360")
    n = 0
    for i, pic in enumerate(decode_stream_gop_parallel(
            data, devices=jax.devices()[:2])):
        assert truncate_frame(pic.yuv_bytes(), "640x360") == goldens[i], i
        n += 1
    assert n == 73
