"""Crafted-stream conformance: features the bundled clips never exercise
end-to-end (FMO dispersed maps, POC types 0/1, multi-slice pictures,
all-skip P pictures, zero-reorder VUI), byte-compared against the
reference decoder binary on streams built by utils/streamgen."""

import pathlib
import subprocess

import numpy as np
import pytest

from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.utils import golden
from h264bsd_tpu.utils.streamgen import make_conformance_stream

CASES = {
    "multi_frame": dict(n_frames=4),
    "poc_type0": dict(n_frames=4, poc_type=0),
    "poc_type1": dict(n_frames=4, poc_type=1),
    "fmo_dispersed2": dict(n_frames=4, num_slice_groups=2),
    "fmo_dispersed3": dict(n_frames=4, num_slice_groups=3,
                           width_mbs=6, height_mbs=3),
    "fmo_poc0": dict(n_frames=3, poc_type=0, num_slice_groups=2),
    "four_slices": dict(n_frames=3, slices_per_frame=4),
    "larger_pic": dict(width_mbs=8, height_mbs=6, n_frames=5),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_crafted_stream_bit_exact(name, tmp_path):
    kw = CASES[name]
    data = make_conformance_stream(**kw)
    stream = tmp_path / "s.h264"
    out = tmp_path / "s.yuv"
    stream.write_bytes(data)
    subprocess.run([str(golden.reference_binary()), "-o", str(out),
                    str(stream)], check=True, capture_output=True,
                   timeout=120)
    ref = out.read_bytes()
    frame_size = (kw.get("width_mbs", 4) * kw.get("height_mbs", 4) *
                  256 * 3 // 2)
    assert len(ref) == kw["n_frames"] * frame_size

    pics = list(decode_stream(data))
    assert len(pics) == kw["n_frames"]
    ours = b"".join(np.asarray(plane).tobytes()
                    for p in pics for plane in p.yuv_planes())
    assert ours == ref
