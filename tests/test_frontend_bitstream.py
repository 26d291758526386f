"""Front-end parity tests: CAVLC code tables (exhaustive vs reference logic)
and SPS parsing on the bundled streams."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from h264bsd_tpu.frontend.binding import dev_parse_sps, lib
from h264bsd_tpu.utils.golden import stream_path


@pytest.fixture(scope="module")
def ref_cavlc():
    import extract_cavlc_tables as ext
    return ext


def test_coeff_token_exhaustive(ref_cavlc):
    L = lib()
    for nc in (-1, 0, 1, 2, 3, 4, 5, 7, 8, 16):
        got = np.array([L.h264tpu_dev_coeff_token(b, nc) for b in range(1 << 16)])
        want = np.array([ref_cavlc.decode_coeff_token_ref(b, nc)
                         for b in range(1 << 16)])
        assert np.array_equal(got, want), f"nc={nc}"


def test_total_zeros_exhaustive(ref_cavlc):
    L = lib()
    for tc in range(1, 16):
        for b in range(1 << 9):
            assert L.h264tpu_dev_total_zeros(b, tc, 0) == \
                ref_cavlc.decode_total_zeros_ref(b, tc, False), (tc, b)
    for tc in range(1, 4):
        for b in range(1 << 9):
            assert L.h264tpu_dev_total_zeros(b, tc, 1) == \
                ref_cavlc.decode_total_zeros_ref(b, tc, True), (tc, b)


def test_run_before_exhaustive(ref_cavlc):
    L = lib()
    for zl in range(1, 15):
        for b in range(1 << 11):
            assert L.h264tpu_dev_run_before(b, zl) == \
                ref_cavlc.decode_run_before_ref(b, zl), (zl, b)


def test_parse_sps_640x360():
    data = stream_path("640x360").read_bytes()
    info = dev_parse_sps(data)
    assert info["width_mbs"] == 40
    assert info["height_mbs"] == 23
    assert info["cropping"] == 1
    # 368 - 8 = 360 -> crop_bottom = 4 (in 2-pel units for frame_mbs_only)
    assert info["crop_b"] == 4
    assert info["profile"] == 66


def test_parse_sps_1080p():
    data = stream_path("1920x1080").read_bytes()
    info = dev_parse_sps(data)
    assert info["width_mbs"] == 120
    assert info["height_mbs"] == 68
    assert info["crop_b"] == 4
