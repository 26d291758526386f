"""End-to-end golden decode: the full decoder (host front-end + device
pipeline + DPB + display order) must reproduce the reference decoder's
output YUV byte-for-byte (mirrors posix/test_h264bsd.c -c compare mode).

The quick test covers the first frames of each stream; the slow test decodes
everything (all 3 streams were verified 73/73 bit-exact)."""

import pytest

from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.utils.golden import golden_frames, stream_path, truncate_frame

QUICK_FRAMES = 6


@pytest.mark.parametrize("name", ["640x360"])
def test_golden_quick(name):
    data = stream_path(name).read_bytes()
    goldens = golden_frames(name)
    n = 0
    for i, pic in enumerate(decode_stream(data, max_pictures=QUICK_FRAMES)):
        assert truncate_frame(pic.yuv_bytes(), name) == goldens[i], f"frame {i}"
        assert pic.num_err_mbs == 0
        n += 1
    assert n == QUICK_FRAMES


def _golden_full(name):
    data = stream_path(name).read_bytes()
    goldens = golden_frames(name)
    n = 0
    for i, pic in enumerate(decode_stream(data)):
        assert truncate_frame(pic.yuv_bytes(), name) == goldens[i], f"frame {i}"
        n += 1
    assert n == len(goldens) == 73


def test_golden_full_sd():
    """All 73 frames of the SD stream, byte-compared — runs in CI (the
    reference CI decodes a full stream per push, build.yml:10-27)."""
    _golden_full("640x360")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["1920x1080", "1920x1080_fullRange"])
def test_golden_full(name):
    _golden_full(name)


def test_metadata_surface():
    """Reference metadata getters (decoder.c:771-1105 equivalents)."""
    from h264bsd_tpu.models.decoder import Decoder, PIC_RDY, ERROR
    data = stream_path("640x360").read_bytes()
    dec = Decoder()
    pos = 0
    while pos < len(data):
        status, read = dec.decode(data[pos:])
        pos += read
        if status == PIC_RDY:
            break
        assert status < ERROR or read > 0
    assert dec.pic_width() == 640
    assert dec.pic_height() == 368
    crop = dec.cropping_params()
    assert crop == (True, 0, 640, 0, 360)
    assert dec.profile() == 66
    assert dec.sample_aspect_ratio() == (1, 1)
    pic = dec.next_output_picture()
    assert pic is not None and pic.is_idr
    rgba = pic.rgba()
    assert rgba.shape == (368, 640, 4)
    assert (rgba[..., 3] == 255).all()
