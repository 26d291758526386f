"""Error-resilience parity: feed the same corrupted streams to our decoder
and the reference binary; outputs must match (concealment, slice
corruption marking, AUB recovery — SURVEY.md §5's in-domain fault
tolerance). Covers P-type concealment (co-located reference copy) and
I-type partial loss (sequential neighbour-DC spiral synthesis)."""

import subprocess

import numpy as np
import pytest

from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.utils.golden import (STREAMS, WORK, resilient_binary,
                                      stream_path)


def reference_decode(data: bytes, tag: str) -> list[bytes]:
    """Run the reference binary on a byte string, return output frames."""
    binary = resilient_binary()
    inp = WORK / f"corrupt_{tag}.h264"
    out = WORK / f"corrupt_{tag}.yuv"
    inp.write_bytes(data)
    subprocess.run([str(binary), str(inp), str(out)], check=True,
                   capture_output=True)
    _, cw, ch, _, _ = STREAMS["640x360"]
    frame = cw * ch * 3 // 2
    blob = out.read_bytes()
    return [blob[i:i + frame] for i in range(0, len(blob), frame)]


def our_decode(data: bytes) -> list[bytes]:
    _, cw, ch, _, _ = STREAMS["640x360"]
    frame = cw * ch * 3 // 2
    return [pic.yuv_bytes()[:frame] for pic in decode_stream(data)]


@pytest.mark.parametrize("corrupt_at", [0.31, 0.55, 0.80])
def test_corrupt_p_slice_parity(corrupt_at):
    data = bytearray(stream_path("640x360").read_bytes())
    pos = int(len(data) * corrupt_at)
    # avoid forging a start code; flip bits mid-P-slice payload
    data[pos] ^= 0x5A
    data[pos + 1] ^= 0xC3
    data = bytes(data)

    ref = reference_decode(data, f"p{int(corrupt_at * 100)}")
    ours = our_decode(data)
    assert len(ours) == len(ref), (len(ours), len(ref))
    n_diff = sum(a != b for a, b in zip(ours, ref))
    assert n_diff == 0, f"{n_diff}/{len(ref)} frames differ"


def test_truncated_stream_parity():
    data = stream_path("640x360").read_bytes()[:len(stream_path(
        "640x360").read_bytes()) * 2 // 3]
    ref = reference_decode(data, "trunc")
    ours = our_decode(data)
    assert len(ours) == len(ref)
    assert all(a == b for a, b in zip(ours, ref))


@pytest.mark.parametrize("offset", [3000, 12000])
def test_corrupt_idr_slice_parity(offset):
    """Corrupting the first IDR slice forces the intra neighbour-synthesis
    concealment spiral (ConcealMb conceal.c:378-590)."""
    data = bytearray(stream_path("640x360").read_bytes())
    data[offset] ^= 0x7F
    data[offset + 5] ^= 0x33
    data = bytes(data)

    ref = reference_decode(data, f"idr{offset}")
    ours = our_decode(data)
    assert len(ours) == len(ref), (len(ours), len(ref))
    for i, (a, b) in enumerate(zip(ours, ref)):
        if a != b:
            d = np.frombuffer(a, np.uint8).astype(int) - \
                np.frombuffer(b, np.uint8).astype(int)
            raise AssertionError(
                f"frame {i}: {np.count_nonzero(d)} differing bytes, "
                f"max |diff| {np.abs(d).max()}")


def test_out_of_range_residual_parity():
    """QP 51 with the stress generator's levels drives the IDCT outside
    [-512,511]; the reference rejects the slice (transform.c:183-188
    HANTRO_NOK -> h264bsdMarkSliceCorrupted) and conceals. The rebuild's
    host-side range validation plus concealment must match byte-exactly."""
    from h264bsd_tpu.utils.streamgen import make_intra_stress_stream

    data = make_intra_stress_stream(width_mbs=4, height_mbs=4, n_frames=2,
                                    qp=51)
    binary = resilient_binary()
    inp = WORK / "overrange.h264"
    out = WORK / "overrange.yuv"
    inp.write_bytes(data)
    subprocess.run([str(binary), str(inp), str(out)], check=True,
                   capture_output=True)
    frame = 4 * 4 * 256 * 3 // 2
    blob = out.read_bytes()
    ref = [blob[i:i + frame] for i in range(0, len(blob), frame)]

    ours = [pic.yuv_bytes()[:frame] for pic in decode_stream(data)]
    assert len(ours) == len(ref), (len(ours), len(ref))
    assert all(a == b for a, b in zip(ours, ref))


def _decode_flagged(data, frame, intra_concealment):
    from h264bsd_tpu.models.decoder import Decoder, PIC_RDY, ERROR

    dec = Decoder(intra_concealment=intra_concealment)
    ours = []
    pos = 0
    while pos < len(data):
        status, read = dec.decode(data[pos:], pic_id=len(ours))
        pos += read
        if status == PIC_RDY:
            while (pic := dec.next_output_picture()) is not None:
                ours.append(pic.yuv_bytes()[:frame])
        elif status >= ERROR and read == 0:
            break
    dec.close()
    return ours


def _reference_flagged(data, frame, tag):
    from h264bsd_tpu.utils.golden import resilient_binary

    binary = resilient_binary(intra_conceal=True)
    inp = WORK / f"ic_{tag}.h264"
    out = WORK / f"ic_{tag}.yuv"
    inp.write_bytes(data)
    subprocess.run([str(binary), str(inp), str(out)], check=True,
                   capture_output=True)
    blob = out.read_bytes()
    return [blob[i:i + frame] for i in range(0, len(blob), frame)]


@pytest.mark.parametrize("corrupt_at", [0.31, 0.55])
def test_intra_concealment_flag_p_loss_parity(corrupt_at):
    """intraConcealmentFlag does NOT change partial P-slice concealment
    (ConcealMb conceal.c:319-345 keys on the slice type): the flagged
    decoder must match the flag-poked reference on P losses."""
    data = bytearray(stream_path("640x360").read_bytes())
    pos = int(len(data) * corrupt_at)
    data[pos] ^= 0x5A
    data[pos + 1] ^= 0xC3
    data = bytes(data)

    _, cw, ch, _, _ = STREAMS["640x360"]
    frame = cw * ch * 3 // 2
    ref = _reference_flagged(data, frame, f"p{int(corrupt_at * 100)}")
    ours = _decode_flagged(data, frame, True)
    assert len(ours) == len(ref)
    n_diff = sum(a != b for a, b in zip(ours, ref))
    assert n_diff == 0, f"{n_diff}/{len(ref)} frames differ"


def test_intra_concealment_flag_whole_i_loss():
    """A fully lost I picture goes grey without the flag but copies the
    previous reference WITH it (h264bsdConceal conceal.c:146-157,
    :173-186) — verify the behavioral difference and parity with the
    flag-poked reference."""
    from h264bsd_tpu.utils.streamgen import make_intra_stress_stream

    base = make_intra_stress_stream(width_mbs=4, height_mbs=4, n_frames=4)
    p1 = base.find(b"\x00\x00\x01\x61")
    p2 = base.find(b"\x00\x00\x01\x61", p1 + 4)
    p3 = base.find(b"\x00\x00\x01\x61", p2 + 4)
    data = bytearray(base)
    at = p2 + (p3 - p2) // 4        # early in frame 2's slice data: the
    data[at] ^= 0x5A                # I-slice 10-MB backup loses every MB
    data[at + 1] ^= 0xC3
    data = bytes(data)

    frame = 4 * 4 * 256 * 3 // 2
    plain = _decode_flagged(data, frame, False)
    flagged = _decode_flagged(data, frame, True)
    assert len(plain) == len(flagged) == 4
    assert plain[2] != flagged[2]          # grey vs reference copy
    assert flagged[2] == flagged[1]        # the copied reference
    ref = _reference_flagged(data, frame, "whole_i")
    assert len(ref) == 4
    assert sum(a != b for a, b in zip(flagged, ref)) == 0
