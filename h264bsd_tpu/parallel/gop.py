"""GOP-parallel decoding — SURVEY.md §2.4's pipeline-parallel analogue.

An IDR picture fully resets the DPB (reference decoder.c:343-389 flush
logic), so closed GOPs (IDR .. next IDR) are independent decode units. The
stream is split at its IDR boundaries on the host (cheap NAL scan), each
GOP is decoded by its own decoder instance whose device arrays live on a
different chip of the mesh, and outputs are re-concatenated in stream
order. The bundled streams use keyint=40, giving one GOP boundary roughly
every 1.6 s of video.

Every GOP re-activates parameter sets, so each split segment is prefixed
with the stream's SPS/PPS NAL units.
"""

from __future__ import annotations

import re

import jax

from ..models.decoder import Decoder, PIC_RDY, ERROR


def _nal_positions(data: bytes):
    """(offset, nal_type) for every Annex-B start code."""
    out = []
    for m in re.finditer(b"\x00\x00\x01", data):
        pos = m.start()
        if pos + 3 < len(data):
            out.append((pos, data[pos + 3] & 0x1F))
    return out


def split_gops(data: bytes):
    """Split an Annex-B stream into independently decodable segments:
    [param sets + GOP] per IDR. Returns a list of byte strings."""
    nals = _nal_positions(data)
    # prefix: every SPS/PPS before the first IDR
    header = b""
    idr_starts = []
    for pos, t in nals:
        if t == 5 and (not idr_starts or pos > idr_starts[-1]):
            idr_starts.append(pos)
    if not idr_starts:
        return [data]
    # find where the header (SPS/PPS before first IDR) begins/ends
    first_idr = idr_starts[0]
    header = data[:first_idr]
    segments = []
    for i, start in enumerate(idr_starts):
        end = idr_starts[i + 1] if i + 1 < len(idr_starts) else len(data)
        seg = data[start:end]
        segments.append(header + seg if i > 0 else data[:end])
    return segments


def decode_stream_gop_parallel(data: bytes, devices=None):
    """Decode GOPs concurrently across devices; yields output pictures in
    stream order. Dispatches every GOP's device work before draining any
    results, so chips run concurrently (async dispatch)."""
    devices = devices or jax.devices()
    segments = split_gops(data)

    per_gop = []
    for i, seg in enumerate(segments):
        dev = devices[i % len(devices)]
        with jax.default_device(dev):
            dec = Decoder()
            pics = []
            pos = 0
            while pos < len(seg):
                status, read = dec.decode(seg[pos:], pic_id=len(pics))
                pos += read
                if status == PIC_RDY:
                    while (pic := dec.next_output_picture()) is not None:
                        pics.append(pic)
                elif status >= ERROR and read == 0:
                    break
            per_gop.append(pics)

    for pics in per_gop:
        yield from pics
