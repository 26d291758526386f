"""GOP-parallel decoding — SURVEY.md §2.4's pipeline-parallel analogue.

An IDR picture fully resets the DPB (reference decoder.c:343-389 flush
logic), so closed GOPs (IDR .. next IDR) are independent decode units. The
stream is split at its IDR *picture* boundaries on the host (cheap NAL
scan + first_mb_in_slice peek, mirroring the access-unit-boundary rule of
h264bsdCheckAccessUnitBoundary storage.c:593: a new picture starts at the
slice with first_mb_in_slice == 0 — an IDR picture coded as several slices
stays in one segment). Each GOP is decoded by its own decoder instance
whose device arrays live on a different chip of the mesh, GOPs decode
concurrently on parse threads (the C++ front-end releases the GIL), and
outputs are re-concatenated in stream order. The bundled streams use
keyint=40, giving one GOP boundary roughly every 1.6 s of video.

Every GOP re-activates parameter sets, so each split segment is prefixed
with the stream's SPS/PPS NAL units.

Memory: each worker holds at most one GOP's decoded pictures, DETACHED
from the DPB ring (one frame of device memory per picture, not one ring
snapshot — OutputPicture.detach); outputs stream out per completed GOP in
stream order. Streams without IDR pictures don't split (one segment) —
use parallel.framepipe for the cross-device DPB-handoff decode of
GOP-less IPPP streams (BASELINE config 4).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import jax

from ..models.decoder import ERROR, PIC_RDY, Decoder


def _nal_positions(data: bytes):
    """(payload_offset, start_offset, nal_type) for every Annex-B start
    code; start_offset includes the zero bytes of 3- AND 4-byte start
    codes (h264bsdExtractNalUnit byte_stream.c:108-129 skips any number
    of leading zeros)."""
    out = []
    pos = 0
    while (pos := data.find(b"\x00\x00\x01", pos)) != -1:
        start = pos
        while start > 0 and data[start - 1] == 0:
            start -= 1
        if pos + 3 < len(data):
            out.append((pos + 3, start, data[pos + 3] & 0x1F))
        pos += 3
    return out


def _first_mb_is_zero(data: bytes, payload_off: int) -> bool:
    """True when the slice NAL at payload_off has first_mb_in_slice == 0:
    ue(v) == 0 is the single bit '1', so the first slice-header bit (MSB
    of the byte after the one-byte NAL header) decides."""
    hdr = payload_off + 1
    return hdr < len(data) and (data[hdr] & 0x80) != 0


def split_gops(data: bytes):
    """Split an Annex-B stream into independently decodable segments:
    [param sets + GOP] per IDR *picture*. Returns a list of byte strings.

    Only an IDR slice that starts a new access unit (first_mb_in_slice ==
    0, the storage.c:593 boundary rule restricted to IDR) AND is a primary
    coded picture (redundant_pic_cnt == 0 — a redundant IDR slice repeats
    the picture it follows, reference CheckRedundantPicCnt
    slice_header.c:1239) opens a segment, so multi-slice IDR pictures and
    redundant IDR copies are never torn apart. The redundant check uses
    the C++ front-end's exact header peek, tracking SPS/PPS as the scan
    encounters them; when the peek is undecidable (slice references a PPS
    the stream never sent) the first-header-bit heuristic decides."""
    from ..frontend import binding as fe_bind

    nals = _nal_positions(data)
    peek = fe_bind.FrontendDecoder(no_output_reordering=True)
    idr_starts = []
    try:
        for i, (payload, start, t) in enumerate(nals):
            end = nals[i + 1][1] if i + 1 < len(nals) else len(data)
            if t in (7, 8):          # SPS/PPS: feed the peek registry
                # loop until the chunk is fully consumed — a partial
                # consume would silently drop the parameter set and
                # degrade the IDR peek to the first-header-bit
                # heuristic, which can't detect redundant IDR slices
                p = start
                while p < end:
                    _, read = peek.decode(data[p:end], 0)
                    if read == 0:
                        break
                    p += read
            elif t == 5:
                r = peek.peek_idr_boundary(data[start:end])
                opens = (r == 1) if r >= 0 else \
                    _first_mb_is_zero(data, payload)
                if opens:
                    idr_starts.append(start)
    finally:
        peek.close()
    if not idr_starts:
        return [data]
    # prefix: everything before the first IDR picture (SPS/PPS/SEI)
    header = data[:idr_starts[0]]
    segments = []
    for i, start in enumerate(idr_starts):
        end = idr_starts[i + 1] if i + 1 < len(idr_starts) else len(data)
        seg = data[start:end]
        segments.append(header + seg if i > 0 else data[:end])
    return segments


def _decode_segment(seg: bytes, dev):
    with jax.default_device(dev):
        dec = Decoder()
        pics = []
        pos = 0
        while pos < len(seg):
            status, read = dec.decode(seg[pos:], pic_id=len(pics))
            pos += read
            if status == PIC_RDY:
                while (pic := dec.next_output_picture()) is not None:
                    # detach: holding raw OutputPictures would pin one
                    # DPB-ring snapshot EACH (~40 ring versions for a
                    # 40-frame 1080p GOP, ~2 GB); detached pictures hold
                    # one frame's planes only
                    pics.append(pic.detach())
            elif status >= ERROR and read == 0:
                break
        dec.close()
        return pics


def decode_stream_gop_parallel(data: bytes, devices=None, threads=None):
    """Decode GOPs concurrently across devices; yields output pictures in
    stream order. Each GOP runs on its own thread (host parse is C++ with
    the GIL released; device work is async-dispatched per chip), so GOP i+1
    parses while GOP i's frames reconstruct. Results stream out in order
    as each earliest-pending GOP completes."""
    devices = devices or jax.devices()
    segments = split_gops(data)
    n_workers = threads or min(len(segments), max(2 * len(devices), 4))

    with ThreadPoolExecutor(max_workers=n_workers) as pool:
        futures = [pool.submit(_decode_segment, seg, devices[i % len(devices)])
                   for i, seg in enumerate(segments)]
        for fut in futures:
            yield from fut.result()
