"""SEI message decoding: the reference carries a full SEI parser as dead
code (h264bsd_sei.c is never called; decoder.c:464-466 skips the NAL).
The rebuild queues SEI payloads in the front-end and decodes them
host-side — these tests pin the message parsing and that SEI NALs leave
stream decoding untouched (reference-equivalent skip)."""

import numpy as np

from h264bsd_tpu.frontend.sei import parse_sei_rbsp
from h264bsd_tpu.models.decoder import Decoder
from h264bsd_tpu.utils.golden import stream_path


class BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def payload_bytes(self):
        bits = self.bits[:]
        if len(bits) % 8:
            # payloads are byte-aligned with stop-bit padding
            bits.append(1)
            while len(bits) % 8:
                bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def sei_rbsp(*messages):
    """messages: (payload_type, payload_bytes) -> RBSP with framing +
    trailing bits."""
    out = bytearray()
    for ptype, payload in messages:
        while ptype >= 255:
            out.append(255)
            ptype -= 255
        out.append(ptype)
        size = len(payload)
        while size >= 255:
            out.append(255)
            size -= 255
        out.append(size)
        out.extend(payload)
    out.append(0x80)  # rbsp trailing bits
    return bytes(out)


def test_recovery_point_and_user_data():
    w = BitWriter()
    w.ue(12)          # recovery_frame_cnt
    w.u(1, 1)         # exact_match
    w.u(0, 1)         # broken_link
    w.u(2, 2)         # changing_slice_group_idc
    rp = w.payload_bytes()
    uuid = bytes(range(16))
    ud = uuid + b"hello-sei"
    msgs = parse_sei_rbsp(sei_rbsp((6, rp), (5, ud)))
    assert [m.payload_type for m in msgs] == [6, 5]
    assert msgs[0].fields == {"recovery_frame_cnt": 12,
                              "exact_match_flag": True,
                              "broken_link_flag": False,
                              "changing_slice_group_idc": 2}
    assert msgs[1].fields["uuid"] == uuid
    assert msgs[1].fields["data"] == b"hello-sei"


def test_pan_scan_and_scene_info():
    w = BitWriter()
    w.ue(3)           # pan_scan_rect_id
    w.u(0, 1)         # cancel
    w.ue(0)           # cnt-1 -> 1 rect
    for off in (-2, 2, -4, 4):
        # se(v): positive v -> code 2v-1, non-positive -> -2v
        w.ue(2 * off - 1 if off > 0 else -2 * off)
    w.ue(1)           # repetition period
    ps = w.payload_bytes()

    w2 = BitWriter()
    w2.u(1, 1)        # scene_info_present
    w2.ue(7)          # scene_id
    w2.ue(0)          # transition type
    si = w2.payload_bytes()
    msgs = parse_sei_rbsp(sei_rbsp((2, ps), (9, si)))
    assert msgs[0].name == "pan_scan_rect"
    assert msgs[0].fields["rects"] == [
        {"left": -2, "right": 2, "top": -4, "bottom": 4}]
    assert msgs[1].fields == {"scene_info_present_flag": True,
                              "scene_id": 7, "scene_transition_type": 0}


def test_unknown_type_kept_raw():
    msgs = parse_sei_rbsp(sei_rbsp((200, b"\x01\x02\x03")))
    assert msgs[0].name == "reserved_200"
    assert msgs[0].payload == b"\x01\x02\x03"


def test_sei_in_stream_ignored_and_surfaced():
    """Prepend an SEI NAL to the bundled stream: decoding must stay
    byte-identical to the reference behavior (NAL skipped) while the
    message is surfaced through the API."""
    w = BitWriter()
    w.ue(5)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 2)
    payload = w.payload_bytes()
    nal = b"\x00\x00\x00\x01\x06" + sei_rbsp((6, payload))
    data = nal + stream_path("640x360").read_bytes()

    dec = Decoder()
    pos = 0
    pics = 0
    seen = []
    while pos < len(data):
        status, read = dec.decode(data[pos:], pic_id=pics)
        pos += read
        if status == 1:      # PIC_RDY
            while dec.next_output_picture() is not None:
                pics += 1
        seen.extend(dec.take_sei_messages())
        if status >= 3 and read == 0:
            break
        if pics >= 3:
            break
    assert pics >= 3         # decoding proceeded normally past the SEI
    assert any(m.payload_type == 6 and
               m.fields.get("recovery_frame_cnt") == 5 for m in seen)
