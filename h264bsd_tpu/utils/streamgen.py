"""Minimal H.264 Baseline bitstream builder for targeted conformance tests.

Builds tiny legal streams the bundled clips cannot provide — e.g. a
low-QP I-frame whose CAVLC levels exceed the int8 range of the transfer
blob (the wide-escape path of FrameTensors::build_blob). The output is
validated against the reference decoder binary, not against this
framework, so tests using it are a true end-to-end oracle.

Syntax references: ITU-T H.264 §7.3 (RBSP syntax) and §9.1/9.2 (Exp-
Golomb, CAVLC); behavioral anchors in the reference tree are the parsers
these bits must round-trip through (h264bsd_seq_param_set.c,
h264bsd_pic_param_set.c, h264bsd_slice_header.c, h264bsd_cavlc.c).
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit writer with Exp-Golomb helpers."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def ue(self, value: int):
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)
        return self

    def se(self, value: int):
        code = 2 * value - 1 if value > 0 else -2 * value
        return self.ue(code)

    def rbsp_trailing(self):
        self.u(1, 1)
        while len(self.bits) % 8:
            self.u(0, 1)
        return self

    def bytes_rbsp(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (00 00 0x -> 00 00 03 0x)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _nal(nal_header: int, payload: BitWriter) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([nal_header]) + \
        _ebsp(payload.rbsp_trailing().bytes_rbsp())


def _sps(width_mbs: int, height_mbs: int) -> bytes:
    w = BitWriter()
    w.u(66, 8)          # profile_idc baseline
    w.u(0, 8)           # constraint flags + reserved
    w.u(10, 8)          # level_idc
    w.ue(0)             # seq_parameter_set_id
    w.ue(0)             # log2_max_frame_num_minus4
    w.ue(2)             # pic_order_cnt_type
    w.ue(1)             # max_num_ref_frames
    w.u(0, 1)           # gaps_in_frame_num_value_allowed
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)           # frame_mbs_only_flag
    w.u(0, 1)           # direct_8x8_inference
    w.u(0, 1)           # frame_cropping_flag
    w.u(0, 1)           # vui_parameters_present
    return _nal(0x67, w)


def _pps(init_qp: int) -> bytes:
    w = BitWriter()
    w.ue(0)             # pic_parameter_set_id
    w.ue(0)             # seq_parameter_set_id
    w.u(0, 1)           # entropy_coding_mode (CAVLC)
    w.u(0, 1)           # bottom_field_pic_order_in_frame_present
    w.ue(0)             # num_slice_groups_minus1
    w.ue(0)             # num_ref_idx_l0_default_active_minus1
    w.ue(0)             # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)           # weighted_pred_flag
    w.u(0, 2)           # weighted_bipred_idc
    w.se(init_qp - 26)  # pic_init_qp_minus26
    w.se(0)             # pic_init_qs_minus26
    w.se(0)             # chroma_qp_index_offset
    w.u(0, 1)           # deblocking_filter_control_present
    w.u(0, 1)           # constrained_intra_pred
    w.u(0, 1)           # redundant_pic_cnt_present
    return _nal(0x68, w)


# CAVLC encodings used below (spec tables 9-5/9-7/9-8; the framework's
# flat LUTs in cavlc_tables.h decode these exact strings):
_COEFF_TOKEN_TC0_NC02 = (1, 1)          # TotalCoeff 0, nC in 0..2: "1"
_COEFF_TOKEN_TC1_T10_NC02 = (0b000101, 6)  # TotalCoeff 1, T1s 0: "000101"
_TOTAL_ZEROS_0_TC1 = (1, 1)             # total_zeros 0, TotalCoeff 1: "1"


def _write_level(w: BitWriter, level: int):
    """Encode one coefficient level with suffixLength 0 (first level of a
    block with no trailing ones, spec 9.2.2.1; the decoder adds 2 to the
    first levelCode when trailingOnes < 3, so that bias is subtracted
    here)."""
    code = (2 * level - 2 if level > 0 else -2 * level - 1) - 2
    if code < 14:
        w.u(0, code).u(1, 1)                  # level_prefix = code
    elif code < 30:
        w.u(0, 14).u(1, 1).u(code - 14, 4)    # prefix 14 + 4-bit suffix
    else:
        assert code - 30 < (1 << 12), "level out of suffixLength-0 range"
        w.u(0, 15).u(1, 1).u(code - 30, 12)   # prefix 15 + 12-bit suffix


def _i4_mb(w: BitWriter, dc_level: int):
    """One I_4x4 macroblock: predicted modes everywhere, luma CBP group 0
    coded; block 0 carries a single DC coefficient `dc_level`, blocks
    1-3 are empty. No chroma residual."""
    w.ue(0)                                   # mb_type I_4x4
    for _ in range(16):
        w.u(1, 1)                             # prev_intra4x4_pred_mode_flag
    w.ue(0)                                   # intra_chroma_pred_mode DC
    # coded_block_pattern me(v): cbp 1 (luma 8x8 group 0, no chroma).
    # Spec table 9-4 intra column: cbp 1 <-> codeNum 29.
    w.ue(29)
    w.se(0)                                   # mb_qp_delta

    # block 0 (nC = 0): one coefficient at scan position 0
    w.u(*_COEFF_TOKEN_TC1_T10_NC02)
    _write_level(w, dc_level)
    w.u(*_TOTAL_ZEROS_0_TC1)
    # blocks 1-3 (nC contexts 1, 1, 0): TotalCoeff 0
    for _ in range(3):
        w.u(*_COEFF_TOKEN_TC0_NC02)


def make_lowqp_i_stream(dc_level: int = 200, qp: int = 2) -> bytes:
    """A one-macroblock (16x16) IDR stream at low QP whose single luma
    coefficient is `dc_level` — large enough to exercise the wide-level
    escape of the transfer blob while keeping the IDCT inside the
    reference's [-512,511] range validation."""
    w = BitWriter()
    w.ue(0)             # first_mb_in_slice
    w.ue(7)             # slice_type I (all slices)
    w.ue(0)             # pic_parameter_set_id
    w.u(0, 4)           # frame_num (log2_max_frame_num = 4)
    w.ue(0)             # idr_pic_id
    w.u(0, 1)           # no_output_of_prior_pics_flag
    w.u(0, 1)           # long_term_reference_flag
    w.se(0)             # slice_qp_delta
    _i4_mb(w, dc_level)
    return _sps(1, 1) + _pps(qp) + _nal(0x65, w)
