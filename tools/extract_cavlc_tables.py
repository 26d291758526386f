#!/usr/bin/env python3
"""Reconstruct the canonical ITU-T H.264 CAVLC code tables (Table 9-5
coeff_token, Table 9-7/9-8 total_zeros, Table 9-10 run_before) in readable
(codeword, length) -> value form, and emit them as a C++ data header.

The constants are ITU-T standard tables; the reference decoder carries them
as packed branchy lookup tables (reference h264bsd_cavlc.c:79-319). This
script inverts those LUTs back into the canonical prefix-code lists so our
implementation is built from the spec's own representation. Run offline; the
generated header is committed.

Also exposes python reimplementations of the reference decode functions
(decode_coeff_token_ref etc.) used by tests for exhaustive equivalence checks.
"""

import re
import sys
from pathlib import Path

REF = Path("/root/reference/src/h264bsd_cavlc.c")


def parse_tables(text):
    tables = {}
    for m in re.finditer(
        r"static const (u8|u16) (\w+)\[(\d+)\] = \{([^;]*)\};", text, re.S
    ):
        _, name, size, body = m.groups()
        vals = [int(v, 16) for v in re.findall(r"0x([0-9a-fA-F]+)", body)]
        assert len(vals) == int(size), name
        tables[name] = vals
    return tables


T = parse_tables(REF.read_text())


def decode_coeff_token_ref(bits, nc):
    """Reference DecodeCoeffToken (h264bsd_cavlc.c:396-456), bits = 16 MSBs."""
    if 0 <= nc < 2:
        if bits >= 0x8000:
            return 0x0001
        if bits >= 0x0C00:
            return T["coeffToken0_0"][bits >> 10]
        if bits >= 0x0100:
            return T["coeffToken0_1"][bits >> 6]
        if bits >= 0x0020:
            return T["coeffToken0_2"][(bits >> 2) - 8]
        return T["coeffToken0_3"][bits]
    if 2 <= nc < 4:
        if bits >= 0x8000:
            return 0x0002 if bits & 0x4000 else 0x0822
        if bits >= 0x1000:
            return T["coeffToken2_0"][bits >> 10]
        if bits >= 0x0200:
            return T["coeffToken2_1"][bits >> 7]
        return T["coeffToken2_2"][bits >> 2]
    if 4 <= nc < 8:
        v = T["coeffToken4_0"][bits >> 10]
        return v if v else T["coeffToken4_1"][bits >> 6]
    if nc >= 8:
        return T["coeffToken8"][bits >> 10]
    # nc == -1 (chroma DC)
    v = T["coeffTokenMinus1_0"][bits >> 13]
    return v if v else T["coeffTokenMinus1_1"][bits >> 8]


def decode_total_zeros_ref(bits, total_coeff, is_chroma_dc):
    """Reference DecodeTotalZeros (h264bsd_cavlc.c:539-643), bits = 9 MSBs."""
    if not is_chroma_dc:
        tz = {
            2: ("totalZeros_2", 3), 3: ("totalZeros_3", 3),
            4: ("totalZeros_4", 4), 5: ("totalZeros_5", 4),
            6: ("totalZeros_6", 3), 7: ("totalZeros_7", 3),
            8: ("totalZeros_8", 3), 9: ("totalZeros_9", 3),
            10: ("totalZeros_10", 4), 11: ("totalZeros_11", 5),
            12: ("totalZeros_12", 5), 13: ("totalZeros_13", 6),
            14: ("totalZeros_14", 7),
        }
        if total_coeff == 1:
            v = T["totalZeros_1_0"][bits >> 4]
            return v if v else T["totalZeros_1_1"][bits]
        if total_coeff == 15:
            return 0x11 if (bits >> 8) else 0x01
        name, shift = tz[total_coeff]
        return T[name][bits >> shift]
    b = bits >> 6
    if b > 3:
        return 0x01
    if total_coeff == 3:
        return 0x11
    if b > 1:
        return 0x12
    if total_coeff == 2:
        return 0x22
    if b:
        return 0x23
    return 0x33


def decode_run_before_ref(bits, zeros_left):
    """Reference DecodeRunBefore (h264bsd_cavlc.c:661-722), bits = 11 MSBs."""
    rb = {1: ("runBefore_1", 10), 2: ("runBefore_2", 9), 3: ("runBefore_3", 9),
          4: ("runBefore_4", 8), 5: ("runBefore_5", 8), 6: ("runBefore_6", 8)}
    if zeros_left in rb:
        name, shift = rb[zeros_left]
        return T[name][bits >> shift]
    if bits >= 0x100:
        v = ((7 - (bits >> 8)) << 4) + 0x3
    elif bits >= 0x80:
        v = 0x74
    elif bits >= 0x40:
        v = 0x85
    elif bits >= 0x20:
        v = 0x96
    elif bits >= 0x10:
        v = 0xA7
    elif bits >= 0x8:
        v = 0xB8
    elif bits >= 0x4:
        v = 0xC9
    elif bits >= 0x2:
        v = 0xDA
    elif bits:
        v = 0xEB
    else:
        v = 0
    if ((v >> 4) & 0xF) > zeros_left:
        v = 0
    return v


def invert_coeff_token(nc):
    """LUT -> canonical list of (length, codeword, total_coeff, trailing_ones)."""
    seen = {}
    for bits in range(1 << 16):
        v = decode_coeff_token_ref(bits, nc)
        if not v:
            continue
        length = v & 0x1F
        tc = (v >> 11) & 0x1F
        t1 = (v >> 5) & 0x3F
        code = bits >> (16 - length)
        key = (length, code)
        prev = seen.get(key)
        assert prev is None or prev == (tc, t1), (nc, key, prev, (tc, t1))
        seen[key] = (tc, t1)
    return sorted((l, c, tc, t1) for (l, c), (tc, t1) in seen.items())


def invert_small(decode, nbits, arg):
    seen = {}
    for bits in range(1 << nbits):
        v = decode(bits, *arg)
        if not v:
            continue
        length = v & 0xF
        val = (v >> 4) & 0xF
        code = bits >> (nbits - length)
        key = (length, code)
        prev = seen.get(key)
        assert prev is None or prev == val, (arg, key, prev, val)
        seen[key] = val
    return sorted((l, c, v) for (l, c), v in seen.items())


def main():
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "h264bsd_tpu/frontend/csrc/cavlc_tables.h")

    lines = [
        "// Canonical ITU-T H.264 CAVLC prefix-code tables (Tables 9-5, 9-7,",
        "// 9-8, 9-10). Generated by tools/extract_cavlc_tables.py; entries are",
        "// {code_length_bits, codeword, value...}. Do not edit by hand.",
        "#pragma once",
        "#include <cstdint>",
        "namespace h264tpu {",
        "struct CoeffTokenCode { uint8_t len; uint16_t code; uint8_t total_coeff; uint8_t trailing_ones; };",
        "struct ShortCode { uint8_t len; uint16_t code; uint8_t value; };",
    ]

    # Table 9-5: coeff_token for the five nC classes
    classes = [("0", 0), ("2", 2), ("4", 4), ("8", 8), ("M1", -1)]
    for suffix, nc in classes:
        rows = invert_coeff_token(nc)
        lines.append(
            f"inline constexpr CoeffTokenCode kCoeffToken{suffix}[{len(rows)}] = {{")
        lines.append("    " + " ".join(
            f"{{{l},{c},{tc},{t1}}}," for l, c, tc, t1 in rows))
        lines.append("};")

    # Tables 9-7/9-8: total_zeros for totalCoeff 1..15 (luma) and 1..3 (chroma DC)
    for tc in range(1, 16):
        rows = invert_small(decode_total_zeros_ref, 9, (tc, False))
        lines.append(
            f"inline constexpr ShortCode kTotalZeros{tc}[{len(rows)}] = {{")
        lines.append("    " + " ".join(f"{{{l},{c},{v}}}," for l, c, v in rows))
        lines.append("};")
    for tc in range(1, 4):
        rows = invert_small(decode_total_zeros_ref, 9, (tc, True))
        lines.append(
            f"inline constexpr ShortCode kTotalZerosChromaDc{tc}[{len(rows)}] = {{")
        lines.append("    " + " ".join(f"{{{l},{c},{v}}}," for l, c, v in rows))
        lines.append("};")

    # Table 9-10: run_before for zerosLeft 1..6, plus the shared >6 code set
    # (zeros_left=14 disables the value<=zeros_left validity filter, which the
    # C++ decoder applies at decode time instead).
    for zl in range(1, 7):
        rows = invert_small(decode_run_before_ref, 11, (zl,))
        lines.append(f"inline constexpr ShortCode kRunBefore{zl}[{len(rows)}] = {{")
        lines.append("    " + " ".join(f"{{{l},{c},{v}}}," for l, c, v in rows))
        lines.append("};")
    rows = invert_small(decode_run_before_ref, 11, (14,))
    lines.append(f"inline constexpr ShortCode kRunBefore7Up[{len(rows)}] = {{")
    lines.append("    " + " ".join(f"{{{l},{c},{v}}}," for l, c, v in rows))
    lines.append("};")

    lines.append("}  // namespace h264tpu")
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
