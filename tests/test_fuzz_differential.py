"""Randomized differential fuzzing vs the reference decoder.

Seeded random byte corruptions of the bundled 640x360 stream are fed to
both decoders; every output picture must match byte-exactly. This drives
arbitrary combinations of the error-resilience machinery (corrupted-slice
unmarking, concealment, AUB recovery, frame_num gaps — SURVEY.md §5) that
the hand-picked corruption tests cannot enumerate.

Guard: some corruptions make the reference read memory it never wrote
(e.g. pictures synthesized for frame_num gaps are uninitialized malloc in
the reference, dpb.c:1218-1330). The reference is run twice; if its own
two outputs differ the stream exercises undefined behaviour and the seed
is skipped rather than compared against garbage.
"""

import subprocess

import numpy as np
import pytest

from h264bsd_tpu.models.decoder import decode_stream
from h264bsd_tpu.utils.golden import (STREAMS, WORK, resilient_binary,
                                      stream_path)

FRAME = STREAMS["640x360"][1] * STREAMS["640x360"][2] * 3 // 2


def reference_decode(data: bytes, tag: str) -> list[bytes]:
    binary = resilient_binary()
    inp = WORK / f"fuzz_{tag}.h264"
    out = WORK / f"fuzz_{tag}.yuv"
    inp.write_bytes(data)
    subprocess.run([str(binary), str(inp), str(out)], check=True,
                   capture_output=True, timeout=120)
    blob = out.read_bytes()
    return [blob[i:i + FRAME] for i in range(0, len(blob), FRAME)]


@pytest.mark.parametrize("seed", range(12))
def test_random_corruption_parity(seed):
    rng = np.random.default_rng(seed)
    data = bytearray(stream_path("640x360").read_bytes())
    # 1-4 byte flips anywhere past the initial SPS/PPS headers
    for _ in range(int(rng.integers(1, 5))):
        pos = int(rng.integers(300, len(data)))
        data[pos] ^= int(rng.integers(1, 256))
    data = bytes(data)

    try:
        ref = reference_decode(data, f"s{seed}a")
        ref2 = reference_decode(data, f"s{seed}b")
    except subprocess.CalledProcessError:
        pytest.skip("reference binary itself fails on this corruption")
    if ref != ref2:
        pytest.skip("reference output nondeterministic (reads memory it "
                    "never wrote) — no oracle for this seed")

    ours = [pic.yuv_bytes()[:FRAME] for pic in decode_stream(data)]
    assert len(ours) == len(ref), (len(ours), len(ref))
    for i, (a, b) in enumerate(zip(ours, ref)):
        if a != b:
            d = np.frombuffer(a, np.uint8).astype(int) - \
                np.frombuffer(b, np.uint8).astype(int)
            raise AssertionError(
                f"seed {seed} frame {i}: {np.count_nonzero(d)} differing "
                f"bytes, max |diff| {np.abs(d).max()}")
