"""Golden-oracle utilities: build the reference decoder under /tmp and produce
golden YUV dumps for the bundled test streams.

The reference posix test app (reference posix/test_h264bsd.c:46-60) writes
``cropped_width * cropped_height * 3/2`` bytes per picture taken from the START
of the *uncropped* picture buffer (whose luma plane is coded_width x
coded_height, e.g. 640x368 for the 640x360 stream). The golden files are
therefore truncated raw buffers, not valid planar YUV at the cropped size.
``truncate_frame`` reproduces that exact quirk so byte-compares match.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

REFERENCE = Path(os.environ.get("H264BSD_REFERENCE", "/root/reference"))
WORK = Path(os.environ.get("H264BSD_GOLDEN_DIR", "/tmp/h264bsd_golden"))

STREAMS = {
    "640x360": ("test_640x360.h264", 640, 360, 640, 368),
    "1920x1080": ("test_1920x1080.h264", 1920, 1080, 1920, 1088),
    "1920x1080_fullRange": ("test_1920x1080_fullRange.h264", 1920, 1080, 1920, 1088),
}


def reference_binary() -> Path:
    """Build the reference test binary (once) into WORK and return its path."""
    WORK.mkdir(parents=True, exist_ok=True)
    binary = WORK / "test_h264bsd"
    if not binary.exists():
        srcs = sorted(str(p) for p in (REFERENCE / "src").glob("*.c"))
        srcs.append(str(REFERENCE / "posix" / "test_h264bsd.c"))
        subprocess.run(
            ["gcc", "-O3", "-std=gnu99", f"-I{REFERENCE}/src", *srcs, "-o", str(binary)],
            check=True,
        )
    return binary


def stream_path(name: str) -> Path:
    return REFERENCE / "test" / STREAMS[name][0]


def golden_yuv(name: str) -> Path:
    """Golden YUV dump (truncated-frame format, see module docstring)."""
    out = WORK / f"golden_{name}.yuv"
    if not out.exists():
        binary = reference_binary()
        subprocess.run(
            [str(binary), "-o", str(out), str(stream_path(name))],
            check=True, capture_output=True,
        )
    return out


def golden_frames(name: str) -> list[bytes]:
    """Golden output pictures as a list of per-frame byte strings."""
    _, cw, ch, _, _ = STREAMS[name]
    frame_size = cw * ch * 3 // 2
    data = golden_yuv(name).read_bytes()
    assert len(data) % frame_size == 0, (len(data), frame_size)
    return [data[i : i + frame_size] for i in range(0, len(data), frame_size)]


def truncate_frame(uncropped_yuv: bytes, name: str) -> bytes:
    """Reproduce the reference test app's dump quirk: first cropped-size bytes
    of the uncropped picture buffer (reference posix/test_h264bsd.c:55-59)."""
    _, cw, ch, _, _ = STREAMS[name]
    return uncropped_yuv[: cw * ch * 3 // 2]
