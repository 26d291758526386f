"""Reader for the instrumented-reference trace format produced by
tools/make_ref_tracer.py. Used as a stage-level oracle: per-MB parsed state,
pixel-domain residuals, and pre-/post-deblock frames."""

from __future__ import annotations

import os
import struct
import subprocess
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .golden import REFERENCE, WORK, STREAMS, stream_path

TRACE_DIR = Path(os.environ.get("H264BSD_TRACE_DIR", "/tmp/ref_trace"))

# zigzag 4x4-block order -> raster within MB (reference neighbour.c:51-62)
ZIG2RAS = np.array([0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15])


@dataclass
class TraceMb:
    mb_num: int
    slice_id: int
    mb_type: int       # reference internal numbering (P_Skip=0..I_PCM=31)
    qp_y: int
    total_coeff: np.ndarray      # (27,) i16, zigzag block order
    intra4_modes: np.ndarray     # (16,) u8, zigzag
    ref_pic: np.ndarray          # (4,) u32 per 8x8
    mv: np.ndarray               # (16,2) i16, zigzag
    cbp: int
    qp_delta: int
    sub_types: np.ndarray        # (4,) u32
    ref_idx: np.ndarray          # (4,) u32
    levels: np.ndarray           # (26,16) i32 pixel-domain residual


@dataclass
class TracePicture:
    mbs: dict = field(default_factory=dict)   # mb_num -> TraceMb (last write)
    pre_deblock: bytes = b""
    post_deblock: bytes = b""
    poc: int = 0
    frame_num: int = 0
    is_idr: int = 0
    nal_ref_idc: int = 0


def build_tracer() -> Path:
    from .golden import _build_once

    TRACE_DIR.mkdir(parents=True, exist_ok=True)

    def _make(out: Path):
        subprocess.run(
            ["python", str(Path(__file__).parents[2] / "tools"
                           / "make_ref_tracer.py")],
            check=True)
        if out != TRACE_DIR / "trace_h264bsd":
            os.replace(TRACE_DIR / "trace_h264bsd", out)

    return _build_once(TRACE_DIR / "trace_h264bsd", _make)


def trace_stream(name: str) -> Path:
    """Run the instrumented reference over a bundled stream (cached)."""
    from .golden import _build_once

    def _run(out: Path):
        binary = build_tracer()
        env = dict(os.environ, TRACE_OUT=str(out))
        subprocess.run([str(binary), str(stream_path(name))], check=True,
                       env=env, capture_output=True)

    return _build_once(WORK / f"trace_{name}.bin", _run)


def read_trace(path: Path, max_pics: int | None = None,
               with_frames: bool = False) -> list[TracePicture]:
    pics = []
    cur = TracePicture()
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            (tag,) = struct.unpack("<I", raw)
            if tag == 1:
                mb_num, slice_id, mb_type, qp_y = struct.unpack("<4I", f.read(16))
                total_coeff = np.frombuffer(f.read(56), np.int16)[:27].copy()
                modes = np.frombuffer(f.read(16), np.uint8).copy()
                ref_pic = np.frombuffer(f.read(16), np.uint32).copy()
                mv = np.frombuffer(f.read(64), np.int16).reshape(16, 2).copy()
                cbp, qp_delta = struct.unpack("<Ii", f.read(8))
                sub_types = np.frombuffer(f.read(16), np.uint32).copy()
                ref_idx = np.frombuffer(f.read(16), np.uint32).copy()
                levels = np.frombuffer(f.read(4 * 26 * 16), np.int32)
                cur.mbs[mb_num] = TraceMb(mb_num, slice_id, mb_type, qp_y,
                                          total_coeff, modes, ref_pic, mv,
                                          cbp, qp_delta, sub_types, ref_idx,
                                          levels.reshape(26, 16).copy())
            elif tag in (2, 3):
                (n,) = struct.unpack("<I", f.read(4))
                data = f.read(n) if with_frames else (f.seek(n, 1), b"")[1]
                if tag == 2:
                    cur.pre_deblock = data
                else:
                    cur.post_deblock = data
            elif tag == 4:
                cur.poc, cur.frame_num, cur.is_idr, cur.nal_ref_idc = (
                    struct.unpack("<iIII", f.read(16)))
                pics.append(cur)
                cur = TracePicture()
                if max_pics is not None and len(pics) >= max_pics:
                    break
            else:
                raise ValueError(f"bad trace tag {tag}")
    return pics
