"""Build the host front-end shared library (g++ -O3 -shared).

Rebuilds automatically when any csrc/ file is newer than the .so. The library
is written next to the sources as libh264tpu_frontend.so.
"""

from __future__ import annotations

import subprocess
from pathlib import Path

CSRC = Path(__file__).parent / "csrc"
LIB = Path(__file__).parent / "libh264tpu_frontend.so"

CXXFLAGS = [
    "-std=c++17", "-O3", "-march=native", "-fPIC", "-shared", "-Wall", "-Wextra",
    "-Wno-unused-parameter",
]


def build(force: bool = False) -> Path:
    sources = sorted(CSRC.glob("*.cpp"))
    headers = sorted(CSRC.glob("*.h"))
    newest_src = max(p.stat().st_mtime for p in sources + headers)
    if not force and LIB.exists() and LIB.stat().st_mtime >= newest_src:
        return LIB
    cmd = ["g++", *CXXFLAGS, *(str(s) for s in sources), "-o", str(LIB)]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    build(force=True)
    print(f"built {LIB}")
