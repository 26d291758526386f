"""Build the host front-end shared library (g++ -O3 -shared).

Rebuilds automatically when the content of any csrc/ file changes (hash
sidecar, not mtimes — a fresh git checkout gives sources and a stale .so the
same timestamp). The library is written next to the sources as
libh264tpu_frontend.so; -march=native means the .so is machine-local and must
never be committed.
"""

from __future__ import annotations

import hashlib
import platform
import subprocess
from pathlib import Path

CSRC = Path(__file__).parent / "csrc"
LIB = Path(__file__).parent / "libh264tpu_frontend.so"
STAMP = Path(__file__).parent / "libh264tpu_frontend.stamp"

CXXFLAGS = [
    "-std=c++17", "-O3", "-march=native", "-fPIC", "-shared", "-Wall", "-Wextra",
    "-Wno-unused-parameter",
]


def _fingerprint(sources: list[Path]) -> str:
    h = hashlib.sha256()
    h.update(" ".join(CXXFLAGS).encode())
    h.update(platform.machine().encode() + platform.node().encode())
    for p in sources:
        h.update(p.name.encode())
        h.update(p.read_bytes())
    return h.hexdigest()


def build(force: bool = False) -> Path:
    sources = sorted(CSRC.glob("*.cpp")) + sorted(CSRC.glob("*.h"))
    fp = _fingerprint(sources)
    if (not force and LIB.exists() and STAMP.exists()
            and STAMP.read_text().strip() == fp):
        return LIB
    cmd = ["g++", *CXXFLAGS, *(str(s) for s in sources if s.suffix == ".cpp"),
           "-o", str(LIB)]
    subprocess.run(cmd, check=True)
    STAMP.write_text(fp)
    return LIB


if __name__ == "__main__":
    build(force=True)
    print(f"built {LIB}")
