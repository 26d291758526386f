"""Build the host front-end shared library (g++ -O3 -shared).

Rebuilds automatically when the content of any csrc/ file changes (hash
sidecar, not mtimes — a fresh git checkout gives sources and a stale .so the
same timestamp). The library is written next to the sources as
libh264tpu_frontend.so; -march=native means the .so is machine-local and must
never be committed.
"""

from __future__ import annotations

import hashlib
import os
import platform
import subprocess
from contextlib import contextmanager
from pathlib import Path

CSRC = Path(__file__).parent / "csrc"
LIB = Path(__file__).parent / "libh264tpu_frontend.so"
STAMP = Path(__file__).parent / "libh264tpu_frontend.stamp"
LOCK = Path(__file__).parent / ".build.lock"


@contextmanager
def _exclusive_lock(path: Path):
    """Serialize concurrent builds (pytest-xdist workers import the
    package simultaneously; two g++ runs writing one .so corrupt it)."""
    import fcntl

    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)

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
    with _exclusive_lock(LOCK):
        # re-check under the lock: another process may have just built
        if (not force and LIB.exists() and STAMP.exists()
                and STAMP.read_text().strip() == fp):
            return LIB
        tmp = LIB.with_suffix(f".so.tmp{os.getpid()}")
        cmd = ["g++", *CXXFLAGS,
               *(str(s) for s in sources if s.suffix == ".cpp"),
               "-o", str(tmp)]
        subprocess.run(cmd, check=True)
        os.replace(tmp, LIB)   # atomic: loaders never see a partial .so
        STAMP.write_text(fp)
    return LIB


if __name__ == "__main__":
    build(force=True)
    print(f"built {LIB}")
