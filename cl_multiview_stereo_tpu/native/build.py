"""Build the native loader shared library (g++, libpng/libjpeg/zlib).

Compiled lazily on first use; rebuilt when the source is newer than the
``.so``.  No pip/pybind involved — plain C ABI consumed via ctypes.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "loader.cc")
LIB = os.path.join(_DIR, "libmvsloader.so")


def ensure_built(quiet: bool = True) -> str:
    """Compile if missing/stale; returns the .so path."""
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= os.path.getmtime(SRC):
        return LIB
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", SRC,
        "-o", LIB, "-lpng", "-ljpeg", "-lz", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=quiet)
    return LIB
