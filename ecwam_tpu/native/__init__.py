"""Native (C++) components, built on demand with the system toolchain.

The reference gets its native behavior from compiled Fortran + eccodes
(C); here the hot device path is XLA/Pallas and the host-side codecs are
C++ compiled at first use (g++ -O2 -shared) and cached next to the
source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_CACHE: dict = {}


def load(name: str) -> ctypes.CDLL:
    """Compile (if stale) and dlopen the shared library for ``name``.cc."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = os.path.join(_DIR, f"{name}.cc")
        so = os.path.join(_DIR, f"_{name}.so")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   "-o", so + ".tmp", src]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
        _CACHE[name] = lib
        return lib
