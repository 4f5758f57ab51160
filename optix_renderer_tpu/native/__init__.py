"""Native (C++) runtime components, loaded via ctypes.

The accelerator compute path is JAX/XLA/Pallas; host-side scene-compile work
that the reference does in C++ (TBB-parallel BVH build, bvh.cpp:36-120) is
C++ here too. Libraries are compiled on demand with g++ and cached next to
the sources; every consumer falls back to its numpy reference implementation
when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict[str, object] = {}


def _build_and_load(name: str, extra_flags=()):
    """Compile {name}.cpp → lib{name}.so (cached by mtime) and dlopen it.
    Returns None when compilation fails (callers fall back to numpy)."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        so = os.path.join(_DIR, f"lib{name}.so")
        lib = None
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                cmd = [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-fopenmp", "-o", so, src, *extra_flags,
                ]
                r = subprocess.run(cmd, capture_output=True, timeout=120)
                if r.returncode != 0:  # retry without OpenMP
                    cmd = [c for c in cmd if c != "-fopenmp"]
                    r = subprocess.run(cmd, capture_output=True, timeout=120)
                    r.check_returncode()
            lib = ctypes.CDLL(so)
        except Exception:
            lib = None
        _LIBS[name] = lib
        return lib
