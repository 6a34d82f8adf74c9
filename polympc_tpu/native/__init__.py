"""Native (C++) host-side components.

The TPU compute path is JAX/XLA/Pallas; components whose algorithms are
fundamentally host-shaped (data-dependent control flow, tiny problems,
sequential pivoting) live here as C++ shared libraries compiled on first use
with the system toolchain and called through ctypes:

  * ``qpmad.cpp`` — dense Goldfarb-Idnani dual active-set QP solver, the
    analogue of the reference's QPMAD interface
    (src/solvers/qpmad_interface.hpp:18-126).

Build artifacts are cached next to the sources keyed by a source hash, so a
source edit triggers a rebuild and a stale .so is never loaded.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL] = {}


class NativeBuildError(RuntimeError):
    pass


def load_native(name: str) -> ctypes.CDLL:
    """Compile (if needed) and load ``<name>.cpp`` as a shared library."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, f"{name}.cpp")
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_DIR, f"_{name}_{digest}.so")
        if not os.path.exists(so):
            tmp = so + f".tmp{os.getpid()}"
            cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                   "-fPIC", "-o", tmp, src]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               text=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                detail = getattr(e, "stderr", str(e))
                raise NativeBuildError(
                    f"building {name}.cpp failed: {detail}") from e
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        _LIBS[name] = lib
        return lib
