"""ctypes bindings for the native host runtime (native/zoic_host.cpp).

The library provides the C++ host-side runtime pieces: the lens-file
parser/cleanup (zoic.cpp:708-959 semantics) and double-precision reference
solvers.  Loading is lazy and optional — every entry point has a pure-Python
fallback, so the framework works without the compiled library; tests assert
native/Python agreement when it is present.

Build with ``make -C native`` (or :func:`build`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
LIB_PATH = os.path.join(_HERE, "native", "libzoic_host.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_ERRORS = {
    -1: "cannot open lens file",
    -2: "lens file contains no data rows",
    -3: "column count outside 4..5",
    -4: "ragged data row",
    -5: "multiple apertures found",
    -6: "element count exceeds capacity",
}


def build() -> bool:
    """Compile the library in place; returns success."""
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_HERE, "native")],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (once) and return the library, or None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(LIB_PATH) and not build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    d = ctypes.POINTER(ctypes.c_double)
    lib.zoic_parse_lens.restype = ctypes.c_int
    lib.zoic_parse_lens.argtypes = [
        ctypes.c_char_p, ctypes.c_int, d, d, d, d, d,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.zoic_trace_focal.restype = None
    lib.zoic_trace_focal.argtypes = [d, d, d, d, ctypes.c_int, d]
    lib.zoic_image_distance.restype = ctypes.c_double
    lib.zoic_image_distance.argtypes = [d, d, d, d, ctypes.c_int, ctypes.c_double]
    lib.zoic_rescale.restype = None
    lib.zoic_rescale.argtypes = [d, d, d, ctypes.c_int, ctypes.c_double]
    lib.zoic_host_abi_version.restype = ctypes.c_int
    if lib.zoic_host_abi_version() != 1:
        _load_failed = True
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def parse_lens(path: str, cap: int = 64):
    """Native parse+cleanup.  Returns (curv, thick, ior, abbe, ap,
    aperture_element) as float64 arrays, or raises on error / unavailable."""
    lib = load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    bufs = [np.zeros(cap, np.float64) for _ in range(5)]
    ap_el = ctypes.c_int(-1)
    n = lib.zoic_parse_lens(
        path.encode(), cap, *(_ptr(b) for b in bufs), ctypes.byref(ap_el)
    )
    if n < 0:
        raise ValueError(f"zoic_parse_lens: {_ERRORS.get(n, n)}")
    return tuple(b[:n].copy() for b in bufs) + (int(ap_el.value),)


def trace_focal(curv, thick, ior, ap) -> Tuple[float, float, float]:
    """Native double-precision focal probe: (focal, principal_plane,
    focal_point)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    arrs = [np.ascontiguousarray(a, np.float64) for a in (curv, thick, ior, ap)]
    out = np.zeros(3, np.float64)
    lib.zoic_trace_focal(*(_ptr(a) for a in arrs), len(arrs[0]), _ptr(out))
    return float(out[0]), float(out[1]), float(out[2])


def image_distance(curv, thick, ior, ap, object_distance: float) -> float:
    lib = load()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    arrs = [np.ascontiguousarray(a, np.float64) for a in (curv, thick, ior, ap)]
    return float(
        lib.zoic_image_distance(
            *(_ptr(a) for a in arrs), len(arrs[0]), float(object_distance)
        )
    )
