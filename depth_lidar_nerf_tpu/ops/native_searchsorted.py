"""ctypes binding for the native C++ searchsorted parity kernel.

Companion of the reference's vendored ``torchsearchsorted`` extension
(``torchsearchsorted/src/torchsearchsorted/searchsorted.py:20-53`` dispatch +
shape checks). Builds ``native/libsearchsorted.so`` on first use via make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libsearchsorted.so"))
    if not os.path.exists(so):
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    for name, ctype in (("searchsorted_f32", ctypes.c_float),
                        ("searchsorted_f64", ctypes.c_double)):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [
            ctypes.POINTER(ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctype), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
    _LIB = lib
    return lib


def searchsorted_native(a: np.ndarray, v: np.ndarray,
                        side: str = "left") -> np.ndarray:
    """Row-wise searchsorted with row broadcasting, numpy contract.

    ``a [Ba, A]`` sorted rows, ``v [Bv, V]`` -> int64 ``[max(Ba,Bv), V]``.
    One of Ba/Bv may be 1 (broadcast), mirroring the reference wrapper's rule
    (``searchsorted.py:28-35``).
    """
    if side not in ("left", "right"):
        raise ValueError(f"side must be left or right, got {side!r}")
    a = np.ascontiguousarray(a)
    v = np.ascontiguousarray(v)
    if a.ndim != 2 or v.ndim != 2:
        raise ValueError("a and v must be 2-D")
    if a.shape[0] != v.shape[0] and 1 not in (a.shape[0], v.shape[0]):
        raise ValueError(
            f"row counts must match or broadcast: {a.shape[0]} vs {v.shape[0]}")
    if a.dtype == np.float32 and v.dtype == np.float32:
        fn_name = "searchsorted_f32"
        ctype = ctypes.c_float
    else:
        a = a.astype(np.float64)
        v = v.astype(np.float64)
        fn_name = "searchsorted_f64"
        ctype = ctypes.c_double

    rows = max(a.shape[0], v.shape[0])
    out = np.empty((rows, v.shape[1]), np.int64)
    lib = _load()
    getattr(lib, fn_name)(
        a.ctypes.data_as(ctypes.POINTER(ctype)), a.shape[0], a.shape[1],
        v.ctypes.data_as(ctypes.POINTER(ctype)), v.shape[0], v.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1 if side == "right" else 0,
    )
    return out
