"""ctypes loader for the native data-path library (gsv_native.cpp).

Builds the shared object on first use (g++ -O3, cached next to the source)
and degrades gracefully: every consumer falls back to the pure-Python
implementation when the toolchain or zlib is unavailable, so the framework
never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gsv_native.cpp")
_SO = os.path.join(_DIR, "libgsv_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


class GsvPlyInfo(ctypes.Structure):
    _fields_ = [
        ("n_vertices", ctypes.c_int64),
        ("n_props", ctypes.c_int32),
        ("sh_rest", ctypes.c_int32),
        ("header_bytes", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-lz", "-o", _SO,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.gsv_ply_inspect.restype = ctypes.c_int
    lib.gsv_ply_inspect.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(GsvPlyInfo),
        ctypes.c_char_p,
        ctypes.c_int32,
    ]
    lib.gsv_ply_load.restype = ctypes.c_int
    lib.gsv_ply_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gsv_write_png_rgb8.restype = ctypes.c_int
    lib.gsv_write_png_rgb8.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
    ]
    lib.gsv_write_png_gray16.restype = ctypes.c_int
    lib.gsv_write_png_gray16.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int32,
    ]
    return lib


def get_lib():
    """The bound CDLL, or None when native support is unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except OSError:
            _lib = None
        return _lib
