"""Image I/O: 8-bit RGB and 16-bit grayscale PNG read/write.

Replaces the reference's PIL/cv2 save paths (main.py:852-917).  Uses PIL when
available and falls back to a self-contained zlib PNG codec (so the framework
has zero hard image-library dependencies).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

try:  # PIL ships in this environment; the fallback keeps us dependency-free
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover
    _PILImage = None


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _write_png_raw(path, arr: np.ndarray) -> None:
    """Minimal PNG encoder: uint8 RGB/gray or uint16 gray, no filtering."""
    h, w = arr.shape[:2]
    if arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3:
        color_type, bit_depth = 2, 8
        raw = arr
    elif arr.dtype == np.uint8 and arr.ndim == 2:
        color_type, bit_depth = 0, 8
        raw = arr[..., None]
    elif arr.dtype == np.uint16 and arr.ndim == 2:
        color_type, bit_depth = 0, 16
        raw = arr[..., None].astype(">u2")  # PNG is big-endian
    else:
        raise ValueError(f"unsupported array {arr.dtype} {arr.shape}")
    rows = raw.reshape(h, -1).view(np.uint8).reshape(h, -1)
    payload = b"".join(b"\x00" + rows[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(_png_chunk(b"IHDR", ihdr))
        f.write(_png_chunk(b"IDAT", zlib.compress(payload, 6)))
        f.write(_png_chunk(b"IEND", b""))


def _native_lib():
    try:
        from gaussiansplattingviewer_tpu import native

        return native.get_lib()
    except Exception:  # pragma: no cover
        return None


def write_rgb8(path, img: np.ndarray) -> None:
    """Save float [0,1] or uint8 HxWx3 as an 8-bit RGB PNG
    (the reference's left/right captures, main.py:916-917).

    Fast path: the native zlib encoder (native/gsv_native.cpp); falls back
    to PIL, then to the pure-Python codec."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.round(np.asarray(img, np.float32) * 255.0), 0, 255).astype(
            np.uint8
        )
    lib = _native_lib()
    if lib is not None and img.ndim == 3 and img.shape[2] == 3:
        import ctypes

        data = np.ascontiguousarray(img)
        rc = lib.gsv_write_png_rgb8(
            str(path).encode(), img.shape[1], img.shape[0],
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 6,
        )
        if rc == 0:
            return
    if _PILImage is not None:
        _PILImage.fromarray(img, mode="RGB").save(path)
    else:
        _write_png_raw(path, img)


def write_disparity16(path, disp: np.ndarray) -> None:
    """Save a float disparity map (fraction of image width, [0,1]) as a
    16-bit PNG scaled by 65535 — exactly ref main.py:875-879."""
    disp16 = np.clip(
        np.asarray(disp, np.float32) * 65535.0, 0, 65535
    ).astype(np.uint16)
    lib = _native_lib()
    if lib is not None:
        import ctypes

        data = np.ascontiguousarray(disp16)
        rc = lib.gsv_write_png_gray16(
            str(path).encode(), disp16.shape[1], disp16.shape[0],
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), 6,
        )
        if rc == 0:
            return
    if _PILImage is not None:
        _PILImage.fromarray(disp16).save(path)  # uint16 -> 16-bit gray PNG
    else:
        _write_png_raw(path, disp16)


def read_image(path) -> np.ndarray:
    """Read a PNG as numpy (uint8 HxWx3 or uint16 HxW)."""
    if _PILImage is not None:
        im = _PILImage.open(path)
        arr = np.array(im)
        return arr
    raise RuntimeError("PNG reading requires PIL in this build")


def ensure_dirs(*paths) -> None:
    for p in paths:
        os.makedirs(p, exist_ok=True)
