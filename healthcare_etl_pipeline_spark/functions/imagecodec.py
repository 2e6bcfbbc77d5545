"""Minimal pure-Python image codec: binary PPM/PGM (netpbm P6/P5) and
uncompressed 24/32-bit BMP.

Both formats are trivial public-domain bitmap containers (netpbm spec;
Windows BITMAPINFOHEADER layout), decodable in a few dozen lines with no
third-party library — which is the point: this container has no PIL/cv2,
and the multimodal operators need ONE real end-to-end decode path so the
mapInPandas plumbing is exercised on actual bytes, not a stub. PIL (when
present) remains the fallback for every other format.

All functions are numpy-only and deterministic, so decoded features can be
value-checked against a closed-form oracle.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageDecodeError(ValueError):
    """Payload is not a format this codec understands, or is corrupt."""


def _parse_pnm_header(buf: bytes) -> tuple[bytes, list[int], int]:
    """Return (magic, [w, h, maxval?], data_offset). Handles comments."""
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise ImageDecodeError(f"not a binary netpbm payload: {magic!r}")
    fields: list[int] = []
    i = 2
    n = len(buf)
    while len(fields) < 3:
        # skip whitespace and '#' comment lines
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            while i < n and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ImageDecodeError("truncated netpbm header")
        try:
            fields.append(int(buf[i:j]))
        except ValueError as e:
            raise ImageDecodeError(f"bad netpbm header token {buf[i:j]!r}") from e
        i = j
    if i >= n or not buf[i : i + 1].isspace():
        raise ImageDecodeError("missing whitespace after netpbm header")
    return magic, fields, i + 1  # exactly ONE whitespace byte before raster


def decode_pnm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8; binary PGM (P5) → (H, W) uint8."""
    magic, (w, h, maxval), off = _parse_pnm_header(buf)
    if not (0 < maxval < 256):
        raise ImageDecodeError(f"unsupported netpbm maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    raster = buf[off : off + need]
    if len(raster) != need:
        raise ImageDecodeError(
            f"netpbm raster truncated: want {need} bytes, have {len(raster)}"
        )
    arr = np.frombuffer(raster, dtype=np.uint8)
    return arr.reshape(h, w, 3) if channels == 3 else arr.reshape(h, w)


def decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP → (H, W, 3) uint8 (RGB)."""
    if buf[:2] != b"BM" or len(buf) < 54:
        raise ImageDecodeError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    header_size = struct.unpack_from("<I", buf, 14)[0]
    if header_size < 40:
        raise ImageDecodeError(f"unsupported BMP header size {header_size}")
    w, h_signed = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp not in (24, 32) or planes != 1 or w <= 0:
        raise ImageDecodeError(
            f"unsupported BMP: bpp={bpp} compression={compression}"
        )
    h = abs(h_signed)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3  # rows pad to 4 bytes
    need = stride * h
    raster = buf[data_off : data_off + need]
    if len(raster) != need:
        raise ImageDecodeError("BMP raster truncated")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    pixels = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage (the common case)
        pixels = pixels[::-1]
    return pixels[:, :, 2::-1].copy()  # BGR(A) → RGB


def decode_image(buf: bytes) -> np.ndarray:
    """Sniff + decode: returns (H, W) or (H, W, 3) uint8."""
    if buf[:2] in (b"P5", b"P6"):
        return decode_pnm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    raise ImageDecodeError(f"unrecognized image magic {buf[:2]!r}")


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 → binary PPM/PGM bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w = arr.shape
        return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    if arr.ndim == 3 and arr.shape[2] == 3:
        h, w, _ = arr.shape
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()
    raise ValueError(f"expected (H,W) or (H,W,3) uint8, got {arr.shape}")


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """Exact channel mean in float64, range [0, 1] — deliberately NOT the
    luma weighting, so the value is engine/library independent."""
    a = arr.astype(np.float64) / 255.0
    return a if a.ndim == 2 else a.mean(axis=2)


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample (deterministic integer index map)."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]
