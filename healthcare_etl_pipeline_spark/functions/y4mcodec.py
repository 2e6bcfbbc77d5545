"""Minimal pure-Python YUV4MPEG2 (.y4m) video codec.

Y4M is the simplest public video container there is: one ASCII header line
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<colorspace>``), then for each
frame the literal marker ``FRAME`` (plus optional parameters) terminated by
``\\n`` and the raw planar YUV bytes. No compression, no index, no
timestamps beyond frame order — which makes it the right target for a REAL
video frame-sampling path in a container with no ffmpeg/av: the parser
walks actual frame boundaries computed from the header geometry rather than
stub byte offsets.

Supported colorspaces: C444 (planes Y,U,V each w*h bytes), C420 and its
siting variants C420jpeg/C420paldv/C420mpeg2 (U,V each (w/2)*(h/2)), and
Cmono (Y only). Anything else raises Y4MDecodeError.

All functions are deterministic, so per-frame luma statistics can be
value-checked against a closed-form oracle (the payload generator in
operators/video.py emits frames with a closed integer form).
"""

from __future__ import annotations

import numpy as np


class Y4MDecodeError(ValueError):
    """Payload is not a YUV4MPEG2 stream this codec understands."""


_MAGIC = b"YUV4MPEG2"


def _plane_sizes(w: int, h: int, colorspace: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_per_plane) for a colorspace tag."""
    if colorspace == "444":
        return w * h, w * h
    if colorspace.startswith("420"):
        if w % 2 or h % 2:
            raise Y4MDecodeError(f"C420 needs even dimensions, got {w}x{h}")
        return w * h, (w // 2) * (h // 2)
    if colorspace == "mono":
        return w * h, 0
    raise Y4MDecodeError(f"unsupported colorspace C{colorspace}")


def encode_y4m(
    frames: list[np.ndarray], *, fps: tuple[int, int] = (25, 1), colorspace: str = "444"
) -> bytes:
    """List of (H, W) uint8 luma frames → Y4M bytes (chroma planes filled
    with the neutral 128 for non-mono colorspaces)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    _, chroma = _plane_sizes(w, h, colorspace)
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    parts = [head.encode("ascii")]
    neutral = bytes([128]) * chroma
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        parts.append(b"FRAME\n")
        parts.append(np.asarray(f, dtype=np.uint8).tobytes())
        parts.append(neutral)
        parts.append(neutral)
    return b"".join(parts)


def parse_y4m(buf: bytes) -> tuple[dict, list[np.ndarray]]:
    """Y4M bytes → (header dict, list of (H, W) uint8 luma frames).

    Header dict keys: width, height, fps_num, fps_den, colorspace.
    Chroma planes are skipped (frame sampling wants luma); frame boundaries
    are computed from the header geometry, so a truncated final frame is a
    decode error, not a silent short read.
    """
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(_MAGIC + b" "):
        raise Y4MDecodeError("not a YUV4MPEG2 payload")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420"  # the spec's default when no C tag is present
    for tok in buf[len(_MAGIC) + 1 : nl].decode("ascii", "replace").split():
        tag, val = tok[0], tok[1:]
        try:
            if tag == "W":
                width = int(val)
            elif tag == "H":
                height = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps_num, fps_den = int(num), int(den)
            elif tag == "C":
                colorspace = val
        except ValueError as e:
            raise Y4MDecodeError(f"bad header token {tok!r}") from e
    if not width or not height or fps_num <= 0 or fps_den <= 0:
        raise Y4MDecodeError("missing/invalid W, H or F header tags")
    luma, chroma = _plane_sizes(width, height, colorspace)
    frames: list[np.ndarray] = []
    off = nl + 1
    n = len(buf)
    while off < n:
        fnl = buf.find(b"\n", off)
        if fnl < 0 or not buf[off:fnl].startswith(b"FRAME"):
            raise Y4MDecodeError(f"expected FRAME marker at offset {off}")
        start = fnl + 1
        end = start + luma + 2 * chroma
        if end > n:
            raise Y4MDecodeError("truncated frame payload")
        frames.append(
            np.frombuffer(buf[start : start + luma], dtype=np.uint8).reshape(
                height, width
            )
        )
        off = end
    header = {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
    }
    return header, frames
