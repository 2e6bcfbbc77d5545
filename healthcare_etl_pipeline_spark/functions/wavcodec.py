"""Minimal pure-Python WAV (RIFF/WAVE PCM) codec.

WAV is the audio analogue of the netpbm formats imagecodec.py handles: a
trivial public container (Microsoft RIFF chunks, PCM samples, little-endian)
decodable with ``struct`` alone. The multimodal audio operators need ONE
real end-to-end decode path — real header parsing, real chunk walking, real
int16 sample extraction — so the mapInPandas plumbing runs on actual audio
bytes rather than a stub, in a container with no soundfile/librosa.

Only integer PCM (format tag 1) at 8 or 16 bits is supported; anything else
raises WavDecodeError and the operator records a per-row decode_status
instead of failing the job.

All functions are deterministic, so decoded sample statistics can be
value-checked against a closed-form oracle (the payload generator in
operators/audio.py emits samples with a closed integer form).
"""

from __future__ import annotations

import struct

import numpy as np


class WavDecodeError(ValueError):
    """Payload is not a PCM WAV this codec understands, or is corrupt."""


def encode_wav(
    samples: np.ndarray, *, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """int16 samples (frame-major: shape (n,) mono or (n, channels)) →
    canonical 44-byte-header RIFF/WAVE PCM16 payload."""
    pcm = np.asarray(samples, dtype="<i2")
    if pcm.ndim == 1:
        n_frames = pcm.shape[0]
    elif pcm.ndim == 2 and pcm.shape[1] == channels:
        n_frames = pcm.shape[0]
    else:
        raise ValueError(f"bad sample shape {pcm.shape} for {channels} channels")
    data = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    hdr = b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, 16),
            b"data",
            struct.pack("<I", len(data)),
        ]
    )
    del n_frames
    return hdr + data


def decode_wav(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """RIFF/WAVE PCM payload → (sample_rate, channels, bits, samples).

    ``samples`` is int32 (widened so stats never overflow int16 math), shape
    (n_frames,) for mono else (n_frames, channels). Walks the chunk list
    properly — a ``LIST``/``fact`` chunk before ``data`` must not break the
    parse — rather than assuming the canonical 44-byte layout.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavDecodeError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    off = 12
    n = len(buf)
    while off + 8 <= n:
        cid = buf[off : off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        body = buf[off + 8 : off + 8 + size]
        if len(body) < size:
            raise WavDecodeError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise WavDecodeError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            if fmt is not None:
                break  # canonical order: fmt before data
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavDecodeError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise WavDecodeError(f"unsupported WAV format tag {audio_format}")
    if bits == 16:
        pcm = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    elif bits == 8:  # 8-bit WAV is unsigned, centered at 128
        pcm = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise WavDecodeError(f"unsupported bit depth {bits}")
    if channels < 1:
        raise WavDecodeError("zero channels")
    samples = pcm.astype(np.int32)
    if channels > 1:
        n_frames = len(samples) // channels
        samples = samples[: n_frames * channels].reshape(n_frames, channels)
    return sample_rate, channels, bits, samples
