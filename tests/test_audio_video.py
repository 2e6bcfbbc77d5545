"""Audio (WAV) and video (Y4M) real-decode paths: codec roundtrips, chunk
walking, error routing, and Spark-side stats against numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.functions.wavcodec import (
    WavDecodeError,
    decode_wav,
    encode_wav,
)
from healthcare_etl_pipeline_spark.functions.y4mcodec import (
    Y4MDecodeError,
    encode_y4m,
    parse_y4m,
)
from healthcare_etl_pipeline_spark.operators.audio import (
    decode_audio_stats,
    frame_energy,
    wav_tone_payload,
)
from healthcare_etl_pipeline_spark.operators.video import (
    explode_frames,
    sample_frames,
    y4m_clip_payload,
)


def _tone(doc_id: int, n: int = 64) -> np.ndarray:
    idx = np.arange(n, dtype=np.int64)
    return ((((doc_id * 13 + idx * 7) % 256) - 128) * 64).astype(np.int16)


# --- wavcodec -------------------------------------------------------------


def test_wav_roundtrip_mono16():
    s = _tone(7)
    rate, ch, bits, out = decode_wav(encode_wav(s, sample_rate=8000))
    assert (rate, ch, bits) == (8000, 1, 16)
    assert np.array_equal(out, s.astype(np.int32))


def test_wav_roundtrip_stereo():
    s = np.stack([_tone(1), _tone(2)], axis=1)  # (n, 2) frame-major
    rate, ch, bits, out = decode_wav(
        encode_wav(s, sample_rate=44100, channels=2)
    )
    assert (rate, ch, bits) == (44100, 2, 16)
    assert out.shape == (64, 2)
    assert np.array_equal(out, s.astype(np.int32))


def test_wav_chunk_walk_skips_noncanonical_chunks():
    """A LIST chunk between fmt and data must not break the parse."""
    payload = bytearray(encode_wav(_tone(3)))
    # splice LIST chunk (odd size -> exercises word-align padding) after fmt
    insert_at = 12 + 8 + 16  # RIFF hdr + fmt chunk
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\0"
    payload[insert_at:insert_at] = extra
    rate, ch, bits, out = decode_wav(bytes(payload))
    assert np.array_equal(out, _tone(3).astype(np.int32))


def test_wav_8bit_unsigned_centering():
    raw = bytes([0, 128, 255])
    hdr = b"RIFF" + (36 + 3).to_bytes(4, "little") + b"WAVE"
    fmt = b"fmt " + (16).to_bytes(4, "little")
    import struct

    fmt += struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data = b"data" + (3).to_bytes(4, "little") + raw
    rate, ch, bits, out = decode_wav(hdr + fmt + data)
    assert bits == 8
    assert out.tolist() == [-128, 0, 127]


@pytest.mark.parametrize(
    "buf",
    [
        b"",
        b"RIFF\x00\x00\x00\x00AVI ",  # wrong form type
        b"OggS" + b"\0" * 40,
        encode_wav(_tone(1))[:30],  # truncated fmt chunk body
    ],
)
def test_wav_decode_errors(buf):
    with pytest.raises(WavDecodeError):
        decode_wav(buf)


def test_wav_unsupported_format_tag():
    buf = bytearray(encode_wav(_tone(1)))
    buf[20] = 3  # format tag 1 -> 3 (IEEE float)
    with pytest.raises(WavDecodeError):
        decode_wav(bytes(buf))


# --- y4mcodec -------------------------------------------------------------


def _frames(doc_id: int, n=4, w=8, h=8):
    p = np.arange(w * h, dtype=np.int64)
    return [
        (((doc_id * 11 + f * 17 + p * 3) % 256).astype(np.uint8).reshape(h, w))
        for f in range(n)
    ]


def test_y4m_roundtrip_c444():
    frames = _frames(5)
    header, out = parse_y4m(encode_y4m(frames, fps=(25, 1), colorspace="444"))
    assert header == {
        "width": 8,
        "height": 8,
        "fps_num": 25,
        "fps_den": 1,
        "colorspace": "444",
    }
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_y4m_roundtrip_c420_and_mono():
    frames = _frames(9, n=2, w=4, h=4)
    for cs in ("420", "mono"):
        header, out = parse_y4m(encode_y4m(frames, colorspace=cs))
        assert header["colorspace"] == cs
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))


@pytest.mark.parametrize(
    "buf",
    [
        b"",
        b"YUV4MPEG W8 H8 F25:1\nFRAME\n" + b"\0" * 192,  # bad magic
        b"YUV4MPEG2 W8 F25:1\n",  # missing H
        encode_y4m(_frames(1), colorspace="444")[:-10],  # truncated last frame
        b"YUV4MPEG2 W8 H8 F25:1 C999\nFRAME\n",  # unknown colorspace
    ],
)
def test_y4m_decode_errors(buf):
    with pytest.raises(Y4MDecodeError):
        parse_y4m(buf)


def test_y4m_odd_dims_rejected_for_420():
    frames = [np.zeros((3, 3), dtype=np.uint8)]
    with pytest.raises(Y4MDecodeError):
        encode_y4m(frames, colorspace="420")


# --- Spark operators ------------------------------------------------------


def _audio_media(spark, ids=(0, 1, 5)):
    df = spark.createDataFrame([(i,) for i in ids], ["media_id"])
    return df.select("media_id", wav_tone_payload(F.col("media_id")).alias("payload"))


def test_decode_audio_stats_matches_numpy(spark):
    out = {r.media_id: r for r in decode_audio_stats(_audio_media(spark)).collect()}
    for i in (0, 1, 5):
        s = _tone(i).astype(np.int64)
        r = out[i]
        assert r.decode_status == "decoded"
        assert (r.sample_rate, r.n_channels, r.bits_per_sample) == (8000, 1, 16)
        assert (r.n_samples, r.duration_ms) == (64, 8)
        assert r.sum_abs == int(np.abs(s).sum())
        assert r.peak_abs == int(np.abs(s).max())
        neg = s < 0
        assert r.zero_crossings == int((neg[1:] != neg[:-1]).sum())


def test_decode_audio_stats_routes_corrupt_and_null(spark):
    rows = [(1, b"not audio at all"), (2, None)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r.media_id: r for r in decode_audio_stats(df).collect()}
    assert out[1].decode_status == "decode_error"
    assert out[1].sum_abs is None
    assert out[2].decode_status == "null_payload"


def test_frame_energy_matches_numpy(spark):
    out = frame_energy(_audio_media(spark, ids=(3,)), frame_len=16).collect()
    assert len(out) == 1
    s = _tone(3).astype(np.int64).reshape(4, 16)
    assert out[0].frame_energy == [int(x) for x in (s * s).sum(axis=1)]
    assert out[0].decode_status == "decoded"


def test_sample_frames_real_parse(spark):
    df = spark.createDataFrame([(4,)], ["media_id"])
    media = df.select("media_id", y4m_clip_payload(F.col("media_id")).alias("payload"))
    flat = explode_frames(sample_frames(media, every_n=2)).collect()
    assert [r.frame_index for r in flat] == [0, 2]
    assert [r.pts_ms for r in flat] == [0, 80]
    for r in flat:
        assert (r.width, r.height) == (8, 8)
        expected = int(_frames(4)[r.frame_index].sum(dtype="int64"))
        assert r.luma_sum == expected
        assert r.decode_status == "decoded"


def test_sample_frames_routes_corrupt(spark):
    df = spark.createDataFrame([(1, b"MPEG not really")], ["media_id", "payload"])
    out = sample_frames(df).collect()
    assert out[0].decode_status == "decode_error"
    assert out[0].frames is None
