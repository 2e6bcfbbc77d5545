"""Multimodal plumbing tests: binary metadata, stubbed decode, frame sampling."""

from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.multimodal import (
    _fake_decode_features,
    attach_binary_metadata,
    extract_features,
    frame_sample,
)


def _media(spark):
    rows = [
        (1, b"abc", "image/fake"),
        (2, b"x" * 3000, "video/fake"),
        (3, None, "audio/fake"),
    ]
    return spark.createDataFrame(rows, ["media_id", "payload", "media_type"])


def test_binary_metadata(spark):
    out = {r.media_id: r for r in attach_binary_metadata(_media(spark)).collect()}
    assert out[1].n_bytes == 3
    assert len(out[1].checksum) == 64  # sha-256 hex
    assert out[2].n_bytes == 3000
    assert out[3].n_bytes is None


def test_extract_features_deterministic_stub(spark):
    out = {r.media_id: r for r in extract_features(_media(spark), dim=4).collect()}
    assert out[1].decode_status == "stub_decoded"
    assert out[3].decode_status == "null_payload"
    assert out[3].feature is None
    expected = _fake_decode_features(b"abc", 4)
    # feature column is float32 — compare with float32-level tolerance
    for got, want in zip(out[1].feature, expected):
        assert abs(got - want) < 1e-6


def test_frame_sample_offsets(spark):
    out = frame_sample(_media(spark).filter(F.col("media_id") == 2), every_n_bytes=1024)
    rows = out.collect()
    assert [r.byte_offset for r in rows] == [0, 1024, 2048]
    assert [r.frame_index for r in rows] == [0, 1, 2]


def test_resize_stub_shapes(spark):
    from healthcare_etl_pipeline_spark.operators.multimodal import resize_stub

    out = resize_stub(_media(spark), target_w=64, target_h=64).collect()
    by_id = {r.media_id: r for r in out}
    target_len = (64 * 64) // 256
    for r in out:
        if r.resize_status == "stub_resized":
            assert r.n_bytes == target_len
            assert len(r.payload) == target_len
        else:
            assert r.payload is None


# ---------------------------------------------------------------------------
# REAL decode path: vendored pure-Python PPM/PGM/BMP codec
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402

from healthcare_etl_pipeline_spark.functions.imagecodec import (  # noqa: E402
    ImageDecodeError,
    decode_image,
    encode_ppm,
    resize_nearest,
    to_grayscale,
)


def _gradient(h, w, seed=0):
    ramp = (np.arange(h * w * 3, dtype=np.int64) + seed) % 256
    return ramp.reshape(h, w, 3).astype(np.uint8)


def _bmp_bytes(arr):
    """Reference 24-bit bottom-up BMP writer (test-local, independent of the
    decoder under test)."""
    import struct

    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, ::-1].tobytes()  # RGB → BGR
        raster += row + b"\0" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return bytes(header + info + raster)


def test_codec_ppm_roundtrip():
    img = _gradient(5, 7)
    assert (decode_image(encode_ppm(img)) == img).all()
    gray = img[:, :, 0]
    assert (decode_image(encode_ppm(gray)) == gray).all()


def test_codec_ppm_comment_header():
    img = _gradient(2, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert (decode_image(payload) == img).all()


def test_codec_bmp_matches_reference_writer():
    img = _gradient(4, 5, seed=9)
    assert (decode_image(_bmp_bytes(img)) == img).all()


def test_codec_rejects_truncation_and_garbage():
    import pytest

    img = _gradient(4, 4)
    good = encode_ppm(img)
    with pytest.raises(ImageDecodeError):
        decode_image(good[:-5])
    with pytest.raises(ImageDecodeError):
        decode_image(b"GIF89a not supported")


def test_resize_nearest_identity_and_downsample():
    img = _gradient(8, 8)
    assert (resize_nearest(img, 8, 8) == img).all()
    half = resize_nearest(img, 4, 4)
    assert half.shape == (4, 4, 3)
    assert (half == img[::2][:, ::2]).all()


def test_extract_features_real_decode(spark):
    """PPM payloads run the REAL bytes→pixels→profile path end-to-end."""
    img1, img2 = _gradient(16, 16), _gradient(16, 16, seed=77)
    rows = [
        (1, bytearray(encode_ppm(img1)), "image/x-portable-pixmap"),
        (2, bytearray(encode_ppm(img2)), "image/x-portable-pixmap"),
        (3, bytearray(b"P6\n16 16\n255\ntruncated"), "image/x-portable-pixmap"),
        (4, bytearray(b"just text"), "text/plain"),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload", "media_type"])
    out = {r.media_id: r for r in extract_features(df, dim=8).collect()}
    assert out[1].decode_status == "decoded"
    assert out[2].decode_status == "decoded"
    assert out[3].decode_status == "decode_error" and out[3].feature is None
    assert out[4].decode_status == "stub_decoded"
    for img, row in ((img1, out[1]), (img2, out[2])):
        expected = [
            float(chunk.mean())
            for chunk in np.array_split(to_grayscale(img).ravel(), 8)
        ]
        for got, want in zip(row.feature, expected):
            assert abs(got - want) < 1e-6  # float32 column


def test_resize_images_real_path(spark):
    from healthcare_etl_pipeline_spark.operators.multimodal import resize_images

    img = _gradient(16, 12, seed=3)
    rows = [
        (1, bytearray(encode_ppm(img)), "image/x-portable-pixmap"),
        (2, bytearray(b"not an image"), "application/octet-stream"),
        (3, None, "image/x-portable-pixmap"),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload", "media_type"])
    out = {r.media_id: r for r in resize_images(df, target_w=6, target_h=4).collect()}
    assert out[1].resize_status == "resized"
    decoded = decode_image(bytes(out[1].payload))
    assert decoded.shape == (4, 6, 3)
    assert (decoded == resize_nearest(img, 6, 4)).all()
    assert out[2].resize_status == "stub_resized"
    assert out[3].resize_status == "null_payload" and out[3].payload is None
