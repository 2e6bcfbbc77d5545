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
