"""Multimodal audio/video queries: REAL decode paths, value-oracled.

Completes the modality triad started by the image queries in llm_ops.py
(multimodal_binary_meta / multimodal_feature_extract / multimodal_decode_ppm):
audio payloads are genuine RIFF/WAVE PCM16 bytes decoded by the vendored
wavcodec, video payloads are genuine YUV4MPEG2 streams walked by the
vendored y4mcodec. Each generator's sample/pixel values have a closed
integer form, so DuckDB recomputes the decoded statistics from first
principles — any byte the parser misplaces flips the value hash.

Reference parity note: the reference app has no multimodal surface at all
(verified across /root/reference/app — FastAPI + SQLAlchemy rows only);
this family is the driver-brief extension surface (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.queries.helpers import td
from healthcare_etl_pipeline_spark.queries.registry import query

# Closed sample form shared by the Spark generator (operators/audio.py) and
# the DuckDB oracles below: s[n] = (((doc_id*13 + n*7) % 256) - 128) * 64.
_DUCK_WAV_CTE = """
    wav AS (
      SELECT doc_id,
             list_transform(range(0, 64),
                            n -> (((doc_id * 13 + n * 7) % 256) - 128) * 64) AS smp
      FROM documents
    )
"""


@query(
    "audio_decode_wav",
    oracle=f"""
    WITH {_DUCK_WAV_CTE.strip()}
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(16 AS INTEGER) AS bits_per_sample,
           CAST(64 AS BIGINT) AS n_samples,
           CAST(8 AS BIGINT) AS duration_ms,
           CAST(list_sum(list_transform(smp, x -> abs(x))) AS BIGINT) AS sum_abs,
           CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak_abs,
           CAST(len(list_filter(range(1, 64),
                     i -> (smp[i] < 0) <> (smp[i + 1] < 0))) AS BIGINT)
             AS zero_crossings,
           'decoded' AS decode_status
    FROM wav
    """,
    description="REAL audio decode, value-checked end-to-end: each doc_id "
    "becomes a genuine 64-sample RIFF/WAVE PCM16 payload (sample n = "
    "(((id*13+n*7)%256)-128)*64) encoded in an Arrow batch; the kernel "
    "walks the RIFF chunk list with the vendored wavcodec and emits header "
    "metadata plus sample statistics (sum|s|, peak, zero crossings). The "
    "oracle recomputes every statistic from the closed sample form — a "
    "mis-parsed header field or sample byte flips the hash. decode_status "
    "must be 'decoded' (the REAL path) for every row.",
    tags=("multimodal", "audio", "llm", "pandas-udf"),
)
def audio_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.audio import (
        decode_audio_stats,
        wav_tone_payload,
    )

    docs = td(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        wav_tone_payload(F.col("doc_id")).alias("payload"),
    )
    return decode_audio_stats(media)


@query(
    "audio_frame_energy",
    oracle=f"""
    WITH {_DUCK_WAV_CTE.strip()},
    fr AS (SELECT doc_id, smp, unnest([0, 1, 2, 3]) AS frame_index FROM wav)
    SELECT doc_id AS media_id,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(list_sum(list_transform(
                  list_slice(smp, frame_index * 16 + 1, frame_index * 16 + 16),
                  x -> x * x)) AS BIGINT) AS energy
    FROM fr
    """,
    description="Windowed audio features over the REAL decode path: 16-sample "
    "fixed-hop frames, per-frame energy (sum of squares). The Python stage "
    "stays 1:1 with payloads (one int array per clip crosses the Arrow "
    "boundary); the 1->4 frame fan-out is a JVM-side posexplode. Oracle "
    "recomputes each frame's energy by slicing the closed sample form.",
    tags=("multimodal", "audio", "llm", "pandas-udf"),
)
def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.audio import (
        frame_energy,
        wav_tone_payload,
    )

    docs = td(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        wav_tone_payload(F.col("doc_id")).alias("payload"),
    )
    return frame_energy(media, frame_len=16).select(
        "media_id",
        F.posexplode("frame_energy").alias("frame_index", "energy"),
    )


@query(
    "video_frame_sample_y4m",
    oracle="""
    WITH fr AS (
      SELECT doc_id, unnest([0, 2]) AS frame_index FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(frame_index AS INTEGER) AS frame_index,
           CAST(frame_index * 40 AS BIGINT) AS pts_ms,
           CAST(list_sum(list_transform(range(0, 64),
                  p -> (doc_id * 11 + frame_index * 17 + p * 3) % 256))
             AS BIGINT) AS luma_sum,
           'decoded' AS decode_status
    FROM fr
    """,
    description="REAL video frame sampling, value-checked end-to-end: each "
    "doc_id becomes a genuine 4-frame 8x8 C444 YUV4MPEG2 clip at 25 fps "
    "(luma pixel p of frame f = (id*11+f*17+p*3)%256); the kernel parses "
    "the container header, walks real frame boundaries, keeps every 2nd "
    "frame, and derives pts_ms from the container's F rate (frame f at "
    "f*40 ms). The oracle recomputes kept-frame luma sums and timestamps "
    "from the closed form. decode_status must be 'decoded' for every row.",
    tags=("multimodal", "video", "llm", "pandas-udf"),
)
def video_frame_sample_y4m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from healthcare_etl_pipeline_spark.operators.video import (
        explode_frames,
        sample_frames,
        y4m_clip_payload,
    )

    docs = td(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        y4m_clip_payload(F.col("doc_id")).alias("payload"),
    )
    return explode_frames(sample_frames(media, every_n=2))
