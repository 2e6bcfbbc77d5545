"""Video column operators: real Y4M container parse + frame sampling.

The driver brief's "frame-sample" multimodal operator, on a REAL container:
payloads are genuine YUV4MPEG2 streams, and the mapInPandas kernel walks
actual frame boundaries from the parsed header geometry (functions/
y4mcodec.py) — replacing multimodal.frame_sample's stub byte offsets with
decoded frames, presentation timestamps from the header's F rate, and
per-frame luma statistics.

Scale shape mirrors operators/audio.py: map-only Arrow-batched decode, one
compact array row per payload back across the Arrow boundary (never raw
planes), 1→N frame fan-out via JVM-side posexplode.

The deterministic generator emits 4-frame 8×8 C444 clips at 25 fps where
luma pixel p of frame f for doc d is ``(d*11 + f*17 + p*3) % 256`` — real
container bytes whose per-frame luma sums have a closed integer form an
external oracle can recompute (see video_frame_sample_y4m in
queries/multimodal_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CLIP_FRAMES = 4
CLIP_W = 8
CLIP_H = 8
CLIP_FPS = (25, 1)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField(
            "frames",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("frame_index", T.IntegerType(), False),
                        T.StructField("pts_ms", T.LongType(), False),
                        T.StructField("luma_sum", T.LongType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("decode_status", T.StringType(), False),
    ]
)


@F.pandas_udf(T.BinaryType())
def y4m_clip_payload(ids: pd.Series) -> pd.Series:
    """Deterministic 4-frame 8×8 C444 Y4M clip per id (closed luma form in
    the module docstring)."""
    import numpy as np

    from healthcare_etl_pipeline_spark.functions.y4mcodec import encode_y4m

    p = np.arange(CLIP_W * CLIP_H, dtype=np.int64)
    out = []
    for i in ids:
        frames = [
            (((int(i) * 11 + f * 17 + p * 3) % 256)
             .astype(np.uint8)
             .reshape(CLIP_H, CLIP_W))
            for f in range(CLIP_FRAMES)
        ]
        out.append(encode_y4m(frames, fps=CLIP_FPS, colorspace="444"))
    return pd.Series(out)


def sample_frames(df: DataFrame, *, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: parse the Y4M container, keep every ``every_n``-th
    frame, emit (frame_index, pts_ms, luma_sum) per kept frame.

    pts_ms comes from the container's F rate: frame f presents at
    ``f * 1000 * den / num`` ms (floor — integer milliseconds). The kernel
    returns one nested-array row per clip; explode JVM-side with
    ``explode_frames`` when a flat frame table is wanted.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from healthcare_etl_pipeline_spark.functions.y4mcodec import (
            Y4MDecodeError,
            parse_y4m,
        )

        def err(status: str) -> dict:
            return {
                "width": None,
                "height": None,
                "n_frames": None,
                "frames": None,
                "decode_status": status,
            }

        def one(p: bytes | None) -> dict:
            if p is None:
                return err("null_payload")
            try:
                header, frames = parse_y4m(bytes(p))
            except Y4MDecodeError:
                return err("decode_error")
            num, den = header["fps_num"], header["fps_den"]
            kept = [
                {
                    "frame_index": f,
                    "pts_ms": f * 1000 * den // num,
                    "luma_sum": int(frames[f].sum(dtype="int64")),
                }
                for f in range(0, len(frames), every_n)
            ]
            return {
                "width": header["width"],
                "height": header["height"],
                "n_frames": len(frames),
                "frames": kept,
                "decode_status": "decoded",
            }

        for pdf in batches:
            rows = [one(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows).reindex(
                columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields[1:]]
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def explode_frames(sampled: DataFrame) -> DataFrame:
    """Nested per-clip frame arrays → flat frame table (JVM-side fan-out)."""
    return sampled.select(
        "media_id",
        "width",
        "height",
        F.explode("frames").alias("fr"),
        "decode_status",
    ).select(
        "media_id",
        "width",
        "height",
        F.col("fr.frame_index").alias("frame_index"),
        F.col("fr.pts_ms").alias("pts_ms"),
        F.col("fr.luma_sum").alias("luma_sum"),
        "decode_status",
    )
