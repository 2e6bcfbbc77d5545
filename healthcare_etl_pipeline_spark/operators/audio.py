"""Audio column operators: real WAV decode + feature extraction.

Completes the multimodal triad (image: multimodal.py, video: video.py) with
a REAL audio path: payloads are genuine RIFF/WAVE PCM16 bytes, and the
mapInPandas kernels parse the RIFF chunk list and extract int16 samples via
the vendored pure-Python codec (functions/wavcodec.py) — no stub between
bytes and statistics.

Scale shape: decode is embarrassingly parallel (one payload at a time, no
cross-row state), so the kernels are Arrow-batched map-only stages — at
100 TB the cost is the scan plus per-core decode, with no shuffle. Stats
are reduced to a handful of integers per payload INSIDE the kernel, so only
kilobyte rows cross the Arrow boundary back to the JVM, never raw samples.

The deterministic tone generator mirrors multimodal.ppm_gradient_payload:
sample n of doc d is ``(((d*13 + n*7) % 256) - 128) * 64`` — real audio
bytes whose decoded statistics have a closed integer form an external
oracle can recompute (see the audio_* queries in queries/multimodal_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TONE_SAMPLES = 64
TONE_RATE = 8000

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),
        T.StructField("peak_abs", T.LongType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)

FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_energy", T.ArrayType(T.LongType()), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)


@F.pandas_udf(T.BinaryType())
def wav_tone_payload(ids: pd.Series) -> pd.Series:
    """Deterministic 64-sample mono PCM16 WAV per id (see module docstring
    for the closed sample form)."""
    import numpy as np

    from healthcare_etl_pipeline_spark.functions.wavcodec import encode_wav

    n = np.arange(TONE_SAMPLES, dtype=np.int64)
    out = []
    for i in ids:
        samples = (((int(i) * 13 + n * 7) % 256) - 128) * 64
        out.append(encode_wav(samples.astype(np.int16), sample_rate=TONE_RATE))
    return pd.Series(out)


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """REAL WAV decode → per-payload sample statistics via mapInPandas.

    Emits format metadata (rate/channels/bits) straight from the parsed
    RIFF header plus sample-domain statistics: total |amplitude|, peak,
    and zero-crossing count (sign changes between consecutive frames,
    channel-summed frames for multi-channel audio). Undecodable payloads
    get nulls + decode_status='decode_error' instead of failing the task.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from healthcare_etl_pipeline_spark.functions.wavcodec import (
            WavDecodeError,
            decode_wav,
        )

        def one(p: bytes | None) -> dict:
            if p is None:
                return {"decode_status": "null_payload"}
            try:
                rate, channels, bits, samples = decode_wav(bytes(p))
            except WavDecodeError:
                return {"decode_status": "decode_error"}
            mono = samples.sum(axis=1) if samples.ndim == 2 else samples
            neg = mono < 0
            return {
                "sample_rate": rate,
                "n_channels": channels,
                "bits_per_sample": bits,
                "n_samples": int(len(mono)),
                "duration_ms": int(round(len(mono) * 1000.0 / rate)) if rate else None,
                "sum_abs": int(np.abs(mono).sum()),
                "peak_abs": int(np.abs(mono).max()) if len(mono) else 0,
                "zero_crossings": int((neg[1:] != neg[:-1]).sum()),
                "decode_status": "decoded",
            }

        for pdf in batches:
            rows = [one(p) for p in pdf["payload"]]
            out = pd.DataFrame(rows).reindex(
                columns=[f.name for f in AUDIO_STATS_SCHEMA.fields[1:]]
            )
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return df.mapInPandas(kernel, AUDIO_STATS_SCHEMA)


def frame_energy(df: DataFrame, *, frame_len: int = 16) -> DataFrame:
    """Fixed-hop frame energies: decode, split mono samples into
    ``frame_len``-sample frames (hop = frame_len, tail frame dropped), sum
    of squares per frame. The kernel returns ONE array row per payload —
    the 1→N fan-out happens JVM-side via posexplode so the expensive Python
    stage stays 1:1 with input rows."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from healthcare_etl_pipeline_spark.functions.wavcodec import (
            WavDecodeError,
            decode_wav,
        )

        def one(p: bytes | None) -> tuple[list[int] | None, str]:
            if p is None:
                return None, "null_payload"
            try:
                _, _, _, samples = decode_wav(bytes(p))
            except WavDecodeError:
                return None, "decode_error"
            mono = samples.sum(axis=1) if samples.ndim == 2 else samples
            n_frames = len(mono) // frame_len
            if n_frames == 0:
                return [], "decoded"
            fr = (
                mono[: n_frames * frame_len]
                .astype(np.int64)
                .reshape(n_frames, frame_len)
            )
            return [int(x) for x in (fr * fr).sum(axis=1)], "decoded"

        for pdf in batches:
            pairs = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "frame_energy": [t[0] for t in pairs],
                    "decode_status": [t[1] for t in pairs],
                }
            )

    return df.mapInPandas(kernel, FRAME_ENERGY_SCHEMA)
