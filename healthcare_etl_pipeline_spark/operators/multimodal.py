"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Driver north-star surface (SURVEY.md §2.8): treat image/audio/video as
``binary`` columns with typed metadata; decode / feature-extract / resize /
frame-sample run as Arrow-batched Pandas functions over ``mapInPandas``.

Decode paths, tried in order inside the executor-side kernel:
1. The vendored pure-Python codec (functions/imagecodec.py) REALLY decodes
   binary PPM/PGM and uncompressed 24/32-bit BMP — end-to-end real bytes →
   pixels → features, no third-party library, deterministic everywhere
   (status ``decoded``).
2. PIL, when importable (not in this container — probe: ``python -c
   "import PIL"``), covers every other format (status ``decoded``).
3. A clearly-marked deterministic fake for payloads neither path can read
   (status ``stub_decoded``) — so heterogeneous clusters degrade per-row,
   never fail the job, and the decode_status column records which path
   produced each row. The Spark-side plumbing (schema, batch iteration,
   partition sizing, UDF signatures) is identical on every path.

Scale notes:
- Binary payloads dominate row size → keep ``spark.sql.files.maxPartitionBytes``
  at the default 128 MB and let partition count follow data volume; never
  collect payloads to the driver.
- Metadata-only queries must not touch the binary column: keep metadata in
  separate top-level columns so Parquet column pruning skips the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed JVM-side (no Python, blobs unread by
    later metadata-only queries thanks to column pruning)."""
    return df.withColumns(
        {
            "n_bytes": F.octet_length(F.col(payload_col)).cast("long"),
            "checksum": F.sha2(F.col(payload_col), 256),
        }
    )


@F.pandas_udf(T.BinaryType())
def ppm_gradient_payload(ids: pd.Series) -> pd.Series:
    """Deterministic 16×16 binary-PPM gradient per id: gray pixel g equals
    (id·7 + g) mod 256 on all three channels — real image bytes whose
    decoded chunk sums have a closed integer form an external oracle can
    compute (see the multimodal_decode_ppm query)."""
    import numpy as np

    from healthcare_etl_pipeline_spark.functions.imagecodec import encode_ppm

    out = []
    for i in ids:
        ramp = ((int(i) * 7 + np.arange(256, dtype=np.int64)) % 256).astype(np.uint8)
        out.append(encode_ppm(np.repeat(ramp, 3).reshape(16, 16, 3)))
    return pd.Series(out)


def _probe_image_codec():
    """Return the PIL Image module when importable, else None.

    Runs on the EXECUTOR (inside the kernel), so a heterogeneous cluster
    degrades per-node rather than failing the job; the decode_status column
    records which path produced each row.
    """
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _profile(gray, dim: int) -> list[float]:
    """dim-length mean-intensity profile of a [0,1] grayscale array."""
    import numpy as np

    rows = np.array_split(np.asarray(gray, dtype=np.float64).ravel(), dim)
    return [float(r.mean()) if len(r) else 0.0 for r in rows]


def _builtin_decode_features(payload: bytes, dim: int) -> list[float]:
    """REAL decode via the vendored PPM/PGM/BMP codec: bytes → pixels →
    grayscale (exact channel mean) → dim-length intensity profile in [0,1].
    Raises ImageDecodeError for formats the codec doesn't speak."""
    from healthcare_etl_pipeline_spark.functions.imagecodec import (
        decode_image,
        to_grayscale,
    )

    return _profile(to_grayscale(decode_image(payload)), dim)


def _real_decode_features(image_mod, payload: bytes, dim: int) -> list[float]:
    """PIL decode path (used when the library is importable): decode,
    grayscale, downsample to a dim-length intensity profile in [0, 1]."""
    import io

    import numpy as np

    img = image_mod.open(io.BytesIO(payload)).convert("L")
    return _profile(np.asarray(img, dtype=np.float64) / 255.0, dim)


def _fake_decode_features(payload: bytes | None, dim: int = 8) -> list[float] | None:
    """STUB decode: deterministic fake feature vector from payload bytes.

    Used when no codec is importable (this container: none are — see module
    docstring). Deterministic (byte-sum seeded) so tests can assert exact
    values.
    """
    if payload is None:
        return None
    total = sum(payload) if payload else 0
    return [float((total + i * 31) % 256) / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, *, dim: int = 8, batch_hint: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batch iterator).

    The kernel sees an iterator of pandas batches — the canonical shape for
    expensive per-row media work: amortizes Python startup per batch and
    streams, never materializing a partition at once.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from healthcare_etl_pipeline_spark.functions.imagecodec import (
            ImageDecodeError,
        )

        image_mod = _probe_image_codec()  # once per task, on the executor

        def decode(p: bytes | None) -> tuple[list[float] | None, str]:
            if p is None:
                return None, "null_payload"
            looks_image = bytes(p[:2]) in (b"P5", b"P6", b"BM")
            try:
                return _builtin_decode_features(bytes(p), dim), "decoded"
            except ImageDecodeError:
                if looks_image:  # right magic, corrupt body
                    return None, "decode_error"
            except Exception:  # noqa: BLE001 — corrupt payload, not fatal
                return None, "decode_error"
            if image_mod is not None:
                try:
                    return _real_decode_features(image_mod, p, dim), "decoded"
                except Exception:  # noqa: BLE001
                    return None, "decode_error"
            return _fake_decode_features(p, dim), "stub_decoded"

        for pdf in batches:
            pairs = pdf["payload"].map(decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else None
                    ),
                    "feature": pairs.map(lambda t: t[0]),
                    "decode_status": pairs.map(lambda t: t[1]),
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, *, target_w: int = 64, target_h: int = 64
) -> DataFrame:
    """REAL resize for codec-supported payloads (PPM/PGM/BMP): decode →
    nearest-neighbor resample → re-encode as binary PPM/PGM, via the same
    mapInPandas shape as the stub. Unsupported formats keep the stub's
    deterministic byte-prefix behavior (status ``stub_resized``) so mixed
    corpora stream through one kernel.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("resize_status", T.StringType(), False),
        ]
    )
    stub_len = max(1, (target_w * target_h) // 256)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from healthcare_etl_pipeline_spark.functions.imagecodec import (
            ImageDecodeError,
            decode_image,
            encode_ppm,
            resize_nearest,
        )

        def one(p: bytes | None) -> tuple[bytes | None, str]:
            if p is None:
                return None, "null_payload"
            try:
                resized = resize_nearest(decode_image(bytes(p)), target_w, target_h)
                return encode_ppm(resized), "resized"
            except ImageDecodeError:
                return bytes(p[:stub_len]).ljust(stub_len, b"\0"), "stub_resized"
            except Exception:  # noqa: BLE001 — corrupt body with image magic
                return None, "resize_error"

        for pdf in batches:
            pairs = pdf["payload"].map(one)
            out = pairs.map(lambda t: t[0])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "n_bytes": out.map(lambda p: len(p) if p is not None else None),
                    "resize_status": pairs.map(lambda t: t[1]),
                }
            )

    return df.mapInPandas(kernel, out_schema)


def resize_stub(
    df: DataFrame, *, target_w: int = 64, target_h: int = 64, batch_hint: int = 256
) -> DataFrame:
    """STUB resize: deterministic fake thumbnail bytes via mapInPandas.

    A real implementation decodes, resizes (PIL/opencv — unavailable here),
    and re-encodes; the stub emits a deterministic byte prefix so schema,
    batch shape and size accounting are real. Output keeps metadata columns
    and replaces the payload with the "resized" bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("resize_status", T.StringType(), False),
        ]
    )
    target_len = max(1, (target_w * target_h) // 256)

    def kernel(batches):
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda p: bytes(p[:target_len]).ljust(target_len, b"\0")
                if p is not None
                else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "n_bytes": resized.map(lambda p: len(p) if p is not None else None),
                    "resize_status": pdf["payload"].map(
                        lambda p: "stub_resized" if p is not None else "null_payload"
                    ),
                }
            )

    return df.mapInPandas(kernel, out_schema)


def frame_sample(df: DataFrame, *, every_n_bytes: int = 1024) -> DataFrame:
    """STUB frame sampler: emits one row per sampled "frame" offset.

    Real video sampling would decode container timestamps; the stub samples
    byte offsets deterministically. Demonstrates the 1→N exploding transform
    shape (posexplode over a computed offset array) staying JVM-side.
    """
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.octet_length("payload").cast("long") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return df.select(
        "media_id",
        "media_type",
        F.posexplode(offsets).alias("frame_index", "byte_offset"),
    )
