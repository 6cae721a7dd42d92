"""Multimodal-column plumbing (driver mandate): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The actual decoders (PIL/ffmpeg/etc.) are NOT in this container, so the
decode step is a clearly-marked deterministic fake behind
:func:`fake_decode_features`; everything Spark-side — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested. Swapping in a real
decoder changes only the body of the pandas function.

This is the one operator family where Python is unavoidable (binary codecs);
it follows the vectorized contract from BASELINE.json input_hint: Arrow
batches via mapInPandas, never per-row Python UDFs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: output schema of the feature extractor
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 8


def fake_decode_features(data: bytes) -> list:
    """Deterministic stand-in for a real image/audio decoder.

    Real implementation would be e.g.::

        raise NotImplementedError("PIL/torchvision not available in sandbox")

    Instead we derive FEATURE_DIM floats from the sha256 of the payload so
    tests can assert exact values and batch shapes.
    """
    h = hashlib.sha256(data).digest()
    return [h[i] / 255.0 for i in range(FEATURE_DIM)]


def extract_features(
    df: DataFrame,
    id_col: str = "asset_id",
    bin_col: str = "payload",
    type_col: str = "media_type",
) -> DataFrame:
    """binary assets → feature rows via Arrow-batched mapInPandas.

    Batches stream through pandas (no collect); output partitioning follows
    input partitioning (narrow transformation — no shuffle).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            data = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": pdf[type_col],
                    "n_bytes": data.map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "checksum": data.map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                    "features": data.map(
                        lambda b: None if b is None else fake_decode_features(bytes(b))
                    ),
                }
            )

    cols = [F.col(id_col), F.col(bin_col), F.col(type_col)]
    return df.select(*cols).mapInPandas(_extract, FEATURE_SCHEMA)


def synthesize_assets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Turn a text table into a fake binary-asset table (sandbox stand-in
    for real image bytes): payload = utf-8 bytes of the text."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, F.lit("image/png"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("resized_checksum", T.StringType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    id_col: str = "asset_id",
    bin_col: str = "payload",
) -> DataFrame:
    """STUB decode, REAL plumbing: "resize" every image payload to a
    width×height byte buffer via Arrow mapInPandas (narrow, no shuffle).

    The real body is ``PIL.Image.open(io.BytesIO(b)).resize((w, h))`` — not
    available in this container, so the deterministic stand-in tiles the
    payload bytes to exactly ``w*h`` bytes (truncate/repeat), which keeps the
    output schema, byte sizes, and checksums assertable in tests.
    """

    def _resize(batches):
        target = width * height
        for pdf in batches:
            data = pdf[bin_col]

            def tile(b):
                if b is None:
                    return None
                raw = bytes(b) or b"\x00"
                reps = (target // len(raw)) + 1
                return (raw * reps)[:target]

            resized = data.map(tile)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "resized": resized,
                    "resized_checksum": resized.map(
                        lambda b: None if b is None else hashlib.sha256(b).hexdigest()
                    ),
                }
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _resize, RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("frame_bytes", T.IntegerType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "asset_id",
    bin_col: str = "payload",
) -> DataFrame:
    """STUB decode, REAL plumbing: sample ``n_frames`` evenly spaced frames
    per video — a 1→N ``mapInPandas`` (output rows ≠ input rows; the shape a
    real ffmpeg frame sampler produces).

    The stand-in splits the payload into ``n_frames`` contiguous slices;
    payloads shorter than ``n_frames`` bytes yield fewer frames (mirrors a
    clip shorter than the sampling interval).
    """

    def _sample(batches):
        for pdf in batches:
            out = {"asset_id": [], "frame_idx": [], "frame": [], "frame_bytes": []}
            for aid, b in zip(pdf[id_col].astype("int64"), pdf[bin_col]):
                if b is None:
                    continue
                raw = bytes(b)
                k = min(n_frames, len(raw))
                for i in range(k):
                    lo = (i * len(raw)) // max(k, 1)
                    hi = ((i + 1) * len(raw)) // max(k, 1)
                    chunk = raw[lo:hi]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["frame"].append(chunk)
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        _sample, FRAME_SCHEMA
    )
