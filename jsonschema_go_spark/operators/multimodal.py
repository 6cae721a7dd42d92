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
