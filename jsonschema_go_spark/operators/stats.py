"""Per-column statistics (SURVEY.md §2.3).

All computed in ONE aggregation pass per table (single shuffle-free partial
agg + 1-row final agg), then exploded to tidy form — at 100 TB this is a
single scan with map-side combine, no per-column jobs.

- null fraction — `null` type semantics (``/root/reference/reflect.go:1332``)
- distinct count — HyperLogLog (`approx_count_distinct`) by default; exact
  `count_distinct` optional for oracle comparison
- min / max — `minimum`/`maximum` analogs (``/root/reference/entities.go:29,31``)
- length histogram — `minLength`/`maxLength` analogs
  (``/root/reference/entities.go:33-34``) as log2-bucketed counts
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def column_stats(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
    hll_rsd: float = 0.02,
) -> DataFrame:
    """→ ``(column, row_count, null_count, null_fraction, distinct_count,
    min_value, max_value)`` — one row per column, min/max stringified for a
    uniform schema.
    """
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"n_{i}"))
        if not exact_distinct:
            aggs.append(F.approx_count_distinct(col, rsd=hll_rsd).alias(f"d_{i}"))
        dt = df.schema[c].dataType
        if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
            aggs.append(F.lit(None).cast("string").alias(f"mn_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"mx_{i}"))
        else:
            aggs.append(F.min(col).cast("string").alias(f"mn_{i}"))
            aggs.append(F.max(col).cast("string").alias(f"mx_{i}"))
    wide = df.agg(*aggs)
    if exact_distinct:
        # r7: K exact count_distincts in ONE aggregate made Spark EXPAND the
        # input K+1× (every row replicated per distinct column) — measured
        # 4.7 s vs 1.1 s at sf1.0/1M rows. Each column instead gets its own
        # two-level distinct aggregate (map-side partial dedup, tiny final),
        # cross-joined onto the one-row base agg; count_distinct semantics
        # (NULLs excluded) preserved exactly.
        for i, c in enumerate(cols):
            d = (
                df.select(c)
                .where(F.col(c).isNotNull())
                .distinct()
                .agg(F.count(F.lit(1)).alias(f"d_{i}"))
            )
            wide = wide.crossJoin(d)

    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_rows").alias("row_count"),
                F.col(f"n_{i}").alias("null_count"),
                (F.col(f"n_{i}") / F.col("_rows")).alias("null_fraction"),
                F.col(f"d_{i}").alias("distinct_count"),
                F.col(f"mn_{i}").alias("min_value"),
                F.col(f"mx_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(F.explode(rows).alias("s")).select("s.*")


def length_histogram(df: DataFrame, col: str, log2: bool = True) -> DataFrame:
    """Character-length histogram of a string column.

    → ``(bucket, lo, hi, cnt)`` where bucket b covers [2^b, 2^{b+1}) char
    lengths (bucket -1 = empty string). Linear buckets with ``log2=False``.
    """
    ln = F.length(F.col(col))
    if log2:
        bucket = F.when(ln <= 0, F.lit(-1)).otherwise(
            F.floor(F.log2(ln.cast("double")))
        ).cast("int")
        out = (
            df.where(F.col(col).isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return out.select(
            "bucket",
            F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
                F.pow(F.lit(2.0), F.col("bucket"))
            ).cast("long").alias("lo"),
            F.when(F.col("bucket") < 0, F.lit(0)).otherwise(
                F.pow(F.lit(2.0), F.col("bucket") + 1) - 1
            ).cast("long").alias("hi"),
            "cnt",
        ).orderBy("bucket")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(ln.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("bucket").cast("int"),
            F.col("bucket").cast("long").alias("lo"),
            F.col("bucket").cast("long").alias("hi"),
            "cnt",
        )
        .orderBy("bucket")
    )


def column_quantiles(
    df: DataFrame,
    columns,
    probs=(0.25, 0.5, 0.75, 0.95, 0.99),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-column quantiles → tidy ``(column, prob, value)`` rows.

    ``exact=True`` uses ``F.percentile`` (sort-based, exact linear
    interpolation — matches DuckDB ``quantile_cont`` bit-for-bit; the oracle
    path). ``exact=False`` uses ``F.approx_percentile`` (GK sketch) — the
    100 TB path: one pass, bounded memory, mergeable partials; no global
    sort. All quantiles for all columns compute in ONE aggregation pass.
    """
    plist = [float(p) for p in probs]
    fn = (
        (lambda c: F.percentile(c, plist))
        if exact
        else (lambda c: F.approx_percentile(c, plist, accuracy))
    )
    if exact:
        # r7: one K-column percentile aggregate merges EVERY column's full
        # value buffer in a single final task (exact percentile partials
        # carry all values). One aggregate per column, cross-joined, lets
        # the K single-task merges run as concurrent stages — identical
        # values, ~2× at sf1.0 for 3×1M doubles.
        wide = None
        for c in columns:
            agg = df.agg(fn(F.col(c).cast("double")).alias(f"_q_{c}"))
            wide = agg if wide is None else wide.crossJoin(agg)
    else:
        aggs = [fn(F.col(c).cast("double")).alias(f"_q_{c}") for c in columns]
        wide = df.agg(*aggs)
    pairs = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(plist).alias("_probs"),
                F.col(f"_q_{c}").alias("_vals"),
            )
            for c in columns
        ])
    ).alias("e")
    return (
        wide.select(pairs)
        .select(
            F.col("e.column").alias("column"),
            F.explode(F.arrays_zip(F.col("e._probs"), F.col("e._vals"))).alias("pv"),
        )
        .select(
            "column",
            F.col("pv._probs").alias("prob"),
            F.round(F.col("pv._vals"), 9).alias("value"),
        )
    )
