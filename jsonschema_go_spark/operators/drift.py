"""Distribution-drift checks between partition snapshots (SURVEY.md §2.3).

No reference analogue — this is the scale-added operator family mandated by
the north rule. Both statistics are computed from *aggregated* counts, so the
expensive part is one hash-agg over the data; the statistic itself runs on a
tiny DataFrame (≤ distinct values / buckets) with broadcast joins.

- **chi-square** (categorical): contingency table via ``groupBy(group,
  value).count()``, expected counts from broadcast marginals, statistic as a
  pure-SQL sum — no UDF at all.
- **KS** (numeric): exact variant via global-ordered ECDF (test/oracle path),
  binned variant (B buckets) for the 100 TB path where a global sort is not
  acceptable: D_approx error ≤ max per-bucket mass.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    categorical: Sequence[str] = (),
    numeric: Sequence[str] = (),
    ks_buckets: Optional[int] = None,
    chi2_threshold: float = 30.0,
    ks_threshold: float = 0.1,
) -> DataFrame:
    """Snapshot-pair drift report: one row per checked column →
    ``(column, test, statistic, drifted)``.

    ``df_a``/``df_b`` are two partition snapshots (e.g. two Iceberg snapshot
    reads through TableIO). Chi-square for categorical columns, KS for
    numeric (exact by default, binned when ``ks_buckets`` is set — the
    100 TB path). Thresholds are plain cutoffs; callers wanting p-values can
    post-process the statistics.
    """
    from functools import reduce as _reduce

    parts = []
    for col in categorical:
        both = df_a.select(F.lit("a").alias("_snap"), F.col(col)).unionByName(
            df_b.select(F.lit("b").alias("_snap"), F.col(col))
        )
        stat = chi_square(both, "_snap", col).select(
            F.lit(col).alias("column"),
            F.lit("chi_square").alias("test"),
            F.col("chi2").alias("statistic"),
            (F.col("chi2") > chi2_threshold).alias("drifted"),
        )
        parts.append(stat)
    for col in numeric:
        ks = (
            ks_binned(df_a, df_b, col, buckets=ks_buckets)
            if ks_buckets
            else ks_exact(df_a, df_b, col)
        )
        parts.append(
            ks.select(
                F.lit(col).alias("column"),
                F.lit("ks").alias("test"),
                F.col("ks_d").alias("statistic"),
                (F.col("ks_d") > ks_threshold).alias("drifted"),
            )
        )
    if not parts:
        raise ValueError("no columns to check")
    return _reduce(lambda a, b: a.unionByName(b), parts)


def drift_report_grouped(
    df_a: DataFrame,
    df_b: DataFrame,
    categorical: Sequence[str] = (),
    numeric: Sequence[str] = (),
    ks_buckets: int = 1024,
    chi2_threshold: float = 30.0,
    ks_threshold: float = 0.1,
) -> DataFrame:
    """Many-column drift report in ONE data pass per snapshot (SURVEY.md §2.3
    grouped-Arrow-UDF path; ROADMAP item 5).

    :func:`drift_report` plans one aggregate per column — fine for dozens,
    wasteful for hundreds (N full scans). This variant melts every checked
    column into long form (column, value) with a single ``explode``, runs ONE
    hash-agg over all columns at once, then computes each column's statistic
    from its aggregated counts in a grouped ``applyInPandas`` (Arrow-batched;
    each group is ≤ distinct-values/bins rows, so Python touches tiny data).
    Numeric columns use the binned-KS formulation (same bins as
    :func:`ks_binned`); categorical use the identical chi-square formula —
    results match the per-column operators exactly (tested).

    Output: ``(column, test, statistic, drifted)`` — same shape as
    :func:`drift_report`.
    """
    import pandas as pd

    if not categorical and not numeric:
        raise ValueError("no columns to check")

    bounds = {}
    degenerate = []  # (column, test) all-NULL on both sides: nothing to compare
    # ONE stats pass per snapshot covers numeric bounds AND categorical
    # non-null counts (all-NULL categorical groups never form in the melt,
    # so they must be detected up front or they'd vanish from the report)
    aggs = []
    for c in numeric:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"mn_{c}"), F.max(v).alias(f"mx_{c}")]
    for c in categorical:
        aggs.append(F.count(F.col(c)).alias(f"ct_{c}"))
    ba, bb = df_a.agg(*aggs).first(), df_b.agg(*aggs).first()
    for c in numeric:
        # None-safe bounds: one side may have zero non-null values
        mns = [x for x in (ba[f"mn_{c}"], bb[f"mn_{c}"]) if x is not None]
        mxs = [x for x in (ba[f"mx_{c}"], bb[f"mx_{c}"]) if x is not None]
        if not mns:
            degenerate.append((c, "ks"))
            continue
        lo, hi = min(mns), max(mxs)
        bounds[c] = (lo, (hi - lo) or 1.0)
    degenerate += [
        (c, "chi_square")
        for c in categorical
        if ba[f"ct_{c}"] == 0 and bb[f"ct_{c}"] == 0
    ]
    deg_cols = {c for c, _ in degenerate}
    numeric = [c for c in numeric if c not in deg_cols]
    categorical = [c for c in categorical if c not in deg_cols]

    out_schema = "column string, test string, statistic double, drifted boolean"
    deg_df = (
        df_a.sparkSession.createDataFrame(
            [(c, t, None, None) for c, t in degenerate], out_schema
        )
        if degenerate
        else None
    )
    if not categorical and not numeric:
        return deg_df  # guaranteed non-None: the entry guard required columns

    def melt(df: DataFrame, snap: str) -> DataFrame:
        structs = []
        for c in categorical:
            structs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit("chi_square").alias("test"),
                    F.col(c).cast("string").alias("val_str"),
                    F.lit(None).cast("long").alias("val_num"),
                    F.col(c).isNull().alias("_null"),
                )
            )
        for c in numeric:
            lo, span = bounds[c]
            v = F.col(c).cast("double")
            b = F.least(
                F.greatest(F.floor((v - F.lit(lo)) / F.lit(span) * ks_buckets), F.lit(0)),
                F.lit(ks_buckets - 1),
            ).cast("long")
            structs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit("ks").alias("test"),
                    F.lit(None).cast("string").alias("val_str"),
                    b.alias("val_num"),
                    F.col(c).isNull().alias("_null"),
                )
            )
        return (
            df.select(F.explode(F.array(*structs)).alias("m"))
            .select(F.lit(snap).alias("snap"), "m.*")
            .where(~F.col("_null"))
            .drop("_null")
        )

    counts = (
        melt(df_a, "a")
        .unionByName(melt(df_b, "b"))
        .groupBy("column", "test", "val_str", "val_num", "snap")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def stat(pdf: "pd.DataFrame") -> "pd.DataFrame":
        col, test = pdf["column"].iloc[0], pdf["test"].iloc[0]
        if test == "chi_square":
            piv = pdf.pivot_table(
                index="val_str", columns="snap", values="cnt", aggfunc="sum", fill_value=0
            )
            for s in ("a", "b"):
                if s not in piv.columns:
                    piv[s] = 0
            o = piv[["a", "b"]].to_numpy(dtype="float64")
            rt, ct, n = o.sum(axis=1, keepdims=True), o.sum(axis=0, keepdims=True), o.sum()
            e = rt @ ct / n
            # observed cells only — chi_square() builds its cell set from a
            # groupBy of PRESENT (group, value) pairs, so zero cells do not
            # contribute their (0-e)^2/e term; mirror that exactly
            statistic = float(((o - e) ** 2 / e)[(o > 0) & (e > 0)].sum())
            drifted = statistic > chi2_threshold
        else:
            piv = pdf.pivot_table(
                index="val_num", columns="snap", values="cnt", aggfunc="sum", fill_value=0
            ).sort_index()
            for s in ("a", "b"):
                if s not in piv.columns:
                    piv[s] = 0
            ca, cb = piv["a"].to_numpy("float64"), piv["b"].to_numpy("float64")
            na, nb = ca.sum(), cb.sum()
            if na == 0 or nb == 0:
                # one snapshot has no values: no ECDF to compare
                return pd.DataFrame(
                    [{"column": col, "test": test, "statistic": None, "drifted": None}]
                )
            statistic = float(abs(ca.cumsum() / na - cb.cumsum() / nb).max())
            drifted = statistic > ks_threshold
        return pd.DataFrame(
            [{"column": col, "test": test, "statistic": statistic, "drifted": bool(drifted)}]
        )

    out = counts.groupBy("column").applyInPandas(stat, out_schema)
    if deg_df is not None:
        # all-NULL-everywhere columns are reported, not silently dropped
        out = out.unionByName(deg_df)
    return out


def chi_square(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Pearson chi-square of independence between ``group_col`` (snapshot id)
    and ``value_col`` (categorical) → one row
    ``(chi2, dof, n, n_groups, n_values)``.
    """
    obs = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    return chi_square_from_counts(obs, group_col, value_col, "o")


def chi_square_from_counts(
    counts: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str,
) -> DataFrame:
    """Chi-square from PRE-AGGREGATED ``(group, value, count)`` rows — the
    entry point for counts that already exist, e.g. the windowed per-value
    counts a streaming drift monitor maintains
    (:func:`streaming.validate_stream.windowed_category_counts`): the
    statistic then costs only tiny aggregations over the count table, never a
    second pass over the data."""
    obs = (
        counts.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.sum(F.col(count_col).cast("double")).alias("o"))
    )
    # marginals via windows over the COUNT table — it has only
    # n_groups × n_values rows (tiny by the definition of categorical drift),
    # so even the unpartitioned total window is trivial, and the plan needs
    # no self-joins (three joins on the same subtree also trip Spark's
    # conflicting-reference dedup on some leaf nodes, e.g. streaming memory
    # sinks)
    cells = (
        obs.select(
            F.col(group_col),
            F.col(value_col),
            "o",
            F.sum("o").over(Window.partitionBy(group_col)).alias("rt"),
            F.sum("o").over(Window.partitionBy(value_col)).alias("ct"),
            F.sum("o").over(Window.partitionBy()).alias("n"),
        )
        .withColumn("e", F.col("rt") * F.col("ct") / F.col("n"))
        .withColumn("term", F.pow(F.col("o") - F.col("e"), 2) / F.col("e"))
    )
    return cells.agg(
        F.sum("term").alias("chi2"),
        ((F.count_distinct(group_col) - 1) * (F.count_distinct(value_col) - 1))
        .cast("long")
        .alias("dof"),
        F.max("n").cast("long").alias("n"),
        F.count_distinct(group_col).cast("long").alias("n_groups"),
        F.count_distinct(value_col).cast("long").alias("n_values"),
    )


def ks_exact(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    range_partitions: int = 0,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D → one row ``(ks_d, n_a, n_b)``.

    ECDF via a DISTRIBUTED two-phase prefix sum over the aggregated distinct
    values (rewritten round 5 — the previous form sorted all distinct values
    in ONE unpartitioned window task, the last single-task construct in the
    engine): ``repartitionByRange(v)`` splits the distinct values into
    balanced sorted ranges (sampling handles value skew), a per-partition
    cumulative window computes local prefix sums in parallel, per-partition
    TOTALS are the last local prefix (cumsum of non-negative counts ⇒ max),
    and a second cumulative window over those ≤P total rows (the only
    unpartitioned window left — bounded by the partition COUNT, never by
    data) yields the range offsets broadcast back onto the local sums.
    Results are bit-identical to the single-window form (exact long
    arithmetic re-associated, same doubles at the division — parity-
    pytested, oracle gate unchanged). Exact at any distinct-value
    cardinality; raise ``range_partitions`` (default: session shuffle
    partitions) to bound per-task sort size.
    """
    a = (
        df_a.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        df_b.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    merged = a.join(b, "v", "full_outer").select(
        "v",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    spark = df_a.sparkSession
    P = range_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = merged.repartitionByRange(P, "v").withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.select(
        "_pid",
        F.sum("ca").over(w_local).alias("la"),
        F.sum("cb").over(w_local).alias("lb"),
    )
    # per-range totals = the last local prefix (counts ≥ 0 ⇒ cumsum is
    # non-decreasing ⇒ max); derived from the SAME windowed subtree so the
    # range exchange is reused, not recomputed (plan-audited)
    tot = local.groupBy("_pid").agg(
        F.max("la").alias("ta"), F.max("lb").alias("tb")
    )
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    offs = tot.select(
        "_pid",
        F.coalesce(F.sum("ta").over(w_prev), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(w_prev), F.lit(0)).alias("ob"),
        F.sum("ta").over(w_all).alias("na"),
        F.sum("tb").over(w_all).alias("nb"),
    )
    ecdf = local.join(F.broadcast(offs), "_pid").select(
        (F.col("la") + F.col("oa")).alias("cum_a"),
        (F.col("lb") + F.col("ob")).alias("cum_b"),
        "na",
        "nb",
    )
    # null-safe: a snapshot with zero values has no ECDF (x/0 aborts under
    # ANSI) — report ks_d NULL instead of killing the job
    diff = F.when(
        (F.col("na") == 0) | (F.col("nb") == 0), F.lit(None)
    ).otherwise(F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")))
    return ecdf.agg(
        F.max(diff).alias("ks_d"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"),
    )


def _binned_counts(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    buckets: int,
    lo: Optional[float],
    hi: Optional[float],
) -> Optional[DataFrame]:
    """Shared equal-width binning for :func:`ks_binned` and :func:`psi` →
    ``(bin, ca, cb)`` with zero-filled absent bins, or ``None`` when both
    snapshots are all-NULL. A caller-pinned ``lo``/``hi`` is honored even
    when only ONE bound is given (the other fills from the data) — pinning
    one edge keeps bins comparable across snapshot pairs."""
    va = F.col(value_col).cast("double")
    if lo is None or hi is None:
        bounds_a = df_a.agg(F.min(va).alias("mn"), F.max(va).alias("mx")).first()
        bounds_b = df_b.agg(F.min(va).alias("mn"), F.max(va).alias("mx")).first()
        mns = [x for x in (bounds_a["mn"], bounds_b["mn"]) if x is not None]
        mxs = [x for x in (bounds_a["mx"], bounds_b["mx"]) if x is not None]
        if not mns and (lo is None or hi is None):
            return None
        if lo is None:
            lo = min(mns)
        if hi is None:
            hi = max(mxs)
    span = (hi - lo) or 1.0

    def binned(df: DataFrame, alias: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(span) * buckets),
                F.lit(0),
            ),
            F.lit(buckets - 1),
        ).cast("int")
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    return binned(df_a, "ca").join(binned(df_b, "cb"), "bin", "full_outer").select(
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )


def ks_binned(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    buckets: int = 1024,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """Approximate KS over B fixed-width bins — the 100 TB path.

    One agg per side for (min,max) when bounds not given, one binned hash-agg
    per side, then the cumulative scan runs over ≤B rows on a single tiny
    task. Approximation error ≤ max per-bin probability mass.
    → ``(ks_d, n_a, n_b, buckets)``.
    """
    merged = _binned_counts(df_a, df_b, value_col, buckets, lo, hi)
    if merged is None:
        # both snapshots all-NULL: no distribution to compare
        return df_a.sparkSession.createDataFrame(
            [(None, 0, 0, buckets)],
            "ks_d double, n_a long, n_b long, buckets long",
        )
    # totals via windows over merged (≤ buckets rows): a separate aggregate
    # would re-evaluate the subtree and scan both inputs twice
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ecdf = merged.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    diff = F.when(
        (F.col("na") == 0) | (F.col("nb") == 0), F.lit(None)
    ).otherwise(F.abs(F.col("cum_a") / F.col("na") - F.col("cum_b") / F.col("nb")))
    return ecdf.agg(
        F.max(diff).alias("ks_d"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"),
        F.lit(buckets).cast("long").alias("buckets"),
    )


def psi(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    buckets: int = 10,
    eps: float = 1e-6,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric column
    → one row ``(psi, n_a, n_b, buckets)``.

    PSI = Σ_bins (p_a − p_b) · ln(p_a / p_b) over ``buckets`` equal-width
    bins spanning the combined [min, max] (identical binning to
    :func:`ks_binned`); empty-bin proportions are floored at ``eps`` — the
    standard PSI guard, applied identically in the DuckDB oracle. Rule of
    thumb: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 drifted.

    Same 100 TB shape as :func:`ks_binned`: one bounds agg + one binned
    hash-agg per side; the statistic reduces ≤ ``buckets`` rows.
    """
    merged = _binned_counts(df_a, df_b, value_col, buckets, lo, hi)
    if merged is None:
        return df_a.sparkSession.createDataFrame(
            [(None, 0, 0, buckets)],
            "psi double, n_a long, n_b long, buckets long",
        )
    # totals via windows over merged (≤ buckets rows): a separate aggregate
    # would re-evaluate the subtree and scan both inputs twice
    w_all = Window.partitionBy()
    cells = merged.select(
        "ca",
        "cb",
        F.sum("ca").over(w_all).alias("na"),
        F.sum("cb").over(w_all).alias("nb"),
    )
    pa = F.greatest(F.col("ca") / F.col("na"), F.lit(eps))
    pb = F.greatest(F.col("cb") / F.col("nb"), F.lit(eps))
    # null-safe: a zero-row snapshot has no distribution (and x/0 aborts
    # under ANSI) — report psi NULL instead of killing the job (same guard
    # pattern as ks_exact/ks_binned)
    term = F.when(
        (F.col("na") == 0) | (F.col("nb") == 0), F.lit(None)
    ).otherwise((pa - pb) * F.log(pa / pb))
    return cells.agg(
        F.sum(term).alias("psi"),
        F.first("na").cast("long").alias("n_a"),
        F.first("nb").cast("long").alias("n_b"),
        F.lit(buckets).cast("long").alias("buckets"),
    )
