"""Drift + stats operator tests: chi-square against scipy-free hand values,
binned-KS approximation bound vs exact, HLL vs exact distinct counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark.operators import drift as dr

from .conftest import SF_DIR
from jsonschema_go_spark.operators import stats as st


def test_chi_square_known_value(spark):
    # 2x2 contingency: groups A/B, values x/y with counts A:(30,10) B:(10,30)
    rows = (
        [("A", "x")] * 30 + [("A", "y")] * 10 + [("B", "x")] * 10 + [("B", "y")] * 30
    )
    df = spark.createDataFrame(rows, "grp string, val string")
    out = dr.chi_square(df, "grp", "val").first()
    # expected = 20 per cell; chi2 = 4 * (10^2/20) = 20
    assert out["chi2"] == pytest.approx(20.0, abs=1e-9)
    assert out["dof"] == 1
    assert out["n"] == 80 and out["n_groups"] == 2 and out["n_values"] == 2


def test_chi_square_identical_distributions(spark):
    rows = [("A", v) for v in "xxyyzz"] + [("B", v) for v in "xxyyzz"]
    df = spark.createDataFrame(rows, "grp string, val string")
    assert dr.chi_square(df, "grp", "val").first()["chi2"] == pytest.approx(0.0)


def test_ks_exact_disjoint_and_identical(spark):
    a = spark.createDataFrame([(float(i),) for i in range(100)], "value double")
    b = spark.createDataFrame([(float(i + 1000),) for i in range(100)], "value double")
    assert dr.ks_exact(a, b, "value").first()["ks_d"] == pytest.approx(1.0)
    same = dr.ks_exact(a, a, "value").first()
    assert same["ks_d"] == pytest.approx(0.0)
    assert same["n_a"] == same["n_b"] == 100


def test_ks_binned_close_to_exact(spark):
    # deterministic pseudo-random-ish samples from two shifted distributions
    a = spark.range(0, 2000).select(
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000) / 10.0).alias("value")
    )
    b = spark.range(0, 2000).select(
        (F.pmod(F.xxhash64("id", F.lit(2)), 1000) / 10.0 + 20.0).alias("value")
    )
    exact = dr.ks_exact(a, b, "value").first()["ks_d"]
    approx = dr.ks_binned(a, b, "value", buckets=512).first()["ks_d"]
    # binned error bounded by max per-bin mass (~1/512 * spread factor)
    assert abs(exact - approx) < 0.02
    assert exact > 0.1  # the shift is detectable


def test_column_stats_exact_vs_hll(spark):
    df = spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 100).alias("mod100"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("with_nulls"),
    )
    exact = {r["column"]: r for r in st.column_stats(df, exact_distinct=True).collect()}
    assert exact["id"]["distinct_count"] == 10_000
    assert exact["mod100"]["distinct_count"] == 100
    assert exact["with_nulls"]["null_count"] == 1000
    assert exact["with_nulls"]["null_fraction"] == pytest.approx(0.1)
    assert exact["id"]["min_value"] == "0" and exact["id"]["max_value"] == "9999"

    hll = {r["column"]: r for r in st.column_stats(df, exact_distinct=False, hll_rsd=0.02).collect()}
    # HLL within 3 rsd of truth
    assert abs(hll["id"]["distinct_count"] - 10_000) < 10_000 * 0.06
    assert abs(hll["mod100"]["distinct_count"] - 100) < 12


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",), ("abcd",), (None,), ("abcdefgh",)],
        "t string",
    )
    rows = {r["bucket"]: r for r in st.length_histogram(df, "t").collect()}
    assert rows[-1]["cnt"] == 1      # empty string
    assert rows[0]["cnt"] == 1       # length 1
    assert rows[1]["cnt"] == 2       # lengths 2-3
    assert rows[2]["cnt"] == 1       # lengths 4-7
    assert rows[3]["cnt"] == 1       # length 8
    assert rows[1]["lo"] == 2 and rows[1]["hi"] == 3


def test_salted_contiguity_equals_window(spark):
    """Agg-based (skew-safe) contiguity verdict must agree with the window
    formulation on every group."""
    from jsonschema_go_spark.operators import uniqueness as uq
    from jsonschema_go_spark.sources.transcripts import generate_transcripts

    df = generate_transcripts(spark, num_convs=150, seed=42)
    agg = {
        r["conv_id"]: r["contiguous"]
        for r in uq.contiguity(df, "conv_id", "turn_idx", 0).collect()
    }
    broken_by_window = {
        r["conv_id"]
        for r in uq.contiguity_violations(df, "conv_id", "turn_idx", 0).collect()
    }
    for conv, ok in agg.items():
        assert ok == (conv not in broken_by_window), conv


def test_drift_report(spark):
    from jsonschema_go_spark.operators.drift import drift_report

    a = spark.range(0, 3000).select(
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("cat"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 100) / 10.0).alias("num"),
    )
    b_same = spark.range(3000, 6000).select(
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("cat"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 100) / 10.0).alias("num"),
    )
    b_shifted = spark.range(0, 3000).select(
        F.when(F.col("id") % 10 == 0, "x").otherwise("y").alias("cat"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 100) / 10.0 + 5.0).alias("num"),
    )
    rows = {(r["column"], r["test"]): r for r in drift_report(
        a, b_same, categorical=["cat"], numeric=["num"]).collect()}
    assert rows[("cat", "chi_square")]["drifted"] is False
    assert rows[("num", "ks")]["drifted"] is False
    rows = {(r["column"], r["test"]): r for r in drift_report(
        a, b_shifted, categorical=["cat"], numeric=["num"], ks_buckets=256).collect()}
    assert rows[("cat", "chi_square")]["drifted"] is True
    assert rows[("num", "ks")]["drifted"] is True


def test_repair_mode(spark):
    from jsonschema_go_spark import Rule, TableRule, compile_table

    df = spark.createDataFrame(
        [("a", None), (None, 5), ("c", 7)], "s string, n int"
    )
    tr = TableRule(columns={
        "s": Rule(type="string", default="baz"),
        "n": Rule(type="integer", default=0, minimum=0),
    })
    plan = compile_table(tr, df.schema)
    # `default` never becomes a predicate (annotation-only)
    assert all(c.keyword != "default" for c in plan.checks)
    repaired = plan.repair(df).collect()
    assert [r["s"] for r in repaired] == ["a", "baz", "c"]
    assert [r["n"] for r in repaired] == [0, 5, 7]


def test_drift_report_grouped_matches_per_column(spark):
    """The grouped-Arrow-UDF many-column path must reproduce the per-column
    DataFrame operators exactly (same chi-square cell set, same KS bins)."""
    from jsonschema_go_spark.operators import drift as d

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    b = ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 1)

    per_col = d.drift_report(
        a, b, categorical=["event_type"], numeric=["value", "user_id"],
        ks_buckets=256,
    )
    grouped = d.drift_report_grouped(
        a, b, categorical=["event_type"], numeric=["value", "user_id"],
        ks_buckets=256,
    )
    pc = {r["column"]: r for r in per_col.collect()}
    gr = {r["column"]: r for r in grouped.collect()}
    assert set(pc) == set(gr) == {"event_type", "value", "user_id"}
    for c in pc:
        assert pc[c]["test"] == gr[c]["test"]
        assert gr[c]["statistic"] == pytest.approx(pc[c]["statistic"], rel=1e-9)
        assert pc[c]["drifted"] == gr[c]["drifted"]


def test_drift_report_grouped_all_null_column(spark):
    """Review finding: an all-NULL numeric column crashed bounds computation;
    it is now reported with NULL statistic instead of killing the report."""
    from jsonschema_go_spark.operators import drift as d

    a = spark.createDataFrame(
        [(None, "x", 1.0), (None, "y", 2.0)], "dead double, cat string, v double"
    )
    b = spark.createDataFrame(
        [(None, "x", 1.5), (None, "x", 2.5)], "dead double, cat string, v double"
    )
    out = {r["column"]: r for r in d.drift_report_grouped(
        a, b, categorical=["cat"], numeric=["dead", "v"], ks_buckets=16
    ).collect()}
    assert out["dead"]["statistic"] is None and out["dead"]["drifted"] is None
    assert out["v"]["statistic"] is not None
    assert out["cat"]["test"] == "chi_square"

    # one-side-empty numeric: NULL statistic, not a division crash
    empty_b = b.where(F.col("v") < 0)
    out2 = {r["column"]: r for r in d.drift_report_grouped(
        a, empty_b, numeric=["v"], ks_buckets=16
    ).collect()}
    assert out2["v"]["statistic"] is None


def test_psi_known_value(spark):
    """Hand-computed PSI: a = 80/20 split, b = 50/50 split over two bins →
    0.3·ln(1.6) + (−0.3)·ln(0.4) ≈ 0.415888."""
    from jsonschema_go_spark.operators.drift import psi

    a = spark.createDataFrame([(0.0,)] * 8 + [(1.0,)] * 2, "v double")
    b = spark.createDataFrame([(0.0,)] * 5 + [(1.0,)] * 5, "v double")
    row = psi(a, b, "v", buckets=10).first()
    import math

    want = 0.3 * math.log(0.8 / 0.5) - 0.3 * math.log(0.2 / 0.5)
    assert abs(row["psi"] - want) < 1e-9
    assert row["n_a"] == 10 and row["n_b"] == 10 and row["buckets"] == 10


def test_psi_identical_snapshots_zero(spark):
    from jsonschema_go_spark.operators.drift import psi

    df = spark.range(100).select((F.col("id") % 7).cast("double").alias("v"))
    row = psi(df, df, "v").first()
    assert abs(row["psi"]) < 1e-12


def test_psi_empty_side_is_null(spark):
    from jsonschema_go_spark.operators.drift import psi

    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = a.where(F.col("v") < 0)
    row = psi(a, b, "v").first()
    assert row["psi"] is None and row["n_b"] == 0


def test_binned_bounds_honor_single_pin(spark):
    """A caller-pinned lo (hi from data) must be honored, not clobbered by
    the recomputed combined bounds."""
    from jsonschema_go_spark.operators.drift import _binned_counts

    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(1.5,), (2.0,)], "v double")
    # lo pinned at 0.0, hi=2.0 from data, 4 bins of width 0.5:
    # 1.0→bin2, 1.5→bin3, 2.0→clamped bin3
    merged = {r["bin"]: (r["ca"], r["cb"]) for r in
              _binned_counts(a, b, "v", 4, 0.0, None).collect()}
    assert merged == {2: (1, 0), 3: (1, 2)}
