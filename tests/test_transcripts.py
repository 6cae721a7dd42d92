"""End-to-end transcript validation vs a DuckDB oracle over the SAME parquet
(FIXTURES.md F1): the generator writes once, then Spark plan results and
DuckDB SQL recomputations must agree exactly — including violation rows under
stable (conv_id, turn_idx) ordering (the per-turn text equality invariant
from BASELINE.json input_hint).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark import compile_table
from jsonschema_go_spark.oracle import summary_sql
from jsonschema_go_spark.operators import uniqueness as uniq_ops
from jsonschema_go_spark.sources.transcripts import (
    CONV_ID_PATTERN,
    generate_transcripts,
    transcript_table_rule,
)

from .conftest import assert_matches_oracle

ELEM_TYPES = {
    "conv_id": "string", "turn_idx": "integer", "role": "string",
    "text": "string", "tool": "string", "ts": "timestamp",
}


@pytest.fixture(scope="module")
def transcripts(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "transcripts.parquet")
    df = generate_transcripts(spark, num_convs=500, seed=42)
    df.write.mode("overwrite").parquet(path)
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW transcripts AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return spark.read.parquet(path), duck


def test_generator_deterministic(spark):
    a = generate_transcripts(spark, num_convs=50, seed=42)
    b = generate_transcripts(spark, num_convs=50, seed=42)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = generate_transcripts(spark, num_convs=50, seed=7)
    assert c.exceptAll(a).count() > 0


def test_skew_conversation_present(spark):
    df = generate_transcripts(spark, num_convs=500, seed=42)
    sizes = df.groupBy("conv_id").count().orderBy(F.desc("count")).limit(2).collect()
    # hot conversation ≈1% of all rows, much larger than the runner-up
    assert sizes[0]["count"] >= 2.5 * sizes[1]["count"]
    assert sizes[0]["conv_id"] == "c00000000"


def test_validation_summary_matches_duckdb(transcripts):
    df, duck = transcripts
    tr = transcript_table_rule()
    plan = compile_table(tr, df.schema)
    sql = summary_sql(tr, "transcripts", ELEM_TYPES)
    assert_matches_oracle(plan.summary(df), duck, sql)
    # violations were injected — the run must not be clean
    total_fails = plan.summary(df).agg(F.sum("fail_count")).first()[0]
    assert total_fails > 0


def test_violation_rows_match_duckdb(transcripts):
    df, duck = transcripts
    tr = transcript_table_rule()
    plan = compile_table(tr, df.schema)
    viol = plan.violations(df, ["conv_id", "turn_idx"]).select(
        "conv_id", "turn_idx", "rule_id", "observed"
    )
    # oracle: recompute two representative keyword violations in SQL
    got = {
        (r["rule_id"],)
        for r in viol.select("rule_id").distinct().collect()
    }
    assert ("role.enum",) in got or ("conv_id.pattern",) in got

    pattern_viol = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in viol.where(F.col("rule_id") == "conv_id.pattern").collect()
    )
    oracle_rows = sorted(
        tuple(r) for r in duck.sql(
            "SELECT conv_id, turn_idx FROM transcripts "
            "WHERE conv_id IS NOT NULL AND NOT regexp_matches(conv_id, '^c[0-9]{8}$')"
        ).fetchall()
    )
    assert pattern_viol == oracle_rows

    null_text = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in viol.where(F.col("rule_id") == "text.required").collect()
    )
    oracle_null = sorted(
        tuple(r) for r in duck.sql(
            "SELECT conv_id, turn_idx FROM transcripts WHERE text IS NULL"
        ).fetchall()
    )
    assert null_text == oracle_null


def test_per_turn_text_equality(transcripts):
    """Row invariant vs oracle: per-turn text equality under stable
    (conv_id, turn_idx) ordering (BASELINE.json input_hint)."""
    df, duck = transcripts
    spark_rows = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in df.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx", "text")
        .limit(2000)
        .collect()
    ]
    duck_rows = duck.sql(
        "SELECT conv_id, turn_idx, text FROM transcripts "
        "ORDER BY conv_id, turn_idx, text LIMIT 2000"
    ).fetchall()
    assert spark_rows == [tuple(r) for r in duck_rows]


def test_verdicts_match_duckdb(transcripts):
    """The flagship gate's shape: per-conversation verdicts vs
    oracle.verdict_sql over the SAME staged parquet (the driver's
    transcript_validation CORRECTNESS row runs exactly this comparison)."""
    from jsonschema_go_spark.oracle import verdict_sql

    df, duck = transcripts
    tr = transcript_table_rule()
    plan = compile_table(tr, df.schema)
    sql = verdict_sql(tr, "transcripts", "conv_id", ELEM_TYPES)
    assert_matches_oracle(plan.verdicts(df, "conv_id"), duck, sql)
    # injected violations must fail some conversations
    assert plan.verdicts(df, "conv_id").where(~F.col("passed")).count() > 0


def test_uniqueness_matches_duckdb(transcripts):
    df, duck = transcripts
    assert_matches_oracle(
        uniq_ops.uniqueness_verdict(df, ["conv_id", "turn_idx"]),
        duck,
        """
        WITH per AS (
          SELECT conv_id, turn_idx, COUNT(*) AS n FROM transcripts GROUP BY 1, 2
        )
        SELECT SUM(n)::BIGINT AS total_rows, COUNT(*)::BIGINT AS distinct_keys,
               SUM(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS duplicate_rows,
               (MAX(n) <= 1) AS passed
        FROM per
        """,
    )


def test_contiguity_matches_duckdb(transcripts):
    df, duck = transcripts
    per = uniq_ops.contiguity(df, "conv_id", "turn_idx", start=0)
    agg = per.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.col("contiguous").cast("long")).alias("contiguous_groups"),
    )
    assert_matches_oracle(
        agg,
        duck,
        """
        WITH per AS (
          SELECT conv_id, COUNT(*) n, COUNT(DISTINCT turn_idx) d,
                 MIN(turn_idx) mn, MAX(turn_idx) mx,
                 SUM(CASE WHEN turn_idx IS NULL THEN 1 ELSE 0 END) n_nulls
          FROM transcripts GROUP BY 1
        )
        SELECT COUNT(*)::BIGINT AS n_groups,
               SUM(CASE WHEN n_nulls = 0 AND mn = 0 AND mx = n - 1 AND d = n
                        THEN 1 ELSE 0 END)::BIGINT AS contiguous_groups
        FROM per
        """,
    )
    # injected turn_idx violations must break some chains
    broken = per.where(~F.col("contiguous")).count()
    assert broken > 0


def test_contiguity_violations_window(transcripts):
    df, duck = transcripts
    v = uniq_ops.contiguity_violations(df, "conv_id", "turn_idx", start=0)
    # every conv flagged broken by the agg check has >=1 window violation row
    agg_broken = {
        r["conv_id"]
        for r in uniq_ops.contiguity(df, "conv_id", "turn_idx", 0)
        .where(~F.col("contiguous"))
        .collect()
    }
    win_convs = {r["conv_id"] for r in v.select("conv_id").distinct().collect()}
    # window catches gaps/regressions; pure duplicates show gap 0 twice → also
    # covered because dup row has gap -1... both sets must agree on gap-type
    assert agg_broken == win_convs


def test_violation_annotations_match_compiled_checks(spark):
    """oracle.violations_sql derives (column, keyword, expected) WITHOUT
    compiling Columns — it must agree with the compiled plan's own checks for
    every rule_id (guards the two paths against divergence)."""
    from jsonschema_go_spark.compile import expected_annotation
    from jsonschema_go_spark.oracle import check_preds_sql

    tr = transcript_table_rule()
    df = generate_transcripts(spark, num_convs=5, seed=42)
    plan = compile_table(tr, df.schema)
    required = set(tr.metadata.get("required", []))
    preds = check_preds_sql(tr, ELEM_TYPES)
    assert [c.rule_id for c in preds] == plan.rule_ids
    by_id = {c.rule_id: c for c in preds}
    for ch in plan.checks:
        c = by_id[ch.rule_id]
        assert c.column == ch.column and c.keyword == ch.keyword
        key = (
            "column-required"
            if (c.keyword == "required" and c.column in required)
            else c.keyword
        )
        assert expected_annotation(tr.columns.get(c.column, True), key) == ch.expected
