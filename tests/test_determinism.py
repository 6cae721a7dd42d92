"""Determinism & dialect tests (SURVEY.md §5, §7 hard parts):

- golden violation/verdict snapshots: two independent runs of the same
  pipeline produce byte-identical sorted parquet;
- unicode char-length semantics match between Spark and DuckDB (rune
  counting, Go parity);
- pattern dialect: gate patterns stay in the Java∩RE2 common subset; the
  documented delta (lookaround) is Java-only.
"""

from __future__ import annotations

import glob
import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark import Rule, compile_pred, compile_table
from jsonschema_go_spark.sources.transcripts import (
    generate_transcripts,
    transcript_table_rule,
)


def _sha_dir(path: str) -> str:
    h = hashlib.sha256()
    for f in sorted(glob.glob(f"{path}/part-*")):
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def test_violation_snapshot_byte_stable(spark, tmp_path):
    """Two independent generate→validate→write runs yield byte-identical
    parquet under stable (conv_id, turn_idx, rule_id) ordering."""
    hashes = []
    for run in ("a", "b"):
        df = generate_transcripts(spark, num_convs=300, seed=42)
        plan = compile_table(transcript_table_rule(), df.schema)
        out = str(tmp_path / f"viol_{run}")
        (
            plan.violations(df, ["conv_id", "turn_idx"], ordered=True)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(out)
        )
        hashes.append(_sha_dir(out))
    assert hashes[0] == hashes[1]


def test_verdict_snapshot_byte_stable(spark, tmp_path):
    hashes = []
    for run in ("a", "b"):
        df = generate_transcripts(spark, num_convs=300, seed=42)
        plan = compile_table(transcript_table_rule(), df.schema)
        out = str(tmp_path / f"verd_{run}")
        (
            plan.verdicts(df, "conv_id")
            .orderBy("partition_key")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(out)
        )
        hashes.append(_sha_dir(out))
    assert hashes[0] == hashes[1]


def test_unicode_char_length_parity(spark, tmp_path):
    """minLength counts characters (runes), not bytes — Go parity
    (SURVEY.md §7); Spark and DuckDB must agree on multibyte text."""
    rows = [("héllo",), ("日本語テキスト",), ("🎉🎉",), ("ascii",), ("",)]
    df = spark.createDataFrame(rows, "t string")
    p = str(tmp_path / "uni.parquet")
    df.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)

    spark_lens = sorted(
        r["l"] for r in back.select(F.length("t").alias("l")).collect()
    )
    con = duckdb.connect()
    duck_lens = sorted(
        r[0] for r in con.sql(f"SELECT length(t) FROM read_parquet('{p}/*.parquet')").fetchall()
    )
    assert spark_lens == duck_lens == [0, 2, 5, 5, 7]

    # the rule semantics: '日本語テキスト' (7 chars, 21 utf-8 bytes) passes
    # maxLength 7 — char semantics, not bytes
    pred = compile_pred(Rule(max_length=7), F.col("t"), back.schema["t"].dataType)
    assert all(r["p"] for r in back.select(pred.alias("p")).collect())


GATE_PATTERNS = [
    # every pattern used in oracle-gated queries must compile in Python (Java
    # superset proxy) AND run identically in DuckDB's RE2
    r"^c[0-9]{8}$", r"^\{.*\}$", r"^src[0-9]+$", r"^[1-5]-[A-Z ]+$",
    r"\d+", r"^[a-z0-9]{4}$", r"^[ab]$", r"^[xyz]$",
]


@pytest.mark.parametrize("pattern", GATE_PATTERNS)
def test_gate_patterns_common_subset(spark, pattern):
    import re

    re.compile(pattern)  # Python/Java-compatible
    con = duckdb.connect()
    # RE2 accepts it too (would raise otherwise)
    con.sql(f"SELECT regexp_matches('probe', '{pattern}')").fetchall()


def test_lookahead_is_java_only(spark):
    """Documented dialect delta (SURVEY.md §7): lookaround works in Spark's
    Java regex but is rejected by RE2 (DuckDB) — rules using it cannot be
    oracle-gated and must live on the Spark-only surface."""
    df = spark.createDataFrame([("password1",), ("password",)], "t string")
    pred = compile_pred(
        Rule(pattern=r"^(?=.*[0-9]).+$"), F.col("t"), df.schema["t"].dataType
    )
    assert [r["p"] for r in df.select(pred.alias("p")).collect()] == [True, False]
    con = duckdb.connect()
    with pytest.raises(Exception):
        con.sql(r"SELECT regexp_matches('x', '^(?=.*[0-9]).+$')").fetchall()
