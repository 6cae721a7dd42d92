"""Golden fixture suites from FIXTURES.md F2-F4 — the analog of the
reference's flagship golden tests (Org/Person, reflect_test.go:36-148):
deterministic generated tables + full rule documents, validated against a
DuckDB oracle over the SAME written parquet.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark import Rule, TableRule, compile_table
from jsonschema_go_spark.oracle import summary_sql

from .conftest import assert_matches_oracle


def _validate_against_duck(spark, tmp_path, df, tr, elem_types, name):
    path = str(tmp_path / f"{name}.parquet")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    duck = duckdb.connect()
    duck.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}/*.parquet')")
    plan = compile_table(tr, back.schema)
    assert_matches_oracle(plan.summary(back), duck, summary_sql(tr, name, elem_types))
    return plan, back


# ------------------------------------------------------------------ F2

def test_f2_person_org(spark, tmp_path):
    """F2: the Org/Person golden fixture flattened (reflect_test.go:36-85):
    formats, required, enum, nullability, and mandatory elision of the
    unconstrained column."""
    n = 500
    df = spark.range(n).select(
        F.timestamp_seconds(1700000000 + F.col("id") * 60).alias("created_at"),
        F.when(F.col("id") % 7 == 0, F.timestamp_seconds(1700003600 + F.col("id"))).alias("deleted_at"),
        F.date_add(F.lit("1970-01-01").cast("date"), (F.col("id") % 20000).cast("int")).alias("birth_date"),
        F.concat(F.lit("fn"), F.col("id")).alias("first_name"),
        F.when(F.col("id") % 31 == 0, None).otherwise(F.concat(F.lit("ln"), F.col("id"))).alias("last_name"),
        (F.col("id") % 250).cast("int").alias("height"),
        # TextMarshaler-style `level:title` string (reflect_test.go:25-27);
        # every 13th row violates the pattern
        F.when(F.col("id") % 13 == 0, F.lit("BROKEN"))
        .otherwise(F.concat(F.lit("level"), (F.col("id") % 5), F.lit(":title"), (F.col("id") % 3)))
        .alias("role"),
        F.when(F.col("id") % 11 == 0, F.lit("baz"))
        .when(F.col("id") % 2 == 0, F.lit("foo"))
        .otherwise(F.lit("bar"))
        .alias("enumed"),
        F.lit('{"raw": true}').alias("meta"),
    )
    tr = TableRule(
        name="person_org",
        columns={
            "created_at": Rule(type="string", format="date-time"),
            "deleted_at": Rule(type=["string", "null"], format="date-time"),
            "birth_date": Rule(type="string", format="date"),
            "first_name": Rule(type="string"),  # trivial — MUST be elided
            "last_name": Rule(type="string"),
            "height": Rule(type="integer", minimum=0),
            "role": Rule(type="string", pattern=r"^[a-z]+[0-9]*:[a-z]+[0-9]*$"),
            "enumed": Rule(type="string", enum=["foo", "bar"]),
            "meta": Rule(type="string"),  # raw passthrough — trivial
        },
        metadata={"required": ["created_at", "birth_date", "last_name", "role"]},
    )
    elem = {
        "created_at": "timestamp", "deleted_at": "timestamp",
        "birth_date": "date", "first_name": "string", "last_name": "string",
        "height": "integer", "role": "string", "enumed": "string", "meta": "string",
    }
    plan, back = _validate_against_duck(spark, tmp_path, df, tr, elem, "person_org")
    # trivial columns compiled to NOTHING (helper.go:194 elision contract)
    assert not any(c.column in ("first_name", "meta") for c in plan.checks)
    # native timestamp/date columns: format statically satisfied
    assert "created_at.format" not in plan.rule_ids
    summ = {r["rule_id"]: r["fail_count"] for r in plan.summary(back).collect()}
    assert summ["role.pattern"] == 500 // 13 + 1
    assert summ["enumed.enum"] > 0
    assert summ["last_name.required"] > 0


# ------------------------------------------------------------------ F3

def test_f3_bounds_matrix(spark, tmp_path):
    """F3: numeric/string keyword matrix (README.md:73-113 field-tag
    contract)."""
    n = 400
    df = spark.range(n).select(
        (F.col("id") * 1.7 + 5.0).alias("amount"),
        ((F.col("id") % 300) - 150).cast("int").alias("bounded"),
        F.when(F.col("id") % 9 == 0, F.lit("NOPE!"))
        .otherwise(F.lpad(F.lower(F.conv(F.col("id").cast("string"), 10, 36)), 4, "a"))
        .alias("special"),
        F.when(F.col("id") % 17 == 0, F.lit("nodigits"))
        .otherwise(F.concat(F.lit("x"), F.col("id")))
        .alias("foo"),
        ((F.col("id") % 16) * 0.25 + F.when(F.col("id") % 5 == 0, 0.1).otherwise(0.0)).alias("mult"),
        ((F.col("id") % 12) / 10.0).alias("excl"),
        F.when(
            F.col("id") % 4 == 0,
            F.concat_ws(
                "-",
                F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                F.substring(F.md5(F.col("id").cast("string")), 9, 4),
                F.substring(F.md5(F.col("id").cast("string")), 13, 4),
                F.substring(F.md5(F.col("id").cast("string")), 17, 4),
                F.substring(F.md5(F.col("id").cast("string")), 21, 12),
            ),
        ).otherwise(F.md5(F.col("id").cast("string"))).alias("uid"),
        F.when(F.col("id") % 3 == 0, F.base64(F.col("id").cast("string").cast("binary")))
        .otherwise(F.lit("###not-base64###"))
        .alias("blob"),
    )
    tr = TableRule(
        name="bounds",
        columns={
            "amount": Rule(type="number", minimum=10.5),
            "bounded": Rule(type="integer", minimum=-100, maximum=100),
            "special": Rule(type="string", pattern="^[a-z0-9]{4}$", min_length=4, max_length=4),
            "foo": Rule(type="string", pattern=r"\d+", default="baz"),
            "mult": Rule(type="number", multiple_of=0.25),
            "excl": Rule(type="number", exclusive_minimum=0, exclusive_maximum=1),
            "uid": Rule(type="string", format="uuid"),
            "blob": Rule(type="string", format="base64"),
        },
        metadata={"required": ["foo"]},
    )
    elem = {c: ("integer" if c == "bounded" else "double" if c in ("amount", "mult", "excl") else "string")
            for c in tr.columns}
    plan, back = _validate_against_duck(spark, tmp_path, df, tr, elem, "bounds")
    summ = {r["rule_id"]: r["fail_count"] for r in plan.summary(back).collect()}
    # every keyword family must actually catch something in this fixture
    for rid in ["amount.minimum", "bounded.minimum", "bounded.maximum",
                "special.pattern", "foo.pattern", "mult.multipleOf",
                "excl.exclusiveMinimum", "uid.format", "blob.format"]:
        assert summ[rid] > 0, rid


# ------------------------------------------------------------------ F4

def test_f4_arrays(spark, tmp_path):
    """F4: nested-collection keywords on array columns (map columns can't
    round-trip the oracle through DuckDB views uniformly; map keywords are
    covered in test_compile_nested)."""
    n = 300
    df = spark.range(n).select(
        F.when(F.col("id") % 19 == 0, F.array().cast("array<int>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), (F.pmod(F.col("id"), 12) + 1).cast("int")),
                lambda i: (i * F.when(F.pmod(F.col("id"), 23) == 0, -1).otherwise(1)).cast("int"),
            )
        )
        .alias("ints"),
        F.when(F.col("id") % 8 == 0, F.array(F.lit("abc"), F.lit("abc")))
        .when(F.col("id") % 3 == 0, F.array(F.lit("abc"), F.lit("zzz")))
        .otherwise(F.array(F.lit("abc"), F.lit("def")))
        .alias("tags"),
    )
    tr = TableRule(
        name="arrays",
        columns={
            "ints": Rule(
                type="array", min_items=1, max_items=10,
                items=Rule(type="integer", minimum=0),
            ),
            "tags": Rule(
                type="array", unique_items=True,
                items=Rule(enum=["abc", "def"]),
            ),
        },
        metadata={"required": ["ints", "tags"]},
    )
    elem = {"ints": "array", "tags": "array"}
    plan, back = _validate_against_duck(spark, tmp_path, df, tr, elem, "arrays")
    summ = {r["rule_id"]: r["fail_count"] for r in plan.summary(back).collect()}
    for rid in ["ints.minItems", "ints.maxItems", "ints.items",
                "tags.uniqueItems", "tags.items"]:
        assert summ[rid] > 0, rid
