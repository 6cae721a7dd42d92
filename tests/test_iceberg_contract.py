"""Contract tests for the TableIO Iceberg branch (no iceberg runtime jar in
the sandbox, so the branch is exercised against recording fakes — VERDICT.md
item 8: the branch must at least be executed) plus the violation-sampling
cap (item 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_go_spark import Rule, TableRule, compile_table
from jsonschema_go_spark.sources.io import TableIO


class _FakeWriteTo:
    def __init__(self, log, name):
        self.log, self.name = log, name

    def append(self):
        self.log.append(("append", self.name))

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.name))


class _FakeReader:
    def __init__(self, log):
        self.log = log
        self._fmt = None

    def format(self, fmt):
        self._fmt = fmt
        return self

    def load(self, name):
        self.log.append(("read", self._fmt, name))
        return "SENTINEL_DF"


class _FakeCatalog:
    def __init__(self, tables):
        self.tables = tables

    def tableExists(self, name):
        return name in self.tables


class _FakeSpark:
    def __init__(self, log, tables=()):
        self.log = log
        self.catalog = _FakeCatalog(set(tables))

    @property
    def read(self):
        return _FakeReader(self.log)

    def sql(self, q):
        self.log.append(("sql", q))


def test_iceberg_append_and_overwrite_route_through_writeTo(spark, monkeypatch):
    calls = []
    df = spark.range(3)
    # Spark 4's classic DataFrame subclass overrides writeTo — patch the
    # instance's concrete class, not the pyspark.sql.DataFrame base
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, name: _FakeWriteTo(calls, name)
    )
    io = TableIO(spark, format="iceberg")
    io.append(df, "lake.db.violations")
    io.overwrite(df, "lake.db.verdicts")
    assert calls == [
        ("append", "lake.db.violations"),
        ("createOrReplace", "lake.db.verdicts"),
    ]


def test_iceberg_read_and_delete_partition_contract():
    calls = []
    io = TableIO(_FakeSpark(calls, tables={"lake.db.t"}), format="iceberg")
    assert io.read("lake.db.t") == "SENTINEL_DF"
    io.delete_partition("lake.db.t", "bucket", 3)
    assert calls == [
        ("read", "iceberg", "lake.db.t"),
        ("sql", "DELETE FROM lake.db.t WHERE bucket = 3"),
    ]
    # no-op contract: a fresh run deletes before the table exists — must not
    # issue DELETE FROM against a missing table (review finding)
    calls2 = []
    io2 = TableIO(_FakeSpark(calls2), format="iceberg")
    io2.delete_partition("lake.db.missing", "bucket", 0)
    assert calls2 == []


# ------------------------------------------------------- violation sampling

def test_violations_sampled_caps_pathological_rule(spark):
    # `v.false` fails EVERY row; `w.minimum` fails a handful
    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.lit("x").alias("v"),
        F.when(F.col("id") < 7, -1).otherwise(5).alias("w"),
    )
    tr = TableRule(
        name="t", columns={"v": False, "w": Rule(minimum=0)}, metadata={}
    )
    plan = compile_table(tr, df.schema)

    sampled = plan.violations_sampled(df, ["k"], max_per_rule=25)
    counts = {
        r["rule_id"]: r["n"]
        for r in sampled.groupBy("rule_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"v.false": 25, "w.minimum": 7}

    # deterministic: the FIRST max_per_rule failures in key order, twice
    a = sorted(tuple(r) for r in sampled.collect())
    b = sorted(tuple(r) for r in plan.violations_sampled(df, ["k"], max_per_rule=25).collect())
    assert a == b
    ks = sorted(r["k"] for r in sampled.where(F.col("rule_id") == "v.false").collect())
    assert ks == list(range(25))
