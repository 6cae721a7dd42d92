"""Shared fixtures: one SparkSession per test session + a DuckDB connection
with the driver's view registration convention (TESTDATA.md tables)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .appName("jsonschema-go-spark-tests")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return v


def normalize(rows, columns):
    """Sort columns by name, canonicalize cells, sort rows — the driver's
    order-insensitive value-hash, reconstructed for assertion diffs."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(_canon_cell(r[i]) for i in order))
    return sorted(columns), sorted(out, key=lambda t: tuple(str(x) for x in t))


def assert_matches_oracle(spark_df, duck_con, sql):
    """Compare a Spark result against a DuckDB oracle result — row count,
    sorted column names, and (float-tolerant) values."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = [tuple(r) for r in rel.fetchall()]

    sc, sr = normalize(s_rows, s_cols)
    dc, dr = normalize(d_rows, d_cols)
    assert sc == dc, f"column mismatch: spark={sc} duck={dc}"
    assert len(sr) == len(dr), f"row count mismatch: spark={len(sr)} duck={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert x == pytest.approx(y, abs=1e-6, rel=1e-9), f"row {i}: {a} != {b}"
            else:
                assert x == y, f"row {i}: {a} != {b} (cell {x!r} != {y!r})"
