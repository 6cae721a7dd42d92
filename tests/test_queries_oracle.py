"""Driver-style gate: every registry query must match its DuckDB oracle
(row count + sorted-column schema + values) at the test scale factor."""

from __future__ import annotations

import pytest

from jsonschema_go_spark.queries import get_oracles, get_queries

from .conftest import SF_DIR, assert_matches_oracle

QUERIES = get_queries()
ORACLES = get_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
