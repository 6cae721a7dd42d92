"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``jsonschema_go_spark`` — see SURVEY.md and the package docstrings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jsonschema_go_spark.queries import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full keyword-validation pass over sf0.001 `events` —
    materialized violation rows (SURVEY.md §2.3), stable ordering."""
    from jsonschema_go_spark.compile import compile_table
    from jsonschema_go_spark.queries import EVENTS_RULE
    from jsonschema_go_spark.sources.transcripts import stage_transcripts

    # entry() runs before the per-query oracle gate: staging the sf0.01
    # transcript parquet here guarantees the transcript_validation oracle's
    # read_parquet target exists regardless of driver evaluation order
    # (idempotent: deterministic data, skip-if-_SUCCESS)
    stage_transcripts(spark, "0.01")

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = compile_table(EVENTS_RULE, df.schema)
    return plan.violations(df, ["event_id"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (generated from the SAME rule
    documents via jsonschema_go_spark.oracle where applicable)."""
    return get_oracles()
