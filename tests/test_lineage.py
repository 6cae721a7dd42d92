"""Checkpoint/lineage + runner tests: crash → resume processes only the
remaining buckets; results equal an uninterrupted run."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark import compile_table
from jsonschema_go_spark.lineage import CheckpointedRun, LineageLog
from jsonschema_go_spark.sources.io import TableIO
from jsonschema_go_spark.sources.transcripts import (
    generate_transcripts,
    transcript_table_rule,
)


@pytest.fixture()
def env(spark, tmp_path):
    df = generate_transcripts(spark, num_convs=200, seed=42)
    plan = compile_table(transcript_table_rule(), df.schema)
    io = TableIO(spark, base_path=str(tmp_path))
    return spark, df, plan, io


def test_crash_then_resume(env):
    spark, df, plan, io = env
    run = CheckpointedRun(io, "r1", num_buckets=4)

    with pytest.raises(RuntimeError, match="simulated crash"):
        run.run(df, plan, fail_on_bucket=2)

    log = LineageLog(io)
    assert log.completed_buckets("r1", "validate") == [0, 1]

    result = run.run(df, plan, resume=True)
    assert result["skipped"] == [0, 1]
    assert result["processed"] == [2, 3]

    # full-run equivalence: checkpointed union == direct violations
    resumed = io.read("violations_r1").drop("bucket")
    direct = plan.violations(df, ["conv_id", "turn_idx"], ordered=False)
    assert resumed.count() == direct.count()
    assert resumed.exceptAll(direct).count() == 0
    assert direct.exceptAll(resumed).count() == 0


def test_resume_noop_when_complete(env):
    spark, df, plan, io = env
    run = CheckpointedRun(io, "r2", num_buckets=3)
    r1 = run.run(df, plan)
    assert len(r1["processed"]) == 3
    r2 = run.run(df, plan, resume=True)
    assert r2["processed"] == [] and len(r2["skipped"]) == 3
    # no duplicate output rows from the no-op resume
    direct = plan.violations(df, ["conv_id", "turn_idx"], ordered=False)
    assert io.read("violations_r2").count() == direct.count()


def test_lineage_metrics_recorded(env):
    spark, df, plan, io = env
    CheckpointedRun(io, "r3", num_buckets=2).run(df, plan)
    lin = io.read("lineage").where(F.col("run_id") == "r3")
    rows = lin.collect()
    assert len(rows) == 2
    assert all(r["status"] == "done" and r["wall_sec"] > 0 for r in rows)
    assert sum(r["rows"] for r in rows) == df.count()


def test_runner_cli(spark, tmp_path, monkeypatch):
    """Drive the spark-submit entry point in-process (it reuses the active
    session via getOrCreate)."""
    from jsonschema_go_spark import runner

    rc = runner.main(
        [
            "--synthetic", "100",
            "--output", str(tmp_path / "out"),
            "--run-id", "cli1",
            "--buckets", "2",
        ]
    )
    assert rc == 0
    io = TableIO(spark, base_path=str(tmp_path / "out"))
    assert io.read("verdicts_cli1").count() > 0
    assert io.read("lineage").where(F.col("run_id") == "cli1").count() == 2


def test_crash_after_append_resume_is_idempotent(env):
    """ADVICE.md: a crash AFTER the bucket's violations/verdicts were appended
    but BEFORE the lineage record leaves the bucket unmarked; resume must
    re-process it WITHOUT duplicating its output rows."""
    spark, df, plan, io = env
    run = CheckpointedRun(io, "r4", num_buckets=4)

    with pytest.raises(RuntimeError, match="before record"):
        run.run(df, plan, fail_before_record=1)

    # bucket 1's rows were appended but it is not marked done
    log = LineageLog(io)
    assert log.completed_buckets("r4", "validate") == [0]
    assert io.read("violations_r4").where(F.col("bucket") == 1).count() > 0

    result = run.run(df, plan, resume=True)
    assert result["skipped"] == [0]
    assert result["processed"] == [1, 2, 3]

    resumed = io.read("violations_r4").drop("bucket")
    direct = plan.violations(df, ["conv_id", "turn_idx"], ordered=False)
    assert resumed.count() == direct.count()  # no duplicates from bucket 1
    assert resumed.exceptAll(direct).count() == 0
    verd = io.read("verdicts_r4")
    assert verd.count() == verd.select("partition_key").distinct().count()


def test_per_conv_verdicts_are_exchange_free(env):
    """The staged table is bucketed+sorted by conv_id, so the per-conversation
    verdict aggregate must plan WITHOUT any Exchange (shuffle) operator."""
    spark, df, plan, io = env
    run = CheckpointedRun(io, "r5", num_buckets=4)
    staged = run._stage_input(df, resume=False)
    part = staged.where(F.col("_bucket") == 1).drop("_bucket")
    verd = plan.verdicts(part, "conv_id")
    plan_str = verd._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str, plan_str
    # and it still computes the right thing
    direct = plan.verdicts(df.withColumn("_b", F.col("conv_id")).drop("_b"), "conv_id")
    sub = {r["partition_key"] for r in verd.select("partition_key").collect()}
    allk = {r["partition_key"] for r in direct.select("partition_key").collect()}
    assert sub and sub.issubset(allk)


def test_resume_survives_catalog_loss(env):
    """Crash-resume in a NEW driver: staged files survive but the session
    catalog does not — the run must re-register the external bucketed table
    over the existing files and stay exchange-free."""
    spark, df, plan, io = env
    run = CheckpointedRun(io, "r6", num_buckets=4)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run.run(df, plan, fail_on_bucket=2)

    # simulate the fresh driver: external DROP keeps the files on disk
    spark.sql(f"DROP TABLE {run._staged_table}")
    assert not spark.catalog.tableExists(run._staged_table)

    result = run.run(df, plan, resume=True)
    assert result["processed"] == [2, 3]
    staged = spark.table(run._staged_table)
    part = staged.where(F.col("_bucket") == 2).drop("_bucket")
    plan_str = plan.verdicts(part, "conv_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str, plan_str
    resumed = io.read("violations_r6").drop("bucket")
    direct = plan.violations(df, ["conv_id", "turn_idx"], ordered=False)
    assert resumed.count() == direct.count()
    assert resumed.exceptAll(direct).count() == 0


def test_quality_checks_in_bucket_pass(env):
    """quality_checks=True emits per-bucket uniqueness + contiguity metrics
    in the same pass, matching the global operators when re-aggregated."""
    from jsonschema_go_spark.operators import uniqueness as uq

    spark, df, plan, io = env
    run = CheckpointedRun(io, "r7", num_buckets=4)
    run.run(df, plan, quality_checks=True)

    qual = io.read("quality_r7")
    assert qual.count() == 4
    agg = qual.agg(
        F.sum("total_rows").alias("rows"),
        F.sum("duplicate_rows").alias("dups"),
        F.sum("broken_groups").alias("broken"),
        F.sum("n_groups").alias("groups"),
    ).first()
    want_u = uq.uniqueness_verdict(df, ["conv_id", "turn_idx"]).first()
    assert agg["rows"] == want_u["total_rows"]
    assert agg["dups"] == want_u["duplicate_rows"]
    per = uq.contiguity(df, "conv_id", "turn_idx", start=0)
    assert agg["groups"] == per.count()
    assert agg["broken"] == per.where(~F.col("contiguous")).count()

    # exchange-free on the DATA-sized stage: the per-key aggregate groups by
    # a superset of the storage-bucket key, so it needs no shuffle (the final
    # single-row rollup exchanges only the tiny per-key aggregates)
    staged = spark.table(run._staged_table)
    part = staged.where(F.col("_bucket") == 0).drop("_bucket")
    per_key = part.groupBy("conv_id", "turn_idx").count()
    plan_str = per_key._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_str, plan_str


def test_auto_buckets_from_input_bytes(spark):
    """runner._auto_buckets sizes from file bytes without scanning data."""
    from jsonschema_go_spark.runner import _auto_buckets

    n = _auto_buckets(spark, "/root/testdata/sf0.001")
    assert 4 <= n <= 4096  # small input → floor of 4
    assert _auto_buckets(spark, None) == 16
    assert _auto_buckets(spark, "/no/such/path") == 16  # graceful fallback


def test_lineage_appends_are_batched(env):
    """4 buckets, flush_every=8 → ONE lineage append for the whole run (the
    1-row-file-per-bucket pattern is gone); crash-resume behavior unchanged
    (test_crash_then_resume) because the finally-flush persists completed
    buckets."""
    spark, df, plan, io = env
    appends = []
    orig = io.append

    def counting_append(d, name, partition_by=None):
        appends.append(name)
        return orig(d, name, partition_by)

    io.append = counting_append
    CheckpointedRun(io, "r8", num_buckets=4).run(df, plan)
    io.append = orig
    assert appends.count("lineage") == 1
    lin = io.read("lineage").where(F.col("run_id") == "r8")
    assert lin.count() == 4  # all four records in the one batch
