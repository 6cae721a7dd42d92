"""Per-stage, per-partition lineage + checkpointing → crash-resumable runs
(north-rule mandate; the ``CollectDefinitions`` callback pattern of the
reference, ``/root/reference/context.go:12-16``, lifted to run lineage).

Model: a run processes hash-buckets of ``conv_id`` (explicit partitioning per
SURVEY.md §2.3). Each completed (run_id, stage, bucket) appends one lineage
row with metrics; resuming the same run_id anti-joins completed buckets and
processes only the remainder. Lineage lives in the same TableIO seam as data
(Iceberg append in production, parquet append in the sandbox).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .sources.io import TableIO

LINEAGE_SCHEMA = T.StructType([
    T.StructField("run_id", T.StringType(), False),
    T.StructField("stage", T.StringType(), False),
    T.StructField("bucket", T.IntegerType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("rows", T.LongType(), True),
    T.StructField("violations", T.LongType(), True),
    T.StructField("wall_sec", T.DoubleType(), True),
    T.StructField("finished_at", T.TimestampType(), True),
])

LINEAGE_TABLE = "lineage"


def bucket_expr(key_col: str, num_buckets: int) -> F.Column:
    """Explicit conv_id hash-bucketing (SURVEY.md §2.3)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


@dataclass
class LineageLog:
    """Lineage appender. ``autoflush=True`` (default) appends one row per
    :meth:`record` — maximal durability, but at 4096 buckets × stages that is
    a 1-row-file-per-record pattern (an object-store small-file nuisance).
    ``autoflush=False`` buffers records and appends them in batches via
    :meth:`flush` — CheckpointedRun uses this with periodic + final flushes;
    an unflushed record merely means that bucket re-processes idempotently
    on resume."""

    io: TableIO
    autoflush: bool = True
    _buffer: List[Row] = field(default_factory=list)

    def completed_buckets(self, run_id: str, stage: str) -> List[int]:
        if not self.io.exists(LINEAGE_TABLE):
            return []
        df = self.io.read(LINEAGE_TABLE)
        rows = (
            df.where(
                (F.col("run_id") == run_id)
                & (F.col("stage") == stage)
                & (F.col("status") == "done")
            )
            .select("bucket")
            .distinct()
            .collect()
        )
        return sorted(r["bucket"] for r in rows)

    def record(
        self,
        run_id: str,
        stage: str,
        bucket: int,
        rows: int,
        violations: int,
        wall_sec: float,
        status: str = "done",
    ) -> None:
        import datetime

        self._buffer.append(
            Row(
                run_id=run_id,
                stage=stage,
                bucket=int(bucket),
                status=status,
                rows=int(rows),
                violations=int(violations),
                wall_sec=float(wall_sec),
                finished_at=datetime.datetime.now(),
            )
        )
        if self.autoflush:
            self.flush()

    def flush(self) -> None:
        """Append all buffered records in ONE write (no-op when empty)."""
        if not self._buffer:
            return
        df = self.io.spark.createDataFrame(self._buffer, LINEAGE_SCHEMA)
        self.io.append(df, LINEAGE_TABLE)
        self._buffer = []


@dataclass
class CheckpointedRun:
    """Bucket-wise validation run: process each conv_id hash-bucket, append
    violations + verdicts per bucket, log lineage; ``resume=True`` skips
    buckets already marked done for this run_id.

    At cluster scale each bucket is itself a distributed job over that
    bucket's partition-pruned slice; bucket granularity bounds re-work on
    crash to 1/num_buckets of the input.
    """

    io: TableIO
    run_id: str
    key_col: str = "conv_id"
    num_buckets: int = 16
    #: Spark storage buckets on key_col WITHIN each _bucket partition —
    #: makes every per-key aggregate over the staged data exchange-free
    sub_buckets: int = 8
    #: lineage records per batched append (bounds both small-file count and
    #: the re-work window: ≤ flush_every-1 completed-but-unflushed buckets
    #: re-process idempotently after a hard crash)
    lineage_flush_every: int = 8

    @property
    def _safe_run_id(self) -> str:
        """run_id as a safe identifier fragment for EVERY derived table name
        (staged/violations/verdicts/quality — a raw 'r.1' would parse as a
        namespace on the Iceberg path). Sanitization is lossy ('r.1' and
        'r_1' both map to 'r_1'), so non-identifier run_ids get an md5
        suffix — otherwise a resume could silently use another run's data."""
        import hashlib
        import re

        safe = re.sub(r"[^A-Za-z0-9_]", "_", self.run_id)
        if safe == self.run_id:
            return safe
        tag = hashlib.md5(self.run_id.encode()).hexdigest()[:8]
        return f"{safe}_{tag}"

    @property
    def _staged_table(self) -> str:
        """Catalog name for the staged table. The session catalog is GLOBAL
        but TableIO data is path-scoped, so the name folds in a digest of the
        output base_path: two CheckpointedRuns with the same run_id but
        different base_paths in one Spark session must never resume against
        each other's staged files (the run_id sanitization guard alone covers
        name collisions, not path divergence)."""
        import hashlib

        loc = hashlib.md5((self.io.base_path or "").encode()).hexdigest()[:8]
        return f"staged_{self._safe_run_id}_{loc}"

    def _stage_input(self, df: DataFrame, resume: bool) -> DataFrame:
        """Stage the input hash-partitioned by bucket — ONE full pass.

        Without staging, the per-bucket loop re-scans the whole input per
        bucket (num_buckets × full-scan — measured 5× slower even at 600k
        rows; fatal at 100 TB). Staged layout gives each bucket a
        partition-pruned read: total I/O = 1 write + num_buckets pruned
        reads.

        The staged data is ALSO a Spark bucketed table: ``bucketBy(sub_buckets,
        key_col) + sortBy(key_col)`` within each ``_bucket`` partition. The
        bucketed scan reports ``HashPartitioning(key_col)``, so the
        per-conversation verdict aggregate needs NO Exchange — this was the
        16M-group full-data shuffle flagged at 97M turns (BENCH.md per-stage
        table). On a real lake the source table is already stored
        bucketed/partitioned this way and staging is a no-op.
        """
        spark = self.io.spark
        table = self._staged_table
        # path derives from the SANITIZED name: run_ids 'r.1' and 'r_1' would
        # otherwise share a catalog table while writing different paths, and
        # a resume could silently validate the other run's staged data
        path = self.io._path(table)
        if resume and spark.catalog.tableExists(table):
            return spark.table(table)
        if resume and self.io.exists(table):
            # files survive a crash but the session catalog does not (fresh
            # driver) — re-register the external bucketed table over them
            self._register_staged(table, path)
            return spark.table(table)
        bucketed = df.withColumn(
            "_bucket", bucket_expr(self.key_col, self.num_buckets)
        )
        # repartition on the partition column so each output dir is written
        # by few tasks: files = num_buckets dirs × sub_buckets bucket files
        (
            bucketed.repartition("_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .bucketBy(self.sub_buckets, self.key_col)
            .sortBy(self.key_col)
            .option("path", path)
            .format("parquet")
            .saveAsTable(table)
        )
        return spark.table(table)

    def _register_staged(self, table: str, path: str) -> None:
        """CREATE TABLE over existing staged files (crash-resume in a new
        session) — schema from the files, bucket spec from self."""
        spark = self.io.spark
        df = spark.read.parquet(path)
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.name != "_bucket"
        )
        spark.sql(
            f"CREATE TABLE {table} ({cols}, _bucket INT) USING parquet "
            f"PARTITIONED BY (_bucket) "
            f"CLUSTERED BY ({self.key_col}) SORTED BY ({self.key_col}) "
            f"INTO {self.sub_buckets} BUCKETS "
            f"LOCATION '{path}'"
        )
        spark.sql(f"MSCK REPAIR TABLE {table}")

    def run(
        self,
        df: DataFrame,
        plan,
        keys: Sequence[str] = ("conv_id", "turn_idx"),
        resume: bool = True,
        stage: str = "validate",
        fail_on_bucket: Optional[int] = None,  # test hook: simulate a crash
        fail_before_record: Optional[int] = None,  # test hook: crash AFTER appends
        quality_checks: bool = False,
        order_col: str = "turn_idx",
    ) -> dict:
        log = LineageLog(self.io, autoflush=False)
        done = set(log.completed_buckets(self.run_id, stage)) if resume else set()
        staged = self._stage_input(df, resume)
        processed, skipped = [], []
        try:
            self._run_buckets(
                staged, plan, log, done, processed, skipped, keys, stage,
                fail_on_bucket, fail_before_record, quality_checks, order_col,
            )
        finally:
            # batch-flush lineage: every flush_every buckets inside the loop,
            # once here for the tail — and on a CRASH this persists the
            # completed-but-unflushed buckets, so resume still skips them
            log.flush()
        return {"processed": processed, "skipped": skipped}

    def _run_buckets(
        self, staged, plan, log, done, processed, skipped, keys, stage,
        fail_on_bucket, fail_before_record, quality_checks, order_col,
    ) -> None:
        for b in range(self.num_buckets):
            if b in done:
                skipped.append(b)
                continue
            if fail_on_bucket is not None and b == fail_on_bucket:
                raise RuntimeError(f"simulated crash at bucket {b}")
            t0 = time.perf_counter()
            # idempotence: a crash between append and lineage-record leaves
            # the bucket unmarked; dropping its partition before (re)writing
            # makes the at-least-once loop exactly-once per bucket
            self.io.delete_partition(f"violations_{self._safe_run_id}", "bucket", b)
            self.io.delete_partition(f"verdicts_{self._safe_run_id}", "bucket", b)
            # partition pruning: reads only the _bucket=b directory
            part = staged.where(F.col("_bucket") == b).drop("_bucket")
            viol = plan.violations(part, list(keys), ordered=False).withColumn(
                "bucket", F.lit(b)
            )
            self.io.append(viol, f"violations_{self._safe_run_id}", partition_by=["bucket"])
            # exchange-free: the staged table is bucketed+sorted on key_col,
            # so this per-conversation aggregate shuffles nothing
            verd = plan.verdicts(part, self.key_col).withColumn("bucket", F.lit(b))
            verd.cache()
            self.io.append(verd, f"verdicts_{self._safe_run_id}", partition_by=["bucket"])
            if quality_checks:
                # (key, order) uniqueness + per-key chain contiguity in the
                # SAME bucket pass — both group on (or by a superset of) the
                # storage-bucket key, so neither plans an Exchange either
                from .operators import uniqueness as _uq

                self.io.delete_partition(f"quality_{self._safe_run_id}", "bucket", b)
                uniq = _uq.uniqueness_verdict(part, [self.key_col, order_col])
                contig = _uq.contiguity(part, self.key_col, order_col, start=0).agg(
                    F.count(F.lit(1)).alias("n_groups"),
                    F.sum((~F.col("contiguous")).cast("long")).alias("broken_groups"),
                )
                qual = (
                    uniq.crossJoin(contig)
                    .select(
                        F.col("total_rows"),
                        F.col("distinct_keys"),
                        F.col("duplicate_rows"),
                        F.col("passed").alias("unique_passed"),
                        F.col("n_groups"),
                        F.col("broken_groups"),
                        (F.col("broken_groups") == 0).alias("contiguous_passed"),
                    )
                    .withColumn("bucket", F.lit(b))
                )
                self.io.append(qual, f"quality_{self._safe_run_id}", partition_by=["bucket"])
            if fail_before_record is not None and b == fail_before_record:
                verd.unpersist()
                raise RuntimeError(f"simulated crash before record at bucket {b}")
            # rows + violation counts come free from the verdict aggregate —
            # no extra count job over the data
            tot = verd.agg(
                F.sum("rows").alias("r"), F.sum("violation_count").alias("v")
            ).first()
            n_rows, n_viol = tot["r"] or 0, tot["v"] or 0
            verd.unpersist()
            log.record(
                self.run_id, stage, b, n_rows, n_viol, time.perf_counter() - t0
            )
            if len(log._buffer) >= self.lineage_flush_every:
                log.flush()
            processed.append(b)
