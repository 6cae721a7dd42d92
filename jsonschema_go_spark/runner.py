"""spark-submit entry point: end-to-end checkpointed validation run.

Usage (cluster)::

    spark-submit --py-files jsonschema_go_spark.zip \
        -m jsonschema_go_spark.runner -- \
        --input /data/transcripts --output /runs/r1 --run-id r1 \
        --rules rules.json --buckets 256 [--resume]

Sandbox smoke::

    python -m jsonschema_go_spark.runner --synthetic 1000 \
        --output /tmp/run1 --run-id demo --buckets 8

Cluster conf the engine expects (set via spark-submit --conf):
    spark.sql.adaptive.enabled=true
    spark.sql.adaptive.skewJoin.enabled=true
    spark.sql.shuffle.partitions ≈ 2-3× total executor cores
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _auto_buckets(spark, input_path) -> int:
    """Bucket count from input bytes (no data scan): ~1 bucket per 512 MiB of
    parquet, clamped to [4, 4096]."""
    if not input_path:
        return 16
    try:
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(input_path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        n_bytes = fs.getContentSummary(p).getLength()
        return max(4, min(4096, int(n_bytes // (512 << 20)) + 1))
    except Exception:
        return 16


def build_session(app: str = "jsonschema-go-spark"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="input table path (parquet) or iceberg name")
    p.add_argument("--synthetic", type=int, help="generate N synthetic conversations instead")
    p.add_argument("--output", required=True, help="output root (TableIO base path)")
    p.add_argument("--run-id", required=True)
    p.add_argument("--rules", help="TableRule JSON file (default: F1 transcript rules)")
    p.add_argument(
        "--buckets", type=int, default=0,
        help="conv_id hash-buckets (0 = auto: ~1 bucket per 2M rows, "
        "min 4 — per-bucket job overhead dominates below that)",
    )
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--quality-checks", action="store_true",
        help="also emit per-bucket (conv_id, turn_idx) uniqueness and "
        "turn-chain contiguity metrics (same pass, exchange-free)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None
    spark = build_session()
    spark.sparkContext.setLogLevel("WARN")

    from .compile import compile_table
    from .lineage import CheckpointedRun
    from .rules import TableRule
    from .sources.io import TableIO
    from .sources.transcripts import generate_transcripts, transcript_table_rule

    if args.synthetic:
        df = generate_transcripts(spark, num_convs=args.synthetic, seed=42)
    elif args.input:
        io_in = TableIO(spark, format=args.format)
        df = io_in.read(args.input)
    else:
        p.error("one of --input / --synthetic required")

    if args.rules:
        with open(args.rules) as f:
            tr = TableRule.from_json(f.read())
    else:
        tr = transcript_table_rule()

    plan = compile_table(tr, df.schema)
    io_out = TableIO(spark, format=args.format, base_path=args.output)
    # auto-size buckets WITHOUT a count() pre-pass (a full extra scan at
    # 100 TB): use input file bytes (~500 MiB of parquet per bucket) when the
    # input is path-backed, else a fixed floor for generated inputs
    buckets = args.buckets or _auto_buckets(spark, args.input)
    run = CheckpointedRun(io_out, args.run_id, num_buckets=buckets)
    t0 = time.perf_counter()
    result = run.run(df, plan, resume=args.resume, quality_checks=args.quality_checks)
    wall = time.perf_counter() - t0
    # row total comes free from the per-bucket lineage metrics — no data scan
    from pyspark.sql import functions as F

    # per bucket, take the LATEST attempt's row count (max_by finished_at):
    # re-using a run_id on changed input without --resume leaves stale lineage
    # rows from the earlier attempt, and max(rows) would report those
    n_rows = (
        io_out.read("lineage")
        .where(
            (F.col("run_id") == args.run_id)
            & (F.col("stage") == "validate")
            & (F.col("status") == "done")
        )
        .groupBy("bucket")
        .agg(F.max_by("rows", "finished_at").alias("rows"))
        .agg(F.sum("rows"))
        .first()[0]
        or 0
    )
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "rows": n_rows,
                "buckets_processed": len(result["processed"]),
                "buckets_skipped": len(result["skipped"]),
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
            }
        )
    )
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
