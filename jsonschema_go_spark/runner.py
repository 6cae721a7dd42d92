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
    n_rows = df.count()
    buckets = args.buckets or max(4, min(4096, n_rows // 2_000_000 + 1))
    run = CheckpointedRun(io_out, args.run_id, num_buckets=buckets)
    t0 = time.perf_counter()
    result = run.run(df, plan, resume=args.resume)
    wall = time.perf_counter() - t0
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
