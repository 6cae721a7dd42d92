#!/usr/bin/env python
"""Scaling-efficiency harness (north-rule evidence).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N executors.
No real cluster exists in this sandbox, so the evidence is the same job at
two parallelism levels on identical input:

    python bench/scaling.py generate --convs 2000000 --out /tmp/scale_input
    python bench/scaling.py run --cpus 8  --input /tmp/scale_input
    python bench/scaling.py run --cpus 32 --input /tmp/scale_input

Each `run` is its own process (Spark master is fixed per JVM). The job is the
full transcript validation pass: per-keyword flags + violation rows +
per-conversation verdicts, written to a noop sink (full execution, no driver
materialization). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _session(cpus: int, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def cmd_generate(args) -> None:
    spark = _session(32, 64)
    spark.sparkContext.setLogLevel("ERROR")
    from jsonschema_go_spark.sources.transcripts import generate_transcripts

    df = generate_transcripts(spark, num_convs=args.convs, seed=42)
    # 256 files: fine-grained splits pack task waves evenly at high core counts
    df.repartition(256).write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"generated_rows": n, "path": args.out}))
    spark.stop()


def cmd_run(args) -> None:
    spark = _session(args.cpus, args.cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    from jsonschema_go_spark.compile import compile_table
    from jsonschema_go_spark.sources.transcripts import transcript_table_rule

    from jsonschema_go_spark.lineage import bucket_expr

    df = spark.read.parquet(args.input)
    n = df.count()  # warm FS cache + JVM before timing
    plan = compile_table(transcript_table_rule(), df.schema)

    def job():
        # the validation pass: per-row keyword flags, materialized violation
        # rows, and per-partition verdicts keyed on the north rule's explicit
        # conv_id hash-buckets (partial agg collapses each task to ≤buckets
        # rows — the verdict shuffle is O(buckets), not O(rows))
        plan.flags(df, ["conv_id", "turn_idx"]).write.format("noop").mode(
            "overwrite"
        ).save()
        plan.violations(df, ["conv_id", "turn_idx"], ordered=False).write.format(
            "noop"
        ).mode("overwrite").save()
        plan.verdicts(df, bucket_expr("conv_id", 1024)).write.format("noop").mode(
            "overwrite"
        ).save()

    job()  # warm-up run (codegen, file metadata)
    best = None
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        job()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "rows": n,
                "wall_sec": round(best, 3),
                "turns_per_sec": round(n / best, 1),
            }
        )
    )
    spark.stop()


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--convs", type=int, default=2_000_000)
    g.add_argument("--out", default="/tmp/scale_input")
    r = sub.add_parser("run")
    r.add_argument("--cpus", type=int, required=True)
    r.add_argument("--input", default="/tmp/scale_input")
    r.add_argument("--repeats", type=int, default=2)
    args = p.parse_args()
    if args.cmd == "generate":
        cmd_generate(args)
    else:
        cmd_run(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
