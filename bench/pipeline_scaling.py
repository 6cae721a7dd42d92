#!/usr/bin/env python
"""N-vs-4N scaling evidence for the PIPELINE operators (dedup family) —
companion to bench/scaling.py (which covers the north-rule validation pass).

The corpus is the deterministic transcript generator's text column re-keyed
as documents (scale-free, no driver-side data), so the same job runs from
1k to 10^9 docs. Ops timed (each a noop-sink full execution, warm-up + N
repeats, best-of):

- exact:   md5-fingerprint hash-groupBy duplicate groups
- simhash: 64-bit signatures (two-level weighted-vote aggregate)
- minhash: 12-hash MinHash signature table (shingle explode + min aggs)

    python bench/pipeline_scaling.py generate --convs 200000 --out /tmp/pipe_docs
    python bench/pipeline_scaling.py run --cpus 8  --input /tmp/pipe_docs
    python bench/pipeline_scaling.py run --cpus 32 --input /tmp/pipe_docs

Each `run` is its own process (Spark master fixed per JVM); prints one JSON
line with per-op wall seconds and docs/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"pipeline-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def cmd_generate(args) -> None:
    from pyspark.sql import functions as F

    spark = _session(32)
    spark.sparkContext.setLogLevel("ERROR")
    from jsonschema_go_spark.sources.transcripts import generate_transcripts

    t = generate_transcripts(spark, num_convs=args.convs, seed=42, skew=False)
    docs = t.select(
        (
            F.expr("try_cast(substring(conv_id, 2, 8) AS BIGINT)") * 1_000_000
            + F.col("turn_idx")
        ).alias("doc_id"),
        F.col("text"),
    ).where(F.col("doc_id").isNotNull())
    docs.repartition(256).write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"generated_docs": n, "path": args.out}))
    spark.stop()


def cmd_run(args) -> None:
    spark = _session(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from jsonschema_go_spark.operators import dedup as dd

    df = spark.read.parquet(args.input)
    n = df.count()  # warm FS cache + JVM

    def noop(d):
        d.write.format("noop").mode("overwrite").save()

    jobs = {
        "exact": lambda: noop(dd.exact_duplicates(df, "doc_id", "text")),
        "simhash": lambda: noop(dd.simhash64(df, "doc_id", "text")),
        "minhash": lambda: noop(dd.minhash_table(df, "doc_id", "text")),
    }
    out = {"cpus": args.cpus, "docs": n}
    for name in args.ops.split(","):
        job = jobs[name]
        job()  # warm-up
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            job()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[f"{name}_sec"] = round(best, 3)
        out[f"{name}_docs_per_sec"] = round(n / best, 1)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--convs", type=int, default=200_000)
    g.add_argument("--out", default="/tmp/pipe_docs")
    g.set_defaults(fn=cmd_generate)
    r = sub.add_parser("run")
    r.add_argument("--cpus", type=int, default=32)
    r.add_argument("--input", default="/tmp/pipe_docs")
    r.add_argument("--ops", default="exact,simhash,minhash")
    r.add_argument("--repeats", type=int, default=2)
    r.set_defaults(fn=cmd_run)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
