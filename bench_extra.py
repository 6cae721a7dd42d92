#!/usr/bin/env python
"""Round-7 optimization harness (guide §1): per-query noop-sink isolation,
plan capture, and targeted timing — SEPARATE from the frozen bench.py.

Usage:
    python bench_extra.py [--sf-dir DIR] [--runs N] [--plans DIR] [query ...]

Runs each named query (default: all) with 1 warmup + N timed noop-sink
executions on the same session config as bench.py, prints per-query
median/min, and (with --plans) writes `.explain("formatted")` output per
query. Job descriptions are set per query (guide §1.5).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to write explain('formatted') files")
    ap.add_argument("--suffix", default="", help="plan filename suffix (e.g. _before)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import bench

    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from jsonschema_go_spark.queries import get_queries

    queries = get_queries()
    queries.pop("ann_recall_report", None)
    names = args.queries or sorted(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warm JVM/codegen once
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    out = {}
    for name in names:
        fn = queries[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, args.sf_dir)
            plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan_txt)
        if args.runs <= 0:
            print(json.dumps({name: "plan-only"}), flush=True)
            continue
        spark.sparkContext.setJobDescription(f"r07 bench_extra: {name}")
        bench.run_noop(fn(spark, args.sf_dir))  # warmup
        ts = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            bench.run_noop(fn(spark, args.sf_dir))
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
            "max": round(max(ts), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": args.sf_dir, "runs": args.runs, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
