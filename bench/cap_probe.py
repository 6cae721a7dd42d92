#!/usr/bin/env python
"""Cap-cost probe (round 6): what do the two quadratic-blowup guards COST in
recall on pathologically skewed corpora?

The hot-shingle cap (``jaccard_pairs.max_shingle_freq``) and the LSH
hot-bucket cap (``lsh_near_dup_pairs.max_bucket_freq``) silently bound
recall: correctness gates mirror the cap in their oracles, so they can't see
missed pairs. This probe INJECTS a pathological near-dup cluster that
crosses each cap and reports pair recall with/without the cap plus wall
time — the measured trade the caps buy (documented in BENCH.md the way the
SimHash single-box 0.62 scaling ceiling is).

This is a PROBE, not a gate: all data is generated deterministically
in-session (no files, no seeds drawn at runtime).

Usage: python bench/cap_probe.py [--cpus 8]
Prints one JSON object per probe.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("cap-probe")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


# ------------------------------------------------------------------ corpora


def shingle_skew_corpus(spark: SparkSession, n_docs: int, cluster: int):
    """``cluster`` docs share one boilerplate sentence (every boilerplate
    shingle's frequency == cluster size, crossing any cap below it) plus a
    tiny per-doc suffix, so they are pairwise near-identical under word
    3-gram Jaccard; the remaining docs are all-distinct filler."""
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    boiler = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "on and the crowd watches in silence near the old stone bridge"
    )
    filler = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{k}u"), ((F.col("doc_id") * (k + 3)) % 9973).cast("string"))
            for k in range(24)
        ],
    )
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") < cluster,
            F.concat(F.lit(boiler + " tail"), (F.col("doc_id") % 7).cast("string")),
        ).otherwise(filler),
    )


def embedding_skew_corpus(spark: SparkSession, n_vecs: int, cluster: int, dim: int):
    """``cluster`` near-identical unit-norm-ish vectors (base + per-id 1e-3
    perturbation — pairwise cosine ≈ 1, and they land in the SAME LSH
    buckets, crossing any bucket cap below the cluster size) + spread-out
    filler vectors (deterministic sin-lattice, pairwise cosine far from 1)."""
    base = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    clustered = F.transform(
        idx,
        lambda j: (
            F.sin(j + 1.0) + (F.col("vec_id") % 97) * 1e-3 * F.sin(j * 7.0 + F.col("vec_id"))
        ).cast("float"),
    )
    spread = F.transform(
        idx, lambda j: F.sin((F.col("vec_id") + 13.0) * (j + 1.0)).cast("float")
    )
    return base.withColumn(
        "embedding", F.when(F.col("vec_id") < cluster, clustered).otherwise(spread)
    )


# ------------------------------------------------------------------- probes


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.select("id_a", "id_b").collect()}


def _largest_component(pairs, members: int) -> int:
    """Driver-side union-find over probe-scale pairs → size of the largest
    connected component among the injected cluster's ids [0, members).
    Dedup cares about CLUSTER CONNECTIVITY more than pair recall: a capped
    run that keeps only 5% of a cluster's pairs still deduplicates it fully
    if those pairs connect every member."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a < members and b < members:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    if not parent:
        return 1 if members else 0
    from collections import Counter

    sizes = Counter(find(x) for x in range(members) if x in parent)
    return max(sizes.values()) if sizes else 1


def probe_shingle_cap(spark: SparkSession, n_docs=3000, cluster=600, cap=200):
    from jsonschema_go_spark.operators.dedup import jaccard_pairs

    corpus = shingle_skew_corpus(spark, n_docs, cluster).cache()
    corpus.count()
    out = {"probe": "hot_shingle_cap", "n_docs": n_docs, "cluster": cluster, "cap": cap}
    t0 = time.perf_counter()
    truth = _pair_set(
        jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5,
                      max_shingle_freq=10**9)
    )
    out["uncapped_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    capped = _pair_set(
        jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5,
                      max_shingle_freq=cap)
    )
    out["capped_sec"] = round(time.perf_counter() - t0, 2)
    out["true_pairs"] = len(truth)
    out["capped_pairs"] = len(capped)
    out["false_pairs"] = len(capped - truth)
    out["recall"] = round(len(capped & truth) / len(truth), 4) if truth else 1.0
    out["cluster_connectivity"] = round(_largest_component(capped, cluster) / cluster, 4)
    corpus.unpersist()
    return out


def probe_bucket_cap(spark: SparkSession, n_vecs=4000, cluster=500, cap=100, dim=32):
    from jsonschema_go_spark.operators.similarity import lsh_near_dup_pairs

    corpus = embedding_skew_corpus(spark, n_vecs, cluster, dim).cache()
    corpus.count()
    out = {"probe": "lsh_bucket_cap", "n_vecs": n_vecs, "cluster": cluster, "cap": cap}
    t0 = time.perf_counter()
    truth = _pair_set(
        lsh_near_dup_pairs(corpus, "vec_id", "embedding", dim, threshold=0.99,
                           max_bucket_freq=None)
    )
    out["uncapped_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    capped = _pair_set(
        lsh_near_dup_pairs(corpus, "vec_id", "embedding", dim, threshold=0.99,
                           max_bucket_freq=cap)
    )
    out["capped_sec"] = round(time.perf_counter() - t0, 2)
    out["true_pairs"] = len(truth)
    out["capped_pairs"] = len(capped)
    out["false_pairs"] = len(capped - truth)  # stays 0: exact verify
    out["recall"] = round(len(capped & truth) / len(truth), 4) if truth else 1.0
    out["cluster_connectivity"] = round(_largest_component(capped, cluster) / cluster, 4)
    corpus.unpersist()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()
    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # each probe at a cap BELOW the injected cluster (the failure mode) and
    # ABOVE it (the safe setting the ROADMAP guidance derives from)
    print(json.dumps(probe_shingle_cap(spark, cap=200)))
    print(json.dumps(probe_shingle_cap(spark, cap=1200)))
    print(json.dumps(probe_bucket_cap(spark, cap=100)))
    print(json.dumps(probe_bucket_cap(spark, cap=1000)))
    spark.stop()


if __name__ == "__main__":
    main()
