#!/usr/bin/env python
"""Adversarial-scale probe for connected_components (VERDICT r3 stretch #8):
validate the alternating large-star/small-star round bound (O(log² n)
worst-case, O(log n) empirical — Kiveris et al., SoCC'14) on a graph shaped
to hurt naive label propagation:

- LONG PATHS: --paths chains of --path-len nodes each. Diameter = path-len,
  so O(diameter) propagation would need path-len rounds; the star method
  must stay logarithmic.
- HUBS: --hubs high-degree nodes with --hub-deg hash-random edges into the
  paths — the skew shape (a hub key carries hub-deg edges through every
  groupBy).

Defaults build ~10M edges (100×50k path edges + 10×500k hub edges).
Correctness is checked exactly: the expected component count AND the
expected min-id labels are computed from a driver-side union-find over the
COARSE (path, hub) contact graph (≤ paths×hubs distinct contacts — each
path is internally connected by construction, so components of the full
graph correspond 1:1 to components of the coarse graph).

Not part of pytest (minutes of wall time) — run explicitly:

    python bench/cc_probe.py                # ~10M edges, local[32]
    python bench/cc_probe.py --paths 10 --path-len 1000 --hubs 2 --hub-deg 500

Prints one JSON line: edges, rounds, seconds, components, checks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_edges(spark, paths: int, path_len: int, hubs: int, hub_deg: int):
    from pyspark.sql import functions as F

    n_path_nodes = paths * path_len
    path_edges = (
        spark.range(n_path_nodes)
        .where((F.col("id") % path_len) != path_len - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    hub_edges = spark.range(hubs * hub_deg).select(
        (F.lit(n_path_nodes) + F.col("id") % hubs).alias("id_a"),
        F.pmod(F.xxhash64("id"), F.lit(n_path_nodes)).alias("id_b"),
    )
    return path_edges.unionByName(hub_edges)


def expected_components(spark, edges, paths: int, path_len: int):
    """Union-find over the coarse contact graph: node = path index or hub id;
    a hub edge (hub, w) contacts path w // path_len. Returns
    (n_components, {min-node-id label set})."""
    from pyspark.sql import functions as F

    n_path_nodes = paths * path_len
    contacts = (
        edges.where(F.col("id_a") >= n_path_nodes)
        .select("id_a", (F.col("id_b") / path_len).cast("long").alias("p"))
        .distinct()
        .collect()
    )  # ≤ hubs × paths rows
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for p in range(paths):
        find(("path", p))
    for r in contacts:
        union(("hub", r["id_a"]), ("path", r["p"]))
    groups: dict = {}
    for node in list(parent):
        groups.setdefault(find(node), []).append(node)
    labels = set()
    for members in groups.values():
        # min node id: path nodes (path_idx * path_len) are always smaller
        # than hub ids (≥ n_path_nodes)
        path_idxs = [m[1] for m in members if m[0] == "path"]
        if path_idxs:
            labels.add(min(path_idxs) * path_len)
        else:
            labels.add(min(m[1] for m in members if m[0] == "hub"))
    return len(groups), labels


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=100)
    ap.add_argument("--path-len", type=int, default=50_000)
    ap.add_argument("--hubs", type=int, default=10)
    ap.add_argument("--hub-deg", type=int, default=500_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--max-iter", type=int, default=60)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("cc-probe")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from jsonschema_go_spark.operators import dedup as dd

    # materialize the synthetic edges before the CC loop — mirrors the real
    # shape (a pipeline reads pairs from storage, not from a generator plan)
    # and sidesteps a Spark constraint-rewrite crash (UnionBase
    # rewriteConstraints: "key not found" when the range-generator's filter
    # constraints flow into the star-round unions)
    edges = build_edges(
        spark, args.paths, args.path_len, args.hubs, args.hub_deg
    ).localCheckpoint(eager=True)
    n_edges = edges.count()
    want_n, want_labels = expected_components(spark, edges, args.paths, args.path_len)

    t0 = time.perf_counter()
    cc = dd.connected_components(edges, max_iter=args.max_iter)
    got = cc.groupBy("component").agg(F.count(F.lit(1)).alias("sz")).collect()
    secs = time.perf_counter() - t0

    got_labels = {r["component"] for r in got}
    # singletons are not emitted; every path has ≥2 nodes and every hub has
    # ≥1 edge, so here every component IS emitted
    n_nodes_labeled = sum(r["sz"] for r in got)
    checks = {
        "component_count_match": len(got) == want_n,
        "label_set_match": got_labels == want_labels,
    }
    print(
        json.dumps(
            {
                "edges": n_edges,
                "nodes_labeled": n_nodes_labeled,
                "rounds": dd._LAST_ROUNDS,
                "seconds": round(secs, 2),
                "components": len(got),
                "expected_components": want_n,
                "checks": checks,
                "paths": args.paths,
                "path_len": args.path_len,
                "hubs": args.hubs,
                "hub_deg": args.hub_deg,
                "cpus": args.cpus,
            }
        )
    )
    spark.stop()
    if not all(checks.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
