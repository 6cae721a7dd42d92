"""Similarity search over embedding columns (driver mandate): brute-force
cosine top-k baseline + sign-LSH bucketed variant for the scale path.

Dot products run via ``F.zip_with`` + ``F.aggregate`` — a *sequential left
fold* in index order, so the double-precision result is deterministic and
bit-comparable with an oracle that folds in the same order.

Scale notes:
- brute force is O(Q × N) after broadcasting the Q query vectors — the right
  baseline when Q is small (dedup audits, eval probes);
- sign-LSH (random-hyperplane) buckets cut the candidate set to the matching
  bucket; hyperplane components are hash-derived (deterministic, no RNG
  state) so signatures are reproducible across runs and engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Deterministic double dot product (sequential fold in index order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k → ``(query_id, neighbor_id, rank, cos)``.

    Query vectors are broadcast (small side); candidates stream through one
    scan. Deterministic tie-break: (cos desc, neighbor_id asc).
    """
    q = df.where(F.col(id_col).isin(*list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    cand = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    sample_mod: Optional[int] = None,
) -> DataFrame:
    """Embedding near-duplicates: pairs with cosine ≥ threshold →
    ``(id_a, id_b, cos)``. ``sample_mod`` restricts the left side to
    ``id % sample_mod == 0`` (audit-sampling pattern for bounded cost)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    if sample_mod:
        a = a.where(F.col("id_a") % sample_mod == 0)
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        F.broadcast(a)
        .crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
) -> DataFrame:
    """IVF (inverted-file) index: assign every vector to its nearest centroid
    cell → ``(cell, id, vec)``.

    Centroids are the ``n_cells`` lowest-id vectors (deterministic; swap in
    k-means centroids for production without changing the query path). The
    assignment is a broadcast cross join + per-vector argmax — one scan, no
    wide shuffle; the index is written bucketed by ``cell`` at scale so probes
    read only matching buckets.
    """
    cents = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            F.col(vec_col).alias("_cent"),
        )
    )
    scored = df.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(cents)
    ).select(
        F.col(id_col),
        F.col(vec_col),
        "cell",
        cosine(F.col(vec_col), F.col("_cent")).alias("_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("cell", F.col(id_col), F.col(vec_col))
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-probed ANN top-k: search only the ``n_probe`` cells whose
    centroids are nearest each query → ``(query_id, neighbor_id, rank, cos)``.

    With ``n_probe == n_cells`` this is exhaustive and equals
    :func:`cosine_topk` exactly (tested); smaller probes trade recall for a
    ``n_probe/n_cells`` fraction of the scan — the 100 TB path where cells
    are storage buckets and unprobed buckets are never read.
    """
    index = ivf_index(df, id_col, vec_col, n_cells)
    cents = (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            F.col(vec_col).alias("_cent"),
        )
    )
    q = df.where(F.col(id_col).isin(*list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "_qv", "cell", cosine(F.col("_qv"), F.col("_cent")).alias("_sim"))
        .withColumn("_rk", F.row_number().over(wq))
        .where(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "cell")
    )
    scored = (
        probes.join(index, "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("_qv"), F.col(vec_col)), 6).alias("cos"),
        )
        .groupBy("query_id", "neighbor_id")  # a neighbor may match via several probes
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def sign_lsh_bucket(vec: Column, dim: int, planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (string of sign bits).

    Plane p's component j is ±1 derived from xxhash64(p, j, seed) — fully
    deterministic, no RNG state, no driver-side plane matrix to ship.
    """
    bits = []
    for p in range(planes):
        signs = F.array(*[
            F.when(
                F.pmod(F.xxhash64(F.lit(p), F.lit(j), F.lit(seed)), F.lit(2)) == 0,
                F.lit(1.0),
            ).otherwise(F.lit(-1.0))
            for j in range(dim)
        ])
        d = dot(vec, signs)
        bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    dim: int,
    k: int = 5,
    planes: int = 8,
) -> DataFrame:
    """Bucketed ANN top-k: candidates restricted to the query's LSH bucket
    → ``(query_id, neighbor_id, rank, cos)``. Approximate (bucket recall);
    the scale path when brute force is too expensive."""
    with_bucket = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_lsh_bucket(F.col(vec_col), dim, planes).alias("_bucket"),
    )
    q = with_bucket.where(F.col(id_col).isin(*list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_bucket"),
    )
    cand = with_bucket.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), "_bucket"
    )
    scored = (
        F.broadcast(q)
        .join(cand, "_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
