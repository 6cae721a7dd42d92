"""Unit tests for training-data pipeline operators: shingles, minhash
properties, simhash bounds, multimodal Arrow plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark.operators import dedup as dd
from jsonschema_go_spark.operators import multimodal as mm
from jsonschema_go_spark.operators import similarity as sim
from jsonschema_go_spark.operators import text as tx


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("  x   y  z ",)], "t string"
    )
    rows = df.select(dd.word_shingles(F.col("t"), 3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []  # fewer words than n
    assert rows[2]["s"] == []
    assert rows[3]["s"] == ["x y z"]  # whitespace-normalized


def test_minhash_is_true_minhash(spark):
    """Signature equals the python min over md5(shingle + '#i') — guards the
    F.transform index-argument footgun."""
    df = spark.createDataFrame([(1, "w1 w2 w3 w4 w5")], "id long, t string")
    mh = dd.minhash_table(df, "id", "t", num_hashes=4).first()
    shingles = {"w1 w2 w3", "w2 w3 w4", "w3 w4 w5"}
    for i in range(4):
        expected = min(
            hashlib.md5((s + f"#{i}").encode()).hexdigest() for s in shingles
        )
        assert mh[f"mh{i}"] == expected, f"seed {i}"


def test_minhash_identical_docs_always_candidates(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different text with other words entirely here")],
        "id long, t string",
    )
    pairs = {(r["id_a"], r["id_b"]) for r in dd.lsh_candidate_pairs(df, "id", "t").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),   # identical
         (3, "alpha beta gamma delta epsilon eta"),    # 1 word changed
         (4, "totally unrelated words here now ok")],
        "id long, t string",
    )
    sigs = {r["id"]: r["simhash_hex"] for r in dd.simhash64(df, "id", "t").collect()}
    assert all(len(s) == 16 for s in sigs.values())
    assert sigs[1] == sigs[2]

    def ham(a, b):
        return sum(bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b))

    assert ham(sigs[1], sigs[3]) < ham(sigs[1], sigs[4])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dd.simhash_near_pairs(df, "id", "t", max_hamming=0).collect()}
    assert pairs.get((1, 2)) == 0


def test_exact_duplicates_normalized(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other")], "id long, t string"
    )
    groups = dd.exact_duplicates(df, "id", "t").collect()
    assert len(groups) == 1 and groups[0]["dup_count"] == 2


def test_cosine_self_similarity(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    tk = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
          for r in sim.cosine_topk(df, "vec_id", "embedding", [0], k=3).collect()}
    assert tk[(0, 1)] == (1, 1.0)       # identical vector first
    assert tk[(0, 2)][1] == 0.0          # orthogonal
    assert tk[(0, 3)] == (3, -1.0)       # opposite last


def test_lsh_bucket_deterministic(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    b1 = df.select(sim.sign_lsh_bucket(F.col("embedding"), 4, planes=8).alias("b")).first()["b"]
    b2 = df.select(sim.sign_lsh_bucket(F.col("embedding"), 4, planes=8).alias("b")).first()["b"]
    assert b1 == b2 and len(b1) == 8 and set(b1) <= {"0", "1"}


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, None)], "doc_id long, text string"
    )
    assets = mm.synthesize_assets(docs, "doc_id", "text")
    feats = mm.extract_features(assets)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 3
    # checksum matches a locally-computed sha256 of the payload
    assert rows[1]["checksum"] == hashlib.sha256(b"hello").hexdigest()
    assert rows[1]["n_bytes"] == 5
    assert len(rows[1]["features"]) == mm.FEATURE_DIM
    assert all(0.0 <= f <= 1.0 for f in rows[1]["features"])
    # deterministic fake decode
    expected = [hashlib.sha256(b"hello").digest()[i] / 255.0 for i in range(mm.FEATURE_DIM)]
    assert rows[1]["features"] == pytest.approx(expected)
    # None text → empty payload, not a crash
    assert rows[3]["n_bytes"] == 0


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("good text with enough words to score well over the threshold here ok fine yes",),
         ("!!!???...",), ("",)],
        "text string",
    )
    rows = tx.quality_features(df).select("quality_score").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert rows[0]["quality_score"] > rows[1]["quality_score"]


def test_ivf_exhaustive_equals_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [0, 100, 200]
    brute = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
             for r in sim.cosine_topk(emb, "vec_id", "embedding", qids, k=5).collect()}
    ivf_all = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos"])
               for r in sim.ivf_topk(emb, "vec_id", "embedding", qids, k=5,
                                     n_cells=8, n_probe=8).collect()}
    assert ivf_all == brute


def test_ivf_probed_subset(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = sim.ivf_topk(emb, "vec_id", "embedding", [0, 100], k=5,
                       n_cells=8, n_probe=2).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rows in per_q.items():
        assert len(rows) <= 5
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cs = [r["cos"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)


def test_ivf_index_partitions_all_vectors(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = sim.ivf_index(emb, "vec_id", "embedding", n_cells=8)
    assert idx.count() == emb.count()          # every vector in exactly one cell
    assert idx.select("vec_id").distinct().count() == emb.count()
    assert idx.select("cell").distinct().count() == 8


def test_lsh_near_dup_hot_bucket_cap(spark):
    """max_bucket_freq drops band-buckets larger than the cap (the LSH
    stop-shingle guard): identical vectors all land in one bucket per band,
    so a cap below the cluster size suppresses their pairs; without the cap
    the pairs are found and exact-verified."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(20)]  # one hot cluster
    rows += [(100, [-1.0, 5.0, -3.0, 2.0]), (101, [-1.0, 5.0, -3.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    uncapped = sim.lsh_near_dup_pairs(
        df, "vec_id", "embedding", dim=4, threshold=0.99, bands=4, rows_per_band=4
    )
    # 20-cluster all-pairs (190) + the small pair
    assert uncapped.count() == 190 + 1

    capped = sim.lsh_near_dup_pairs(
        df, "vec_id", "embedding", dim=4, threshold=0.99,
        bands=4, rows_per_band=4, max_bucket_freq=5,
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got          # small bucket survives the cap
    assert len(got) == 1              # hot-cluster pairs suppressed


def test_kmeans_centroids_and_ivf_exhaustive_equivalence(spark):
    """k-means centroids are a drop-in for the IVF cell layout: with
    exhaustive probes the results STILL equal brute force regardless of the
    centroid quality (cells only partition the search space)."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.kmeans_centroids(df, "vec_id", "embedding", k=8, iters=3)
    assert len(cents) == 8 and all(len(c) == 64 for c in cents)

    qids = [0, 50, 100]
    brute = sim.cosine_topk(df, "vec_id", "embedding", qids, k=5)
    ivf_km = sim.ivf_topk(
        df, "vec_id", "embedding", qids, k=5, n_cells=8, n_probe=8, centroids=cents
    )
    a = sorted(tuple(r) for r in brute.collect())
    b = sorted(tuple(r) for r in ivf_km.collect())
    assert a == b

    # probe-limited k-means cells remain a valid (subset) search
    part = sim.ivf_topk(
        df, "vec_id", "embedding", qids, k=5, n_cells=8, n_probe=2, centroids=cents
    )
    got = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    assert got and got.issubset({(x[0], x[1]) for x in a} | got)


def test_kmeans_survives_zero_vector(spark):
    """Review finding: cosine assignment divided by zero on a zero-norm
    vector (job abort under ANSI). Zero vectors now score -1 everywhere."""
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = sim.kmeans_centroids(df, "vec_id", "embedding", k=2, iters=2)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)


def test_multimodal_resize_and_frame_sample(spark):
    """Resize (1→1) and frame-sample (1→N) plumbing: typed schemas, exact
    byte sizes, deterministic checksums — only the decode body is a stub."""
    from jsonschema_go_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "x"), (3, None)], "doc_id long, text string"
    )
    assets = mm.synthesize_assets(docs, "doc_id", "text")

    resized = mm.resize_images(assets, width=8, height=4).orderBy("asset_id")
    rows = resized.collect()
    assert [r["asset_id"] for r in rows] == [1, 2, 3]
    assert all(len(r["resized"]) == 32 for r in rows)  # 8*4 bytes exactly
    # deterministic: same inputs, same checksums on a second run
    again = {r["asset_id"]: r["resized_checksum"] for r in mm.resize_images(assets, 8, 4).collect()}
    assert again == {r["asset_id"]: r["resized_checksum"] for r in rows}

    frames = mm.sample_frames(assets, n_frames=4).orderBy("asset_id", "frame_idx")
    by_asset = {}
    for r in frames.collect():
        by_asset.setdefault(r["asset_id"], []).append(r)
    assert len(by_asset[1]) == 4  # 11-byte payload → 4 frames
    assert sum(r["frame_bytes"] for r in by_asset[1]) == 11  # slices cover all
    assert len(by_asset[2]) == 1  # 1-byte payload → short clip, 1 frame
    # doc 3 has empty payload (None text → ''): zero frames
    assert 3 not in by_asset


# ------------------------------------------------- connected components

def _union_find(edges):
    """Reference union-find for CC oracle checks."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_check(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["node"], r["component"])
        for r in dd.connected_components(pairs).collect()
    }
    want = set(_union_find(edges).items())
    assert got == want


def test_connected_components_chain(spark):
    """A 50-node chain: worst case for naive label propagation (diameter 50);
    large-star/small-star must converge in O(log n) rounds within max_iter."""
    _cc_check(spark, [(i, i + 1) for i in range(50)])


def test_connected_components_mixed_graph(spark):
    edges = (
        [(0, 1), (1, 2), (2, 0)]          # triangle
        + [(10, 11)]                        # isolated pair
        + [(20, 21), (21, 22), (23, 22)]    # path with reversed edge
        + [(30, 31), (31, 30), (30, 30)]    # dup + self-loop noise
    )
    _cc_check(spark, edges)


def test_connected_components_hash_random(spark):
    """Deterministic pseudo-random graph vs union-find ground truth."""
    edges = []
    for i in range(200):
        h = int(hashlib.md5(f"e{i}".encode()).hexdigest(), 16)
        edges.append((h % 97, (h // 97) % 97))
    edges = [(a, b) for a, b in edges if a != b]
    _cc_check(spark, edges)


def test_duplicate_clusters_and_keep_list(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    clusters = {
        r["node"]: (r["cluster_id"], r["is_survivor"])
        for r in dd.duplicate_clusters(pairs).collect()
    }
    assert clusters == {
        0: (0, True), 3: (0, False), 5: (0, False),
        6: (6, True), 7: (6, False),
    }
    kept = sorted(
        r["doc_id"] for r in dd.dedup_keep_list(df, "doc_id", pairs).collect()
    )
    assert kept == [0, 1, 2, 4, 6]  # survivors + singletons; 3,5,7 dropped


# --------------------------------------------- k-means large-k assignment

def test_assign_cells_join_matches_literal_k256(spark):
    """The broadcast-join argmax (large-k path) must produce the SAME cell
    assignment as the plan-literal argmax for identical centroids — k=256 is
    past the literal path's documented ceiling (auto switches at 64)."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [
        [
            (int(hashlib.md5(f"{c}:{j}".encode()).hexdigest(), 16) % 2001 - 1000)
            / 1000.0
            for j in range(64)
        ]
        for c in range(256)
    ]
    lit = {
        r["vec_id"]: r["_cell"]
        for r in sim.assign_cells(df, "vec_id", "embedding", cents, via="literal").collect()
    }
    join = {
        r["vec_id"]: r["_cell"]
        for r in sim.assign_cells(df, "vec_id", "embedding", cents, via="join").collect()
    }
    assert len(lit) == 500
    assert lit == join


def test_kmeans_join_mode_matches_literal(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    a = sim.kmeans_centroids(df, "vec_id", "embedding", k=8, iters=2, assign="literal")
    b = sim.kmeans_centroids(df, "vec_id", "embedding", k=8, iters=2, assign="join")
    assert len(a) == len(b) == 8
    for ca, cb in zip(a, b):
        for x, y in zip(ca, cb):
            assert abs(x - y) < 1e-9  # same assignments; means ulp-comparable


# ------------------------------------------------ stored IVF index pruning

def test_stored_ivf_matches_in_memory_and_prunes(spark, tmp_path):
    """write_ivf_index + ivf_topk_stored: results equal the in-memory ivf_topk
    for the same centroid layout, AND the scoring scan is partition-pruned to
    the probed cells (the plan carries a cell IN (...) PartitionFilter)."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    qids = [0, 100, 200]
    sim.write_ivf_index(df, "vec_id", "embedding", path, n_cells=8)

    got = sim.ivf_topk_stored(spark, path, "vec_id", "embedding", qids, k=5, n_probe=2)
    want = sim.ivf_topk(df, "vec_id", "embedding", qids, k=5, n_cells=8, n_probe=2)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # plan-level pruning evidence: the index scan filters on the partition
    # column, so unprobed cell directories are never read
    index = spark.read.parquet(path)
    probe_cells = [1, 3]
    pruned = index.where(F.col("cell").isin(probe_cells))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # and the files ACTUALLY read (runtime truth) are only the probed cells'
    read_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    all_files = {
        r[0] for r in index.select(F.input_file_name()).distinct().collect()
    }
    assert read_files < all_files
    assert all(any(f"cell={c}/" in f for c in probe_cells) for f in read_files)
