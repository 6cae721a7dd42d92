"""Round-4 fixes (VERDICT.md r3 "Next round" items 1, 3, 6):

1. `ivf_index` builds cell assignment with the max_by join-argmax aggregate
   instead of the crossJoin + row_number window — parity with the window
   reference at n_cells ∈ {16, 256}, and a plan assertion that the build has
   no Window and a map-side partial aggregate before the exchange.
3. `connected_components` fuses the convergence statistic into the
   checkpoint pass — one driver-blocking action per star-round.
6. `ivf_topk_stored` resolves query-by-id vectors through the `_ids/`
   sidecar — both lookup modes physically read only probed/home cells.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jsonschema_go_spark.operators import dedup as dd
from jsonschema_go_spark.operators import similarity as sim


def _ivf_index_window_reference(df, id_col, vec_col, n_cells, centroids=None):
    """The round-3 implementation, kept as the semantic reference: broadcast
    crossJoin + row_number window argmax (desc sim, asc cell)."""
    cents = sim._cents_df(df, id_col, vec_col, n_cells, centroids).withColumn(
        "_centn", sim.norm(F.col("_cent"))
    )
    scored = (
        df.select(F.col(id_col), F.col(vec_col), sim.norm(F.col(vec_col)).alias("_vn"))
        .crossJoin(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cell"),
            sim._safe_ratio(
                sim.dot(F.col(vec_col), F.col("_cent")), F.col("_vn"), F.col("_centn")
            ).alias("_sim"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cell"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("cell", F.col(id_col), F.col(vec_col))
    )


@pytest.mark.parametrize("n_cells", [16, 256])
def test_ivf_index_argmax_matches_window_reference(spark, n_cells):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = {
        (r["vec_id"], r["cell"])
        for r in _ivf_index_window_reference(df, "vec_id", "embedding", n_cells).collect()
    }
    got_rows = sim.ivf_index(df, "vec_id", "embedding", n_cells).collect()
    got = {(r["vec_id"], r["cell"]) for r in got_rows}
    assert len(got_rows) == df.count()  # every vector assigned exactly once
    assert got == want
    # the carried vector is the original one
    vecs = {r["vec_id"]: list(r["embedding"]) for r in df.collect()}
    for r in got_rows[:20]:
        assert list(r["embedding"]) == vecs[r["vec_id"]]


def test_ivf_index_build_plan_no_window(spark):
    """Scale shape of the index build: with explicit centroids the plan has
    NO Window (no per-id sort-rank of n_cells vector copies). r7: the
    default path is the broadcast-centroid Arrow argmax map (no aggregate
    at all); the JVM max_by fallback (taken for centroid tables the numpy
    replay can't guarantee, here a NULL element) must still run its argmax
    as a map-side partial aggregate BEFORE the exchange."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = [[float((c * 64 + j) % 7 - 3) for j in range(64)] for c in range(16)]
    idx = sim.ivf_index(df, "vec_id", "embedding", centroids=cents)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "MapInArrow" in plan or "ArrowEval" in plan  # vectorized default
    # JVM fallback: a default centroid table whose vectors carry a NULL
    # element (the numpy replay declines) → partial max_by before exchange
    rows = [(0, [None] + [1.0] * 7), (1, [0.5] * 8), (2, [1.0] * 8), (3, [-1.0] * 8)]
    df2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx2 = sim.ivf_index(df2, "vec_id", "embedding", n_cells=2)
    plan2 = idx2._jdf.queryExecution().executedPlan().toString()
    # (the default _cents_df numbers its <= n_cells seed rows with a tiny
    # row_number window — pre-existing; the ARGMAX itself must stay a
    # map-side partial max_by before the exchange, never a window sort)
    assert "partial_max_by" in plan2
    assert plan2.index("Exchange") < plan2.index("partial_max_by")


def test_connected_components_one_action_per_round(spark):
    """Convergence-stat fusion: with AQE off, each star-round costs exactly
    ONE Spark job (the agg action that also materializes the lazy local
    checkpoint) — round 3 paid two (eager checkpoint + separate agg)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    sc = spark.sparkContext
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("cc-r4", "fused convergence probe")
        got = {
            (r["node"], r["component"])
            for r in dd.connected_components(
                pairs, local_finish_threshold=0
            ).collect()
        }
        jobs = sc.statusTracker().getJobIdsForGroup("cc-r4")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        sc.setJobGroup(None, None)
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    # jobs = 1 (initial edge checkpoint) + rounds (one fused agg each)
    #       + 1 (final collect)
    assert dd._LAST_ROUNDS >= 2
    assert len(jobs) == 1 + dd._LAST_ROUNDS + 1


def test_cc_local_finish_matches_distributed(spark):
    """Small-graph cutoff: once the contracted edge set drops below the
    threshold, the driver-side union-find finish must produce EXACTLY the
    distributed fixpoint's (node, min-id component) labels — same rows, same
    schema — on a mixed graph (chain + triangle + isolated pair + star)."""
    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),          # chain
        (10, 11), (11, 12), (10, 12),            # triangle
        (20, 21),                                # pair
        (30, 31), (30, 32), (30, 33),            # star (hub 30)
        (5, 33),                                 # bridge chain<->star
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = dd.connected_components(pairs, local_finish_threshold=100_000)
    dist = dd.connected_components(pairs, local_finish_threshold=0)
    assert local.schema == dist.schema
    assert sorted(map(tuple, local.collect())) == sorted(map(tuple, dist.collect()))
    # the cutoff actually fired (graph is far below the threshold)
    comp = {r["node"]: r["component"] for r in local.collect()}
    assert comp[33] == 1 and comp[12] == 10 and comp[21] == 20


def test_fk_orphans_null_semantics_and_broadcast(spark):
    """Cross-table FK check: NULL FKs pass (SQL semantics — no reference is
    not an orphan), orphans are exact, and the dimension-side anti-join is a
    broadcast hash join (zero shuffle of the child)."""
    from jsonschema_go_spark.operators import uniqueness as uq

    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 20)], "id long, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk int")
    orphans = uq.fk_orphans(child, "fk", parent, "pk")
    assert {r["id"] for r in orphans.collect()} == {2}
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    summary = uq.fk_conformance(
        [("child.fk", child, "fk", parent, "pk")]
    ).collect()
    assert [tuple(r) for r in summary] == [("child.fk", 3, 1)]


def test_violations_sql_rejects_unrenderable_observed():
    """ADVICE r3: the CAST(col AS VARCHAR) `observed` rendering only
    byte-matches Spark for string/integer/timestamp columns — other elem
    types must be rejected loudly, not silently mis-hashed."""
    from jsonschema_go_spark.oracle import violations_sql
    from jsonschema_go_spark.rules import Rule, TableRule

    tr = TableRule(
        name="t",
        columns={"v": Rule(type="number", minimum=0.0)},
        metadata={},
    )
    with pytest.raises(ValueError, match="not byte-stable"):
        violations_sql(tr, "t", ["v"], {"v": "double"})


def test_check_preds_carry_column_and_keyword():
    """ADVICE r3: (column, keyword) come from the CheckPred fields, never
    from rsplit('.') on the rule_id — a dotted column name must round-trip."""
    from jsonschema_go_spark.oracle import check_preds_sql, violations_sql
    from jsonschema_go_spark.rules import Rule, TableRule

    tr = TableRule(
        name="t",
        columns={'"a.b"': Rule(type="string", min_length=1)},
        metadata={},
    )
    preds = check_preds_sql(tr, {'"a.b"': "string"})
    # `type` is statically elided on a typed string column; minLength remains
    assert [(c.column, c.keyword) for c in preds] == [('"a.b"', "minLength")]
    sql = violations_sql(tr, "t", ['"a.b"'], {'"a.b"': "string"})
    # the rendered column/keyword literals are the true pair, not a split
    assert "'\"a.b\"' AS \"column\"" in sql and "'minLength' AS keyword" in sql


def test_stage_transcripts_atomic_and_derived_dir(spark):
    """ADVICE r3: staging writes to a temp dir and renames into place (a
    reader never sees a partial table), recovers a stale partial dir, and
    STAGE_DIR derives from the package location instead of a hard-coded
    absolute path."""
    import os
    import shutil

    from jsonschema_go_spark.sources import transcripts as tr

    pkg_root = os.path.dirname(
        os.path.dirname(os.path.abspath(tr.__file__))
    )
    assert tr.STAGE_DIR == os.path.join(os.path.dirname(pkg_root), ".stage")

    path = f"{tr.STAGE_DIR}/transcripts_v{tr.GEN_VERSION}_sf0.001"
    shutil.rmtree(path, ignore_errors=True)
    got = tr.stage_transcripts(spark, "0.001")
    assert got == path and os.path.exists(f"{path}/_SUCCESS")
    parent = os.path.dirname(path)
    assert not [d for d in os.listdir(parent) if ".tmp-" in d]

    # stale partial leftover (no _SUCCESS) is replaced by a complete table
    shutil.rmtree(path)
    os.makedirs(path)
    with open(f"{path}/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    tr.stage_transcripts(spark, "0.001")
    assert os.path.exists(f"{path}/_SUCCESS")
    assert not os.path.exists(f"{path}/garbage.parquet")


def test_stored_ivf_ids_sidecar_prunes_both_lookup_modes(spark, tmp_path):
    """`_ids/` sidecar: query-by-id lookup reads ONLY the queries' home-cell
    partitions (plus the tiny sidecar), and results equal both the
    query_vectors mode and the in-memory ivf_topk."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf")
    qids = [0, 100, 200]
    sim.write_ivf_index(df, "vec_id", "embedding", path, n_cells=8)

    # by-id lookup goes through the sidecar and must read a strict subset of
    # the index files, all from the queries' home cells
    lookup = sim._stored_query_lookup(spark, path, "vec_id", "embedding", qids)
    assert lookup.count() == len(qids)
    ids = spark.read.parquet(f"{path}/_ids")
    home_cells = {
        r["cell"] for r in ids.where(F.col("vec_id").isin(qids)).collect()
    }
    lookup_files = {
        r[0] for r in lookup.select(F.input_file_name()).distinct().collect()
    }
    index = spark.read.parquet(path)
    all_files = {
        r[0] for r in index.select(F.input_file_name()).distinct().collect()
    }
    assert lookup_files < all_files
    assert all(
        any(f"cell={c}/" in f for c in home_cells) for f in lookup_files
    )
    plan = lookup._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # result parity: by-id == by-vector == in-memory
    by_id = sim.ivf_topk_stored(
        spark, path, "vec_id", "embedding", qids, k=5, n_probe=2
    )
    qvecs = [
        (r["vec_id"], list(r["embedding"]))
        for r in df.where(F.col("vec_id").isin(qids)).collect()
    ]
    by_vec = sim.ivf_topk_stored(
        spark, path, "vec_id", "embedding", qids, k=5, n_probe=2,
        query_vectors=qvecs,
    )
    want = sim.ivf_topk(df, "vec_id", "embedding", qids, k=5, n_cells=8, n_probe=2)
    a = sorted(map(tuple, by_id.collect()))
    b = sorted(map(tuple, by_vec.collect()))
    c = sorted(map(tuple, want.collect()))
    assert a == b == c
