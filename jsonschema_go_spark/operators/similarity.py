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


def _norms_py(cents: list) -> list:
    """Driver-side centroid norms, bit-identical to :func:`norm`'s SQL fold:
    Python floats are IEEE-754 doubles and the sum runs in the same
    sequential index order, so ``acc + x*x`` rounds identically."""
    import math

    return [math.sqrt(sum_fold(c)) for c in cents]


def sum_fold(xs) -> float:
    acc = 0.0
    for x in xs:
        acc = acc + float(x) * float(x)
    return acc


def _safe_ratio(d: Column, na: Column, nb: Column) -> Column:
    """dot/(na*nb) with a zero-norm guard: cosine is undefined for a zero
    vector, and x/0.0 aborts the job under ANSI mode (while NaN would poison
    every desc() window — Spark orders NaN above all doubles). Zero-norm
    pairs score -1.0: never a near-dup, never a top-k winner."""
    denom = na * nb
    return F.when(denom == 0, F.lit(-1.0)).otherwise(d / denom)


def cosine(a: Column, b: Column) -> Column:
    return _safe_ratio(dot(a, b), norm(a), norm(b))


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
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    cand = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _safe_ratio(dot(F.col("_qv"), F.col("_cv")), F.col("_qn"), F.col("_cn")), 6
            ).alias("cos"),
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
    """EXACT embedding near-duplicates: pairs with cosine ≥ threshold →
    ``(id_a, id_b, cos)``. ``sample_mod`` restricts BOTH sides to the
    deterministic ``id % sample_mod == 0`` corpus sample — the audit
    semantics: estimate the near-dup rate from all pairs *within* a
    1/sample_mod sample, cost O((N/mod)²) instead of O(N²). (The earlier
    left-side-only sampling still compared the sample against the FULL
    corpus — an unbounded O(N²/mod) cartesian behind a gated query name.)

    The sampled form runs VECTORIZED (round 7): the bounded sample matrix is
    broadcast once and each task scores its Arrow batch of sample rows
    against it with per-dimension numpy passes that replay the exact
    sequential IEEE fold of :func:`dot`/:func:`norm` (bit-identical doubles
    — pytest-asserted), instead of evaluating an interpreted
    ``zip_with``+``aggregate`` fold per pair inside a cartesian join
    (measured 96 s → ~3 s at sf1.0, 12.5M pairs × 64 dims). The audit
    contract already bounds the sample (it IS the audit's working set), so
    broadcasting it is the same memory class as `cosine_topk`'s query
    broadcast.

    With ``sample_mod=None`` it is the full all-pairs compare — DO NOT run
    that form at scale; it exists as the ground truth the banded path is
    verified against. No broadcast hint — Catalyst plans a partitioned
    cartesian product, so neither side must fit in executor memory. For the
    full-corpus scale path use :func:`lsh_near_dup_pairs` (banded
    candidates, exact verify).
    """
    if sample_mod:
        return _sampled_near_dup_pairs_vectorized(
            df, id_col, vec_col, threshold, sample_mod
        )
    # norms once per vector (not per pair): each pair costs ONE fold (the
    # dot), not three — same floating-point value, 2.5× fewer interpreted ops
    base = df
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _safe_ratio(dot(F.col("_va"), F.col("_vb")), F.col("_na"), F.col("_nb")), 6
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _np_seq_norms(mat):
    """Row norms via the same sequential per-dimension IEEE fold as
    :func:`norm` — ``acc = acc + v_j * v_j`` in index order, then sqrt —
    so every double is bit-identical to the SQL aggregate's."""
    import numpy as np

    acc = np.zeros(mat.shape[0])
    for j in range(mat.shape[1]):
        acc = acc + mat[:, j] * mat[:, j]
    return np.sqrt(acc)


def _sampled_near_dup_pairs_vectorized(
    df: DataFrame, id_col: str, vec_col: str, threshold: float, sample_mod: int
) -> DataFrame:
    """Vectorized audit-sample near-dup pairs (see
    :func:`embedding_near_dup_pairs`). The sample (the audit's bounded
    working set) is collected once and broadcast; tasks stream their own
    Arrow batch of sample rows against it. Per-dimension numpy passes
    replay :func:`dot`'s sequential fold order exactly, so the raw cosines
    are bit-identical to the expression form; the final ``round(…, 6)`` and
    threshold filter stay in Spark so the emitted values and filter
    semantics are the same expressions as before. Python pre-filters to a
    small SUPERSET (``raw ≥ threshold − 1e-6``, covering the half-up
    round-at-6 boundary; NaN/NULL-input pairs compare False and drop,
    matching the NULL-cos drop of the join form).

    Vectors are grouped by length on both sides and only equal-length
    blocks are scored — the join form's ``zip_with`` null-pads unequal
    lengths into a NULL dot, so cross-length pairs never pass there either.
    """
    import numpy as np
    import pyarrow as pa

    spark = df.sparkSession
    id_dt = df.schema[id_col].dataType.simpleString()
    pa_id = {"int": pa.int32(), "bigint": pa.int64(), "smallint": pa.int16()}.get(
        id_dt, pa.int64()
    )
    side = (
        df.where(F.col(id_col) % sample_mod == 0)
        .where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
    )
    # the bounded audit sample — ids + vectors only (the documented contract:
    # the sample is the audit's working set and must fit one broadcast)
    rows = side.collect()
    by_len: dict = {}
    for r in rows:
        v = r["_v"]
        by_len.setdefault(len(v), ([], []))
        ids, vecs = by_len[len(v)]
        ids.append(r["_id"])
        vecs.append(v)
    groups = {}
    for ln, (ids, vecs) in by_len.items():
        # None elements become NaN under an explicit float64 dtype; NaN
        # propagates through the fold and fails every >= comparison — the
        # same drop the NULL-poisoned SQL fold produces
        mat = np.array(vecs, dtype=np.float64)
        if mat.ndim == 1:  # zero-length vectors
            mat = mat.reshape(len(vecs), 0)
        groups[ln] = (
            np.array(ids, dtype=np.int64),
            mat,
            _np_seq_norms(mat),
        )
    from .dedup import _supersede_broadcast

    bc = _supersede_broadcast(spark, f"neardup_sample:{id_col}", groups)
    # superset margin covering the HALF_UP round-at-6-digits boundary
    pre_thr = threshold - 1e-6

    def score(batches):
        g = bc.value
        for batch in batches:
            a_ids_all = batch.column("_id").to_numpy(zero_copy_only=False)
            a_vecs = batch.column("_v").to_pylist()
            # group the batch rows by vector length to match the sample side
            a_by_len: dict = {}
            for i, v in enumerate(a_vecs):
                a_by_len.setdefault(len(v), []).append(i)
            out_a, out_b, out_c = [], [], []
            for ln, idxs in a_by_len.items():
                a_mat = np.array([a_vecs[i] for i in idxs], dtype=np.float64)
                if a_mat.ndim == 1:
                    a_mat = a_mat.reshape(len(idxs), 0)
                a_ids = a_ids_all[idxs].astype(np.int64)
                a_nrm = _np_seq_norms(a_mat)
                if ln in g:
                    b_ids, b_mat, b_nrm = g[ln]
                    # sequential-order dot: one fused multiply+add pass per
                    # dim, identical rounding to the SQL fold per (pair, dim)
                    acc = np.zeros((a_mat.shape[0], b_mat.shape[0]))
                    for j in range(ln):
                        acc = acc + a_mat[:, j][:, None] * b_mat[:, j][None, :]
                    denom = a_nrm[:, None] * b_nrm[None, :]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = np.where(
                            denom == 0.0, -1.0, acc / np.where(denom == 0.0, 1.0, denom)
                        )
                    mask = (a_ids[:, None] < b_ids[None, :]) & (cos >= pre_thr)
                    ai, bi = np.nonzero(mask)
                    out_a.append(a_ids[ai])
                    out_b.append(b_ids[bi])
                    out_c.append(cos[ai, bi])
                if pre_thr <= -1.0:
                    # cross-length pairs: the join form's zero-norm guard
                    # fires BEFORE the null-padded dot, so a pair with either
                    # norm exactly 0 scores -1.0 even across lengths; all
                    # other cross-length pairs have a NULL dot and drop.
                    # Only reachable at threshold ≤ -1.0 (+ rounding margin).
                    for ln_b, (b_ids, _bm, b_nrm) in g.items():
                        if ln_b == ln:
                            continue
                        # the guard tests denom == 0, so a NaN norm (NULL
                        # element in the vector) never qualifies: NaN*0 != 0
                        zmask = (a_ids[:, None] < b_ids[None, :]) & (
                            (a_nrm[:, None] * b_nrm[None, :]) == 0.0
                        )
                        ai, bi = np.nonzero(zmask)
                        out_a.append(a_ids[ai])
                        out_b.append(b_ids[bi])
                        out_c.append(np.full(len(ai), -1.0))
            if out_a:
                ids_a = np.concatenate(out_a)
                ids_b = np.concatenate(out_b)
                coss = np.concatenate(out_c)
            else:
                ids_a = np.array([], dtype=np.int64)
                ids_b = np.array([], dtype=np.int64)
                coss = np.array([], dtype=np.float64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_a).cast(pa_id),
                    pa.array(ids_b).cast(pa_id),
                    pa.array(coss, type=pa.float64()),
                ],
                names=["id_a", "id_b", "_rawcos"],
            )

    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    scored = side.repartition(n_parts).mapInArrow(
        score, f"id_a {id_dt}, id_b {id_dt}, _rawcos double"
    )
    return scored.select(
        "id_a", "id_b", F.round(F.col("_rawcos"), 6).alias("cos")
    ).where(F.col("cos") >= threshold)


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    bands: int = 16,
    rows_per_band: int = 8,
    seed: int = 42,
    max_bucket_freq: Optional[int] = None,
    max_broadcast_vectors: int = 100_000,
) -> DataFrame:
    """SCALE-PATH embedding near-duplicates: banded sign-LSH candidate
    generation + exact-cosine verification → ``(id_a, id_b, cos ≥ threshold)``.

    Candidates are pairs agreeing on ≥1 of ``bands`` band keys (each key =
    ``rows_per_band`` hyperplane sign bits) — an equi-join on (band, key),
    never an all-pairs compare; every candidate is then verified with the
    exact cosine, so precision is 1.0 and only recall is probabilistic:
    P(miss) = (1 − p^r)^b with p = 1 − θ/π. At near-dup thresholds (≥0.9,
    θ ≤ 26°) the defaults give P(miss) < 1e-2 per pair; raise ``bands`` for
    tighter guarantees. Low thresholds (< ~0.7) are NOT a near-dup workload —
    p per plane decays and banding degenerates; use the exact path there.

    ``max_bucket_freq`` drops band-buckets with more members than the cap —
    the stop-shingle guard of the Jaccard path applied to LSH (hot buckets =
    degenerate planes or clustered data; at 100 TB a single hot bucket would
    otherwise quadratically dominate the join).
    """
    sig_udf = sign_lsh_bucket_vectorized(dim, bands * rows_per_band, seed)
    # ids only through the explode + self-join: carrying the vectors would
    # duplicate them bands× through the shuffle; they are re-attached to the
    # deduped candidate pairs with two id-equi-joins instead.
    # The signature table is localCheckpoint-ed ONCE (r7): it feeds up to
    # three consumers (hot-bucket freq, both self-join sides) and the
    # round-6 plan re-ran the Arrow signature UDF + corpus construction for
    # each (plan-verified: 16 parquet scans, 0 reused exchanges). One row
    # per vector (id + sig string); superseded copies are released.
    from .dedup import _supersede_checkpoint

    sigs = _supersede_checkpoint(
        f"signlsh_sig:{id_col}",
        df.select(F.col(id_col).alias("_id"), sig_udf(F.col(vec_col)).alias("_sig")),
    )
    banded = (
        sigs.select(
            "_id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring("_sig", b * rows_per_band + 1, rows_per_band).alias("key"),
                    )
                    for b in range(bands)
                ])
            ).alias("_bk"),
        )
        .select("_id", F.col("_bk.band").alias("_band"), F.col("_bk.key").alias("_key"))
    )
    if max_bucket_freq is not None:
        hot = (
            banded.groupBy("_band", "_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket_freq)
            .select("_band", "_key")
        )
        banded = banded.join(F.broadcast(hot), ["_band", "_key"], "left_anti")
    a = banded.select(F.col("_id").alias("id_a"), "_band", "_key")
    b = banded.select(F.col("_id").alias("id_b"), "_band", "_key")
    cand = (
        a.join(b, ["_band", "_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])  # a pair may collide in many bands
    )
    # exact verification (r7): the candidate set is collision-dominated
    # (1.45M pairs at sf1.0 for ~2k true ones) and the round-6 tail both
    # SHUFFLED a 64-double vector payload per candidate side through two
    # id-joins (guide §8: decide with small rows, move big rows once) and
    # paid an interpreted zip_with fold per pair. When the vector table
    # fits the broadcast guard, candidates now stay IDS-ONLY end to end:
    # each task looks both sides up in one broadcast matrix and replays the
    # sequential IEEE fold in numpy (bit-identical doubles; zero-norm /
    # NULL / length-mismatch semantics replicated — pytest-pinned). Python
    # emits a raw-cos superset; Spark applies the identical round(…,6) +
    # threshold filter. Beyond the guard the join+vectorized-verify form
    # runs instead (no broadcast, unchanged scale story).
    import pyarrow as pa

    id_dt = df.schema[id_col].dataType.simpleString()
    pre_thr = threshold - 1e-6
    if max_broadcast_vectors and df.limit(max_broadcast_vectors + 1).count() <= max_broadcast_vectors:
        return _lsh_verify_broadcast(
            df, id_col, vec_col, cand, threshold, pre_thr, id_dt
        )
    vecs = df.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_vv"),
    )
    joined = (
        cand.join(vecs.withColumnRenamed("_vid", "id_a"), "id_a")
        .withColumnsRenamed({"_vv": "_va"})
        .join(vecs.withColumnRenamed("_vid", "id_b"), "id_b")
        .select("id_a", "id_b", "_va", F.col("_vv").alias("_vb"))
    )

    def _fixed_matrix(col, n):
        """(n, L) float64 matrix when every row is a same-length, null-free
        list (the embedding fast path — numpy reshape of the flat values
        buffer, no per-row Python), else None."""
        import numpy as np
        import pyarrow.compute as pc

        col = col.combine_chunks() if not isinstance(col, pa.Array) else col
        if col.null_count:
            return None
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        if len(lens) == 0 or lens.min() != lens.max():
            return None
        flat = col.flatten()
        if flat.null_count:
            return None
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        return vals.reshape(n, int(lens[0]))

    def verify(batches):
        import numpy as np

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array([], type=batch.column(0).type),
                        pa.array([], type=batch.column(1).type),
                        pa.array([], type=pa.float64()),
                    ],
                    names=["id_a", "id_b", "_rawcos"],
                )
                continue
            A = _fixed_matrix(batch.column(2), n)
            B = _fixed_matrix(batch.column(3), n)
            if A is not None and B is not None and A.shape[1] == B.shape[1]:
                na = _np_seq_norms(A)
                nb = _np_seq_norms(B)
                denom = na * nb
                acc = np.zeros(n)
                for j in range(A.shape[1]):
                    acc = acc + A[:, j] * B[:, j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.where(
                        denom == 0.0, -1.0, acc / np.where(denom == 0.0, 1.0, denom)
                    )
                m = cos >= pre_thr
                keep_rows = np.nonzero(m)[0]
                coss = cos[m]
            else:
                # slow path: ragged/NULL-bearing batch — per-row grouping
                va = batch.column(2).to_pylist()
                vb = batch.column(3).to_pylist()
                keep_list, cos_list = [], []
                groups: dict = {}
                for i in range(n):
                    a, b = va[i], vb[i]
                    if a is None or b is None:
                        continue
                    groups.setdefault((len(a), len(b)), []).append(i)
                for (la, lb), idxs in groups.items():
                    Am = np.array([va[i] for i in idxs], dtype=np.float64).reshape(
                        len(idxs), la
                    )
                    Bm = np.array([vb[i] for i in idxs], dtype=np.float64).reshape(
                        len(idxs), lb
                    )
                    na = _np_seq_norms(Am)
                    nb = _np_seq_norms(Bm)
                    denom = na * nb
                    if la == lb:
                        acc = np.zeros(len(idxs))
                        for j in range(la):
                            acc = acc + Am[:, j] * Bm[:, j]
                        with np.errstate(divide="ignore", invalid="ignore"):
                            cos = np.where(
                                denom == 0.0,
                                -1.0,
                                acc / np.where(denom == 0.0, 1.0, denom),
                            )
                    else:
                        # zip_with null-pads → NULL dot; only the zero-norm
                        # guard can still emit (-1.0), as in the join form
                        cos = np.where(denom == 0.0, -1.0, np.nan)
                    m = cos >= pre_thr
                    keep_list.extend(idxs[i] for i in np.nonzero(m)[0])
                    cos_list.extend(cos[m])
                keep_rows = np.array(keep_list, dtype=np.int64)
                coss = np.array(cos_list, dtype=np.float64)
            take = pa.array(keep_rows.astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0).take(take),
                    batch.column(1).take(take),
                    pa.array(coss.astype(np.float64)),
                ],
                names=["id_a", "id_b", "_rawcos"],
            )

    scored = joined.mapInArrow(
        verify, f"id_a {id_dt}, id_b {id_dt}, _rawcos double"
    )
    return scored.select(
        "id_a", "id_b", F.round(F.col("_rawcos"), 6).alias("cos")
    ).where(F.col("cos") >= threshold)


def _lsh_verify_broadcast(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cand: DataFrame,
    threshold: float,
    pre_thr: float,
    id_dt: str,
) -> DataFrame:
    """Candidate verification against a BROADCAST vector table (see
    :func:`lsh_near_dup_pairs`): candidates stay (id_a, id_b) through the
    whole tail; both vectors are looked up in the broadcast per-length
    matrices and scored with the bit-exact sequential fold. Pairs whose
    side is missing/NULL drop (the join form's NULL cos); cross-length
    pairs survive only via the zero-norm −1.0 guard."""
    import numpy as np

    from .dedup import _supersede_broadcast

    spark = df.sparkSession
    side = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).where(F.col("_v").isNotNull())
    rows = side.collect()
    by_len: dict = {}
    for r in rows:
        v = r["_v"]
        by_len.setdefault(len(v), ([], []))
        ids, vecs = by_len[len(v)]
        ids.append(r["_id"])
        vecs.append(v)
    all_ids, all_norm, all_grp, all_row = [], [], [], []
    groups = {}
    for gi, (ln, (ids, vecs)) in enumerate(sorted(by_len.items())):
        mat = np.array(vecs, dtype=np.float64)
        if mat.ndim == 1:
            mat = mat.reshape(len(vecs), 0)
        groups[gi] = mat
        nrm = _np_seq_norms(mat)
        all_ids.extend(ids)
        all_norm.extend(nrm)
        all_grp.extend([gi] * len(ids))
        all_row.extend(range(len(ids)))
    all_ids = np.array(all_ids, dtype=np.int64)
    order = np.argsort(all_ids, kind="stable")
    lut = (
        all_ids[order],
        np.array(all_norm, dtype=np.float64)[order],
        np.array(all_grp, dtype=np.int64)[order],
        np.array(all_row, dtype=np.int64)[order],
        groups,
    )
    bc = _supersede_broadcast(spark, f"lsh_vecs:{id_col}", lut)

    def verify(batches):
        import pyarrow as pa

        s_ids, s_norm, s_grp, s_row, mats = bc.value

        def locate(ids):
            pos = np.searchsorted(s_ids, ids)
            pos = np.clip(pos, 0, len(s_ids) - 1)
            found = (len(s_ids) > 0) & (s_ids[pos] == ids)
            return pos, found

        for batch in batches:
            ia = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            ib = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(ia)
            if n == 0 or len(s_ids) == 0:
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(0).take(pa.array([], type=pa.int64())),
                        batch.column(1).take(pa.array([], type=pa.int64())),
                        pa.array([], type=pa.float64()),
                    ],
                    names=["id_a", "id_b", "_rawcos"],
                )
                continue
            pa_pos, fa = locate(ia)
            pb_pos, fb = locate(ib)
            ok = fa & fb
            cos = np.full(n, np.nan)
            ga, gb = s_grp[pa_pos], s_grp[pb_pos]
            na, nb = s_norm[pa_pos], s_norm[pb_pos]
            denom = na * nb
            same = ok & (ga == gb)
            for gi, mat in mats.items():
                sel = np.nonzero(same & (ga == gi))[0]
                if not len(sel):
                    continue
                A = mat[s_row[pa_pos[sel]]]
                B = mat[s_row[pb_pos[sel]]]
                acc = np.zeros(len(sel))
                for j in range(mat.shape[1]):
                    acc = acc + A[:, j] * B[:, j]
                d = denom[sel]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos[sel] = np.where(
                        d == 0.0, -1.0, acc / np.where(d == 0.0, 1.0, d)
                    )
            cross = ok & (ga != gb)
            cos[cross] = np.where(denom[cross] == 0.0, -1.0, np.nan)
            m = cos >= pre_thr
            take = pa.array(np.nonzero(m)[0].astype(np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0).take(take),
                    batch.column(1).take(take),
                    pa.array(cos[m].astype(np.float64)),
                ],
                names=["id_a", "id_b", "_rawcos"],
            )

    scored = cand.mapInArrow(verify, f"id_a {id_dt}, id_b {id_dt}, _rawcos double")
    return scored.select(
        "id_a", "id_b", F.round(F.col("_rawcos"), 6).alias("cos")
    ).where(F.col("cos") >= threshold)


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list,
    via: str = "join",
) -> DataFrame:
    """Nearest-centroid (cosine) assignment → ``(id_col, _cell)`` (0-based).

    ``via="literal"`` embeds the k×dim centroid matrix as ONE plan literal
    and argmaxes with higher-order functions — zero joins, but the literal
    size and the interpreted k×dim FLOPs/row scale with k: the small-k path
    (k ≲ 64). ``via="join"`` broadcasts a centroid TABLE and argmaxes with a
    ``max(struct)`` aggregate (map-side partial, no window sort) — the
    large-k path (the 10⁴–10⁵ cells a 100 TB IVF wants). Identical float
    folds and identical tie-break (lowest cell wins) ⇒ identical assignments
    (pytest-asserted at k=256). NULL vectors are dropped on BOTH paths (they
    have no nearest cell; without the filter the literal path would emit a
    NULL cell while the join path's max(struct) would fall through the NULL
    sim to cell 0 — mode-dependent results).
    """
    cents = [[float(x) for x in c] for c in centroids]
    vecs = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
        .select(id_col, "_v", norm(F.col("_v")).alias("_vn"))  # norm hoisted once
    )
    if via == "literal":
        cl = F.lit(cents)
        # zero-norm guard: a zero vector (or zero centroid) gets similarity
        # -1 instead of a divide-by-zero (ANSI mode aborts the job on x/0).
        # Centroid norms are precomputed driver-side (Python doubles fold in
        # the same IEEE order as the SQL aggregate — bit-identical) and
        # zipped in as a literal: norm(p) inside the lambda would re-run the
        # O(dim) fold per centroid per ROW, doubling the hot loop's FLOPs
        sims = F.zip_with(
            cl,
            F.lit(_norms_py(cents)),
            lambda p, pn: _safe_ratio(dot(F.col("_v"), p), F.col("_vn"), pn),
        )
        return vecs.select(
            F.col(id_col),
            (F.array_position(sims, F.array_max(sims)) - 1).cast("int").alias("_cell"),
        )
    cdf = df.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "_cell int, _cent array<double>"
    ).withColumn("_cn", norm(F.col("_cent")))
    scored = vecs.crossJoin(F.broadcast(cdf)).select(
        F.col(id_col),
        F.col("_cell"),
        _safe_ratio(dot(F.col("_v"), F.col("_cent")), F.col("_vn"), F.col("_cn")).alias("_sim"),
    )
    # argmax via max(struct(sim, -cell)): same (max sim, lowest cell) winner
    # as array_position-of-array_max on the literal path
    return (
        scored.groupBy(id_col)
        .agg(F.max(F.struct(F.col("_sim").alias("s"), (-F.col("_cell")).alias("nc"))).alias("_b"))
        .select(F.col(id_col), (-F.col("_b.nc")).cast("int").alias("_cell"))
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    iters: int = 5,
    assign: str = "auto",
) -> list:
    """Lloyd k-means centroids (cosine assignment, mean update) → a k×dim
    Python list for :func:`ivf_index`'s ``centroids`` parameter.

    Deterministic init: the k lowest-id vectors (same as the IVF default).
    Each iteration is one assignment pass + one per-(cell, dim) mean; only
    the k×dim centroid matrix ever reaches the driver. ``assign`` picks the
    :func:`assign_cells` strategy: ``"auto"`` uses the plan-literal argmax up
    to k=64 and the broadcast-join argmax beyond (the literal path's plan
    size and per-row FLOPs grow with k — see :func:`assign_cells`). Empty
    cells keep their previous centroid. float mean is aggregation-order
    sensitive at the ulp level — consumers must not rely on bit-exact
    centroids across cluster layouts (cell ASSIGNMENT ties are broken by
    cell index, which is stable).
    """
    mode = assign if assign != "auto" else ("literal" if k <= 64 else "join")
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    cents = [list(r["v"]) for r in init]
    vecs = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        )
        .select(id_col, "_v", norm(F.col("_v")).alias("_vn"))
    )
    for _ in range(iters):
        if mode == "literal":
            # single narrow pass, ZERO joins: assignment expression inline,
            # posexplode feeds the mean directly (the assign_cells+join-back
            # form would add a full-data shuffle per iteration)
            cl = F.lit(cents)
            sims = F.zip_with(
                cl,
                F.lit(_norms_py(cents)),
                lambda p, pn: _safe_ratio(dot(F.col("_v"), p), F.col("_vn"), pn),
            )
            cell = (F.array_position(sims, F.array_max(sims)) - 1).alias("_cell")
            exploded = vecs.select(cell, F.posexplode("_v").alias("_pos", "_x"))
        else:
            # large k: broadcast-join max(struct) argmax CARRYING the vector
            # (same aggregate as ivf_index) — one one-row-per-vector shuffle,
            # no re-attach join per iteration
            cdf = df.sparkSession.createDataFrame(
                [(i, c) for i, c in enumerate(cents)],
                "_cell int, _cent array<double>",
            ).withColumn("_centn", norm(F.col("_cent")))
            assigned = _argmax_carry(vecs, id_col, "_v", cdf, "_cell")
            exploded = assigned.select(
                "_cell", F.posexplode("_v").alias("_pos", "_x")
            )
        means = (
            exploded.groupBy("_cell", "_pos").agg(F.avg("_x").alias("_m")).collect()
        )
        new = [list(c) for c in cents]  # empty cells keep previous centroid
        for r in means:
            new[r["_cell"]][r["_pos"]] = r["_m"]
        cents = new
    return cents


def _argmax_carry(
    vecs: DataFrame, id_col: str, vec_col: str, cents: DataFrame, cell_col: str
) -> DataFrame:
    """Nearest-centroid argmax that CARRIES the vector through the aggregate
    → ``(cell_col, id_col, vec_col)``.

    ``vecs`` must have (id_col, vec_col, _vn) with norms pre-hoisted; ``cents``
    must have (cell_col, _cent, _centn). The broadcast cross join is narrow
    (no exchange), then ``max_by(struct(cell, vec), struct(sim, -cell))``
    argmaxes with a MAP-SIDE PARTIAL aggregate: the n_cells scored copies of
    each vector collapse to ONE row before the exchange, so the shuffle
    carries one row per vector — not n_cells vector copies through a
    ``row_number`` sort (the round-3 scale-killer: at the 10⁴–10⁵ cells a
    100 TB IVF wants that was a 10⁴×-data sort-shuffle). The ordering struct
    (sim, -cell) is unique per cell within an id group, so ``max_by`` is
    deterministic; tie-break identical to :func:`assign_cells`'s
    ``max(struct)``: highest sim, then lowest cell (max of -cell). An
    all-NULL-sim group (NULL vector) falls through to the lowest cell,
    matching the old window's NULLS LAST + asc(cell) ordering (the ordering
    struct itself is never NULL, so ``max_by`` skips no rows). Parity with
    the window form is pytest-asserted at n_cells ∈ {16, 256}.
    """
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col(cell_col),
        _safe_ratio(
            dot(F.col(vec_col), F.col("_cent")), F.col("_vn"), F.col("_centn")
        ).alias("_sim"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct(F.col(cell_col).alias("c"), F.col(vec_col).alias("v")),
                F.struct(
                    F.col("_sim").alias("s"), (-F.col(cell_col)).alias("nc")
                ),
            ).alias("_b")
        )
        .select(
            F.col("_b.c").cast("int").alias(cell_col),
            F.col(id_col),
            F.col("_b.v").alias(vec_col),
        )
    )


def ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    centroids: Optional[list] = None,
) -> DataFrame:
    """IVF (inverted-file) index: assign every vector to its nearest centroid
    cell → ``(cell, id, vec)``.

    Centroids are the ``n_cells`` lowest-id vectors (deterministic; swap in
    k-means centroids for production without changing the query path). The
    assignment is a broadcast cross join + ``max_by`` argmax aggregate
    (:func:`_argmax_carry`) — one scan, one one-row-per-vector shuffle, no
    window sort; the index is written bucketed by ``cell`` at scale so probes
    read only matching buckets.
    """
    cents_df = _cents_df(df, id_col, vec_col, n_cells, centroids)
    out = _assign_carry_vectorized(df, id_col, vec_col, cents_df, "cell")
    if out is not None:
        return out
    cents = cents_df.withColumn("_centn", norm(F.col("_cent")))
    # vector norms once per row; centroid norms once per centroid — each of
    # the n_cells assignment scores then costs a single dot fold
    vecs = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("_vn")
    )
    return _argmax_carry(vecs, id_col, vec_col, cents, "cell")


def _assign_carry_vectorized(
    df: DataFrame, id_col: str, vec_col: str, cents_df: DataFrame, cell_col: str
) -> Optional[DataFrame]:
    """Arrow/numpy rendition of :func:`_argmax_carry` → ``(cell, id, vec)``,
    bit-identical to the ``max_by(struct)`` form (r7): the tiny centroid
    table is collected and broadcast, and each task scores its batch with
    the sequential per-dimension IEEE fold (the established bit-exact
    replay of :func:`dot`/:func:`norm`), picking ``np.argmax`` per row —
    first-max ties == the JVM's (max sim, lowest cell), NaN sims win on
    both engines (Spark orders NaN above all doubles), and rows whose sims
    are all NULL in the JVM form (NULL vector, NULL element, length
    mismatch vs the centroid dim) fall to the lowest cell exactly like
    ``max_by`` over an all-NULL ordering field. Returns ``None`` (caller
    falls back to the JVM aggregate) for centroid tables the replay can't
    guarantee — NULL/ragged centroid vectors. Replaces 320k interpreted
    HOF folds at sf1.0 (~2.8 s → ~0.6 s for the index build).
    """
    import numpy as np
    import pyarrow as pa

    from .dedup import _supersede_broadcast

    spark = df.sparkSession
    rows = cents_df.collect()
    if not rows:
        return None
    cents = sorted(
        ((int(r["cell"]), r["_cent"]) for r in rows), key=lambda t: t[0]
    )
    vec_lists = [c for _, c in cents]
    if any(
        v is None or any(x is None for x in v) for v in vec_lists
    ) or len({len(v) for v in vec_lists}) != 1:
        return None
    cdim = len(vec_lists[0])
    cmat = np.array([[float(x) for x in v] for v in vec_lists], dtype=np.float64)
    cell_ids = np.array([c for c, _ in cents], dtype=np.int64)
    cn = _np_seq_norms(cmat)
    bc = _supersede_broadcast(spark, f"ivf_cents:{id_col}", (cell_ids, cmat, cn))
    id_dt = df.schema[id_col].dataType.simpleString()
    vec_dt = df.schema[vec_col].dataType.simpleString()

    def assign(batches):
        cells_b, C, cnorm = bc.value
        low = int(cells_b[0])
        for batch in batches:
            ids = batch.column(0)
            vecs = batch.column(1)
            n = len(ids)
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([], type=pa.int32()), ids, vecs],
                    names=[cell_col, "_id", "_vec"],
                )
                continue
            vecs_c = (
                vecs.combine_chunks() if isinstance(vecs, pa.ChunkedArray) else vecs
            )
            pyv = vecs_c.to_pylist()
            out_cells = np.full(n, low, dtype=np.int64)
            ok = np.array(
                [
                    v is not None and len(v) == C.shape[1] and not any(
                        x is None for x in v
                    )
                    for v in pyv
                ],
                dtype=bool,
            )
            if ok.any():
                V = np.array([pyv[i] for i in np.nonzero(ok)[0]], dtype=np.float64)
                vn = _np_seq_norms(V)
                acc = np.zeros((V.shape[0], C.shape[0]))
                for j in range(C.shape[1]):
                    acc = acc + V[:, j][:, None] * C[:, j][None, :]
                denom = vn[:, None] * cnorm[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(
                        denom == 0.0, -1.0, acc / np.where(denom == 0.0, 1.0, denom)
                    )
                out_cells[np.nonzero(ok)[0]] = cells_b[np.argmax(sims, axis=1)]
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_cells.astype(np.int32)), ids, vecs_c],
                names=[cell_col, "_id", "_vec"],
            )

    n_parts = max(spark.sparkContext.defaultParallelism, 1)
    staged = df.repartition(n_parts).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    )
    out = staged.mapInArrow(
        assign, f"{cell_col} int, _id {id_dt}, _vec {vec_dt}"
    )
    return out.select(
        F.col(cell_col),
        F.col("_id").alias(id_col),
        F.col("_vec").alias(vec_col),
    )


def _cents_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    centroids: Optional[list],
) -> DataFrame:
    """Centroid table ``(cell, _cent)``: explicit centroids (e.g. from
    :func:`kmeans_centroids`) when given, else the deterministic
    k-lowest-id-vector default."""
    if centroids is not None:
        return df.sparkSession.createDataFrame(
            [(i + 1, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, _cent array<double>",
        )
    return (
        df.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("cell"),
            F.col(vec_col).alias("_cent"),
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: Optional[list] = None,
) -> DataFrame:
    """IVF-probed ANN top-k: search only the ``n_probe`` cells whose
    centroids are nearest each query → ``(query_id, neighbor_id, rank, cos)``.

    With ``n_probe == n_cells`` this is exhaustive and equals
    :func:`cosine_topk` exactly (tested); smaller probes trade recall for a
    ``n_probe/n_cells`` fraction of the scan — the 100 TB path where cells
    are storage buckets and unprobed buckets are never read.
    """
    index = ivf_index(df, id_col, vec_col, n_cells, centroids).withColumn(
        "_in", norm(F.col(vec_col))
    )
    cents = _cents_df(df, id_col, vec_col, n_cells, centroids)
    q = df.where(F.col(id_col).isin(*list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "_qv", "_qn", "cell", cosine(F.col("_qv"), F.col("_cent")).alias("_sim"))
        .withColumn("_rk", F.row_number().over(wq))
        .where(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "_qn", "cell")
    )
    scored = (
        probes.join(index, "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                _safe_ratio(dot(F.col("_qv"), F.col(vec_col)), F.col("_qn"), F.col("_in")), 6
            ).alias("cos"),
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


def write_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_cells: int = 16,
    centroids: Optional[list] = None,
) -> None:
    """Materialize the IVF index to storage, PARTITIONED BY CELL — the 100 TB
    layout where a probe-limited query physically reads only the probed cell
    directories (parquet partition pruning; unprobed cells are never opened).

    The centroid table is co-written under ``_centroids/`` (the leading
    underscore hides it from the index scan, like ``_SUCCESS``), so a reader
    needs only the path. An ``_ids/`` sidecar — the id→cell map WITHOUT the
    vectors — is co-written too, so :func:`ivf_topk_stored` can locate
    query-by-id vectors through the tiny sidecar plus the queries' own cell
    partitions instead of one full-index scan (sidecar size is ids+cells
    only: at 10⁹ vectors ~12 GB vs the multi-TB vector data).
    """
    cents = _cents_df(df, id_col, vec_col, n_cells, centroids)
    ivf_index(df, id_col, vec_col, n_cells, centroids).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")
    # project the sidecar from the WRITTEN index (columnar read of two thin
    # columns) rather than recomputing the assignment
    spark = df.sparkSession
    spark.read.parquet(path).select(F.col(id_col), F.col("cell")).write.mode(
        "overwrite"
    ).parquet(f"{path}/_ids")


def _stored_query_lookup(
    spark, path: str, id_col: str, vec_col: str, query_ids: Sequence[int]
) -> DataFrame:
    """Resolve query vectors BY ID from a stored IVF index through the
    ``_ids/`` sidecar → ``(query_id, _qv, _qn)``.

    The sidecar pins each query id's cell with a cheap two-thin-columns scan;
    the ≤Q (id, cell) rows are collected and the cells re-issued as a literal
    ``IN`` on the index's partition column, so the vector lookup physically
    reads ONLY the queries' home-cell directories (pytest-asserted via
    ``input_file_name``) — round 3 scanned the full index here.
    """
    qids = list(query_ids)
    if not qids:
        raise ValueError("query_ids must be non-empty")
    home = (
        spark.read.parquet(f"{path}/_ids")
        .where(F.col(id_col).isin(*qids))
        .collect()
    )
    if len(home) < len(set(qids)):
        missing = sorted(set(qids) - {r[id_col] for r in home})
        raise KeyError(
            f"query ids not present in stored index {path!r}: {missing}"
        )
    home_cells = sorted({r["cell"] for r in home})
    index = spark.read.parquet(path)
    return index.where(
        F.col("cell").isin(home_cells) & F.col(id_col).isin(*qids)
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )


def ivf_topk_stored(
    spark,
    path: str,
    id_col: str,
    vec_col: str,
    query_ids: Sequence[int],
    k: int = 5,
    n_probe: int = 4,
    query_vectors: Optional[list] = None,
) -> DataFrame:
    """ANN top-k over a STORED IVF index (see :func:`write_ivf_index`):
    resolve each query's ``n_probe`` nearest cells against the co-stored
    centroids, then scan ONLY those cell partitions → ``(query_id,
    neighbor_id, rank, cos)``. Matches :func:`ivf_topk` exactly for the same
    centroid layout (pytest-asserted, including the pruned-scan plan).

    The tiny probe table (≤ ``len(query_ids) × n_probe`` rows) is collected
    ONCE and re-issued as a local DataFrame — both to turn the probed cells
    into a literal ``IN`` predicate (storage-level partition pruning) and so
    the probe subplan is never evaluated twice. Pass ``query_vectors`` as
    ``[(id, [floats...]), ...]`` when the queries are held externally (the
    production shape); without it the query vectors are resolved through the
    ``_ids/`` sidecar (id→cell, co-written by :func:`write_ivf_index`): the
    sidecar pins each query's cell, so the vector lookup reads ONLY the
    queries' own cell partitions — both scans are pruned, never a full-index
    read.
    """
    index = spark.read.parquet(path)
    cents = spark.read.parquet(f"{path}/_centroids")
    if query_vectors is not None:
        q = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in query_vectors],
            "query_id long, _qv array<double>",
        ).select("query_id", "_qv", norm(F.col("_qv")).alias("_qn"))
    else:
        q = _stored_query_lookup(spark, path, id_col, vec_col, query_ids)
    wq = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cell"))
    probes_plan = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select(
            "query_id", "_qv", "_qn", "cell",
            cosine(F.col("_qv"), F.col("_cent")).alias("_sim"),
        )
        .withColumn("_rk", F.row_number().over(wq))
        .where(F.col("_rk") <= n_probe)
        .select("query_id", "_qv", "_qn", "cell")
    )
    probe_rows = probes_plan.collect()  # tiny; evaluated exactly once
    probes = spark.createDataFrame(probe_rows, probes_plan.schema)
    cells = sorted({r["cell"] for r in probe_rows})
    pruned = index.where(F.col("cell").isin(cells)).withColumn(
        "_in", norm(F.col(vec_col))
    )
    scored = (
        F.broadcast(probes)
        .join(pruned, "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                _safe_ratio(dot(F.col("_qv"), F.col(vec_col)), F.col("_qn"), F.col("_in")), 6
            ).alias("cos"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _plane_sign(p: int, j: int, seed: int) -> float:
    """±1 for plane p, component j — md5-derived: deterministic across runs,
    processes, and engines; no RNG state."""
    import hashlib

    h = hashlib.md5(f"{p}:{j}:{seed}".encode()).hexdigest()
    return 1.0 if int(h, 16) % 2 == 0 else -1.0


def sign_lsh_bucket_vectorized(dim: int, planes: int, seed: int = 42):
    """Arrow-vectorized signature: a pandas UDF computing all ``planes`` sign
    bits with ONE numpy matmul per batch.

    The expression form (:func:`sign_lsh_bucket`) evaluates the per-plane
    dot products through interpreted higher-order functions — measured
    ~2.7 ms/row at 192 planes × 64 dims, which made signatures dominate the
    near-dup pipeline. The matmul form is the mandate's sanctioned fast path
    (Arrow batch transfer, no per-row Python): (batch × dim) @ (dim × planes)
    runs in microseconds per row. Same md5-derived plane matrix → same
    signatures (up to float-summation order on exact-zero dots, which the
    exact-cosine verification step is insensitive to).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mat = np.array(
        [[_plane_sign(p, j, seed) for j in range(dim)] for p in range(planes)]
    ).T  # (dim, planes)

    # NOTE: hints given positionally (pd.Series -> pd.Series is implied by
    # SCALAR eval); string annotations would not resolve under
    # `from __future__ import annotations` with locally-imported pandas
    def _sig(col):
        # NULL vectors get a NULL signature (np.stack over a None element
        # would crash the whole batch): NULL band keys never equi-join, so
        # null-vector rows produce no candidates — matching the exact path,
        # where a null dot → null cos is dropped by the threshold filter.
        valid = col.notna()
        out = pd.Series([None] * len(col), dtype="object")
        if valid.any():
            arr = np.stack(col[valid].to_numpy()).astype("float64")  # (n, dim)
            bits = (arr @ mat) >= 0.0  # (n, planes)
            chars = np.where(bits, "1", "0")
            out[valid.to_numpy()] = ["".join(row) for row in chars]
        return out

    _sig.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "string")


def sign_lsh_bucket(vec: Column, dim: int, planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (string of sign bits).

    The ±1 plane matrix is a single ``array<array<double>>`` literal
    (planes × dim doubles — 64 KiB at 128×64, shipped once inside the plan)
    and the signature is one higher-order ``transform`` over it. The earlier
    per-plane expression-tree construction (planes × dim ``when`` nodes) made
    Catalyst optimization time explode: ~90 s of planning at 128 planes
    regardless of data size; this form plans in milliseconds and evaluates
    the same planes × dim FLOPs per row inside codegen.
    """
    mat = [[_plane_sign(p, j, seed) for j in range(dim)] for p in range(planes)]
    bits = F.transform(
        F.lit(mat),
        lambda pl: F.when(dot(vec, pl) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")


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
