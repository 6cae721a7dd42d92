"""Round-7 optimization regression tests: every operator whose internals
changed for performance is pinned bit-for-bit against its round-6 form (or a
ground-truth equivalent) on adversarial fixtures."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from jsonschema_go_spark.operators import similarity as sim


def _legacy_sampled_pairs(df, id_col, vec_col, threshold, sample_mod):
    """The round-6 form of the sampled audit: cartesian of the sample with
    the interpreted zip_with+aggregate fold — the ground truth the
    vectorized path must reproduce bit-for-bit."""
    base = df.where(F.col(id_col) % sample_mod == 0)
    a = base.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        sim.norm(F.col(vec_col)).alias("_na"),
    )
    b = base.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        sim.norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                sim._safe_ratio(
                    sim.dot(F.col("_va"), F.col("_vb")), F.col("_na"), F.col("_nb")
                ),
                6,
            ).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def _pairs_bits(df):
    return {
        (r["id_a"], r["id_b"]): struct.pack("<d", r["cos"]) for r in df.collect()
    }


def test_vectorized_neardup_bitexact_on_real_data(spark):
    """sf0.001 embeddings, two thresholds: the vectorized sampled path must
    emit the identical pair set with bit-identical rounded cosines."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for thr in (0.3, 0.0):
        old = _pairs_bits(_legacy_sampled_pairs(df, "vec_id", "embedding", thr, 4))
        new = _pairs_bits(
            sim.embedding_near_dup_pairs(
                df, "vec_id", "embedding", threshold=thr, sample_mod=4
            )
        )
        assert old == new


@pytest.mark.parametrize("thr", [0.0, 0.9, -1.0, -2.0])
def test_vectorized_neardup_bitexact_adversarial(spark, thr):
    """Adversarial vector shapes: NULL vector, NULL element (NaN norm),
    all-zero vector (zero-norm guard), ragged lengths (cross-length pairs
    only survive via the zero-norm guard), empty vectors."""
    rows = [
        (0, [1.0] * 8),
        (4, [1.0] * 8),
        (8, None),
        (12, [0.0] * 8),
        (16, [1.0, None] + [2.0] * 6),
        (20, [1.0] * 4),
        (24, [1.0] * 4),
        (28, []),
        (32, []),
        (3, [9.9] * 8),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    old = _pairs_bits(_legacy_sampled_pairs(df, "vec_id", "embedding", thr, 4))
    new = _pairs_bits(
        sim.embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=thr, sample_mod=4
        )
    )
    assert old == new


def test_minhash_arrow_bitexact_vs_agg_form(spark):
    """The r7 Arrow/dictionary minhash signatures must equal the round-6
    explode + k×min(md5) aggregation bit-for-bit — real data + adversarial
    fixtures (unicode text incl. NBSP/tab whitespace, short docs, empty
    text, NULL text, duplicate shingles)."""
    from jsonschema_go_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    old = dd._minhash_table_agg(docs, "doc_id", "text", 12, 3)
    new = dd.minhash_table(docs, "doc_id", "text", 12, 3)
    assert old.exceptAll(new).count() == 0 and new.exceptAll(old).count() == 0

    rows = [
        (1, "a b c d e f"),
        (2, None),
        (3, "x y"),
        (4, "Héllo wörld naïve test case"),
        (5, ""),
        (6, "a b c d e f"),
        (7, "a b c d e"),          # NBSP is NOT \s in Java — stays in-word
        (8, "tab\tsep\twords here now"),  # tabs ARE \s — normalized to spaces
        (9, "dup dup dup dup dup"),
        (10, "  leading and trailing  "),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    old = dd._minhash_table_agg(df, "doc_id", "text", 12, 3)
    new = dd.minhash_table(df, "doc_id", "text", 12, 3)
    assert old.exceptAll(new).count() == 0 and new.exceptAll(old).count() == 0
    assert old.schema.simpleString() == new.schema.simpleString()


def test_simhash_pairs_bitcount_matches_digit_form(spark):
    """bit_count(xor) hamming == the round-6 digit-wise popcount sum, on the
    full sf0.01 corpus at max_hamming 3 AND a loose 12 (so nontrivial
    hamming values are compared, not just near-zero ones)."""
    from pyspark.sql import functions as F

    from jsonschema_go_spark.operators import dedup as dd

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = docs.where(F.col("doc_id") % 7 == 0).select("doc_id", "text")
    dups = base.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    corpus = base.unionByName(dups)

    def digit_form(max_hamming):
        sig = dd.simhash64(corpus, "doc_id", "text")
        chunks = sig.select(
            F.col("doc_id"), F.col("simhash_hex"),
            F.explode(F.array(*[
                F.struct(F.lit(i).alias("chunk_idx"),
                         F.substring("simhash_hex", i * 4 + 1, 4).alias("chunk"))
                for i in range(4)
            ])).alias("c"),
        ).select("doc_id", "simhash_hex", F.col("c.chunk_idx"), F.col("c.chunk"))
        a = chunks.select(F.col("doc_id").alias("id_a"), F.col("simhash_hex").alias("sig_a"), "chunk_idx", "chunk")
        b = chunks.select(F.col("doc_id").alias("id_b"), F.col("simhash_hex").alias("sig_b"), "chunk_idx", "chunk")
        cand = (
            a.join(b, ["chunk_idx", "chunk"]).where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sig_a", "sig_b").distinct()
        )
        ham = None
        for pos in range(16):
            da = dd._hex_digit_val(F.col("sig_a"), pos)
            db = dd._hex_digit_val(F.col("sig_b"), pos)
            for shift in (8, 4, 2, 1):
                term = ((F.floor(da / shift) % 2) != (F.floor(db / shift) % 2)).cast("int")
                ham = term if ham is None else (ham + term)
        return (cand.withColumn("hamming", ham)
                .where(F.col("hamming") <= max_hamming)
                .select("id_a", "id_b", "hamming"))

    for mh in (3, 12):
        old = sorted(tuple(r) for r in digit_form(mh).collect())
        new = sorted(
            tuple(r) for r in dd.simhash_near_pairs(corpus, "doc_id", "text", mh).collect()
        )
        assert old == new


def test_vectorized_neardup_preserves_id_dtype(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 4), (4, [1.0] * 4)], "vec_id int, embedding array<double>"
    )
    out = sim.embedding_near_dup_pairs(
        df, "vec_id", "embedding", threshold=0.9, sample_mod=4
    )
    assert out.schema.simpleString() == "struct<id_a:int,id_b:int,cos:double>"
    dfl = spark.createDataFrame(
        [(0, [1.0] * 4), (4, [1.0] * 4)], "vec_id long, embedding array<double>"
    )
    outl = sim.embedding_near_dup_pairs(
        dfl, "vec_id", "embedding", threshold=0.9, sample_mod=4
    )
    assert outl.schema.simpleString() == "struct<id_a:bigint,id_b:bigint,cos:double>"
