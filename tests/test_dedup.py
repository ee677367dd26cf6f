"""Dedup operator tests with engineered near-duplicates."""

import pytest
from pyspark.sql import functions as F

from boon_spark.operators.dedup import (embedding_near_dups,
                                        exact_duplicates, minhash_lsh_pairs,
                                        minhash_signature, ngram_jaccard_pairs,
                                        simhash_near_dups, word_shingles)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun")
NEAR = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the evening sun")
OTHER = ("completely different text about spark distributed computing "
         "shuffle partitions and catalyst optimizer internals at scale")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", BASE), ("d2", NEAR), ("d3", OTHER),
        ("d4", "  The  QUICK brown fox jumps over the lazy dog while the "
               "cat watches from the warm windowsill in the afternoon sun "),
        ("d5", "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_duplicates_normalized(spark, docs):
    groups = exact_duplicates(docs).collect()
    # d4 is d1 modulo case/whitespace
    assert len(groups) == 1
    g = groups[0]
    assert g.n_docs == 2 and sorted(g.doc_ids) == ["d1", "d4"]


def test_word_shingles_deterministic(spark, docs):
    sh = docs.filter("doc_id = 'd5'").select(
        word_shingles(F.col("text"), 2).alias("s")).collect()[0].s
    assert sh == ["unrelated short", "short text"]


def test_minhash_lsh_finds_near_dup(spark, docs):
    pairs = minhash_lsh_pairs(docs, num_hashes=16, bands=8,
                              jaccard_threshold=0.4).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert ("d1", "d2") in found        # one-word edit
    assert ("d1", "d4") in found        # exact after normalization
    assert all("d3" not in p and "d5" not in p for p in found)


def test_minhash_signature_stable(spark, docs):
    s1 = docs.select(minhash_signature(
        word_shingles(F.col("text")), 8).alias("sig")).collect()
    s2 = docs.select(minhash_signature(
        word_shingles(F.col("text")), 8).alias("sig")).collect()
    assert [r.sig for r in s1] == [r.sig for r in s2]


def test_ngram_jaccard_within_block(spark, docs):
    blocked = docs.withColumn("blk", F.lit("one"))
    pairs = ngram_jaccard_pairs(blocked, group_col="blk",
                                threshold=0.5).collect()
    found = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert found[("d1", "d4")] == 1.0
    assert 0.5 <= found[("d1", "d2")] < 1.0


def test_simhash_near_dups(spark, docs):
    pairs = simhash_near_dups(docs, max_hamming=8).collect()
    found = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert found[("d1", "d4")] == 0
    assert ("d1", "d2") in found
    assert ("d1", "d3") not in found and ("d2", "d3") not in found


def test_embedding_near_dups(spark):
    import random
    rnd = random.Random(7)
    base = [rnd.uniform(-1, 1) for _ in range(16)]
    near = list(base)
    near[0] += 0.01
    far = [rnd.uniform(-1, 1) for _ in range(16)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)],
        "vec_id int, embedding array<float>")
    pairs = embedding_near_dups(df, dim=16, threshold=0.99,
                                bits=8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found


def test_lsh_topk_recall_vs_exact(spark):
    """The approximate (LSH-bucketed) ANN must recover a decent fraction
    of the exact top-k — the scale-path quality contract."""
    from pyspark.sql import functions as F

    from boon_spark.operators.similarity import cosine_topk, lsh_bucket_topk

    emb = spark.range(400).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(16)),
                    lambda i: ((F.pmod(F.xxhash64(F.col("id"), i),
                                       F.lit(1000)) / 500.0) - 1.0)
                    .cast("float")).alias("embedding"))
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in
             cosine_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              lsh_bucket_topk(emb, queries, k=5, dim=16, bits=4).collect()}
    recall = len(exact & approx) / len(exact)
    # 4-bit buckets on 400 random vectors: expect moderate recall, and
    # the approximate result must be a plausible subset, not garbage
    assert recall >= 0.25, f"recall {recall:.2f} too low"
    assert all(q < 10 for q, _ in approx)
