"""Similarity search over embedding columns (``array<float>``).

boon has no similarity ops (SURVEY.md §2.9) — this is part of the
training-data-pipeline extension mandated by the build brief.

Scale design for ``cosine_topk`` (brute force, the exact baseline):

1. queries are **broadcast** (small side) and cross-joined against the
   corpus — a narrow, shuffle-free stage;
2. cosine is computed with built-in higher-order functions
   (``zip_with`` + ``aggregate``) — JVM-side, no Python;
3. **partial top-k per corpus partition**: group by
   ``(spark_partition_id, query)`` — each group is map-local, so the
   partial ``collect_list`` combines map-side and the shuffle carries only
   ``P × Q`` rows of ≤k candidates, never the exploded corpus;
4. final global top-k over that tiny table.

At 1000 executors × 100 TB this shuffles megabytes, not the cross
product.  ``lsh_bucket_topk`` is the approximate scale path: deterministic
random-hyperplane signatures bucket the corpus so each query only scans
its bucket (plus multi-probe neighbors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, *, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True, sub_buckets: int = 16,
                max_queries_per_pass: int = 256) -> DataFrame:
    """Exact top-k neighbors by cosine for each query row.

    Returns ``(query_id, neighbor_id, rank)`` with rank 1..k, ties broken
    by ascending neighbor id (deterministic).

    Memory bounds (round-3 hardening):

    - rows whose cosine is NULL (null / ragged corpus or query embeddings)
      are filtered *before* the partial top-k — previously they sorted
      first on the negated-cosine key and evicted real neighbors map-side;
    - the partial-agg group key is ``(_pid, query_id, _sub)`` where
      ``_sub = pmod(xxhash64(neighbor_id), sub_buckets)``: with
      Q × sub_buckets groups per partition the ObjectHashAggregate
      sort-based fallback (threshold 128 distinct keys) engages and
      processes groups one at a time off a spillable sort, so the resident
      ``collect_list`` buffer is one group ≈ partition_rows / sub_buckets
      — never the whole partition × Q;
    - ``max_queries_per_pass`` chunks the broadcast query set, bounding
      both the broadcast size and the per-partition group count; chunks
      union after the per-chunk partial top-k (each chunk's candidate set
      is already ≤ P × Q_chunk × sub_buckets × k rows).

    The shuffle still carries only candidate lists, never the corpus×Q
    cross product.
    """
    q_all = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"))

    n_q = q_all.count()
    if n_q > max_queries_per_pass:
        # deterministic chunking on the query id hash — each pass
        # broadcasts ≤ max_queries_per_pass queries
        n_chunks = -(-n_q // max_queries_per_pass)
        chunk_col = F.pmod(F.xxhash64(F.col("query_id")), F.lit(n_chunks))
        chunks = [q_all.filter(chunk_col == i) for i in range(n_chunks)]
    else:
        chunks = [q_all]

    cands = []
    for q in chunks:
        joined = c.crossJoin(F.broadcast(q))
        if exclude_self:
            joined = joined.filter(F.col("neighbor_id") != F.col("query_id"))
        scored = (joined
                  .select("query_id", "neighbor_id",
                          cosine(F.col("_cv"), F.col("_qv")).alias("cos"))
                  .filter(F.col("cos").isNotNull()))

        # partial top-k per corpus partition: the group key includes the
        # physical partition id, so partial aggregation completes map-side
        # and the shuffle carries only (P × Q × sub_buckets) candidate
        # lists of ≤ k entries
        partial = (scored
                   .withColumn("_pid", F.spark_partition_id())
                   .withColumn("_sub", F.pmod(
                       F.xxhash64(F.col("neighbor_id")),
                       F.lit(max(1, sub_buckets))))
                   .groupBy("_pid", "query_id", "_sub")
                   .agg(F.slice(
                       F.sort_array(
                           F.collect_list(F.struct(
                               # negate the COSINE (always numeric) so one
                               # ascending sort yields (cos desc, id asc) —
                               # negating the id would NULL out non-numeric
                               # id columns (string doc_ids) via the cast
                               (-F.col("cos")).alias("_nc"),
                               F.col("neighbor_id").alias("_nid")))),
                       1, k).alias("_top")))
        cands.append(partial.select("query_id", F.explode("_top").alias("t"))
                     .select("query_id", (-F.col("t._nc")).alias("cos"),
                             F.col("t._nid").alias("neighbor_id")))

    cand = cands[0]
    for extra in cands[1:]:
        cand = cand.unionByName(extra)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (cand
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


# ---------------------------------------------------------------------------
# LSH-bucketed approximate variant (scale path)
# ---------------------------------------------------------------------------

def _hyperplane(dim: int, bit: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: values derived from
    a splitmix-style integer mix of (bit, coordinate, seed) — identical on
    every executor, no RNG state."""
    out = []
    for j in range(dim):
        x = (bit * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9
             + seed * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        out.append((x / 2**64) * 2.0 - 1.0)
    return out


def simhash_signature(vec: Column, dim: int, *, bits: int = 16,
                      seed: int = 42) -> Column:
    """Random-hyperplane (SimHash) signature of an embedding as an int —
    pure Column expressions, JVM-side."""
    bit_cols = []
    for b in range(bits):
        plane = _hyperplane(dim, b, seed)
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bit_cols.append(F.when(proj >= 0, F.lit(1 << b)).otherwise(F.lit(0)))
    sig = bit_cols[0]
    for c in bit_cols[1:]:
        sig = sig + c
    return sig.cast("long")


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, *, k: int,
                    dim: int, id_col: str = "vec_id",
                    vec_col: str = "embedding", bits: int = 8,
                    seed: int = 42, multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by SimHash signature,
    join on the bucket, rank within.  Recall < 1.0 by construction; the
    bucket join replaces the cross product — at scale this is a standard
    shuffled equi-join on the signature (bounded fan-out).

    ``multiprobe`` explodes each QUERY into its bucket plus all 1-bit-
    flipped neighbor buckets (bits+1 probes) — the classic recall lever
    that costs query-side fan-out (small side) instead of corpus passes.
    """
    sig_c = simhash_signature(F.col(vec_col), dim, bits=bits, seed=seed)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_cv"), sig_c.alias("_sig"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"), sig_c.alias("_sig0"))
    if multiprobe:
        probes = F.array(F.col("_sig0"), *[
            F.col("_sig0").bitwiseXOR(F.lit(1 << b)) for b in range(bits)])
        q = q.select("query_id", "_qv",
                     F.explode(probes).alias("_sig"))
    else:
        q = q.withColumnRenamed("_sig0", "_sig")
    joined = (c.join(F.broadcast(q), on="_sig")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .dropDuplicates(["query_id", "neighbor_id"]))
    scored = (joined
              .select("query_id", "neighbor_id",
                      cosine(F.col("_cv"), F.col("_qv")).alias("cos"))
              # null cosines (null/ragged embeddings) are never neighbors
              .filter(F.col("cos").isNotNull()))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
