"""Streaming decontamination — incoming documents checked against a
STATIC benchmark table, statelessly.

Containment is a per-document property (``|doc ∩ bench| / |bench|``), so
unlike near-dup detection it needs NO cross-batch state: the benchmark
is small by contract (that is what makes it a benchmark), its shingle
index fits on every executor, and each arriving document is scored in a
single Arrow-batched map.

Pipeline per micro-batch:

1. the stream projects each doc to its shingle HASH array with the SAME
   Spark expressions as the batch operator (``word_shingles`` +
   ``_hash_shingle[_fast]`` — computed JVM-side, so Python never
   re-implements shingling and the two paths cannot drift);
2. a driver-built ``{shingle_hash: [benchmark ids]}`` index (plus
   per-benchmark shingle counts) rides a Spark broadcast variable into a
   ``mapInPandas`` scorer that counts distinct shared hashes per
   benchmark doc and emits rows reaching the threshold.

State: zero.  Shuffle: zero (pure map stage).  The index costs
``O(benchmark shingles)`` memory per executor — the same small-side
contract as the batch collision index's broadcast.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = ("doc_id string, benchmark_id string, shared long, "
                 "bench_size long, overlap double")


def _hash_expr(hash_family: str):
    from ..operators.dedup import _min_hasher
    return _min_hasher(0, hash_family == "xxhash64")


def build_benchmark_index(benchmark: DataFrame, *, text_col: str = "text",
                          id_col: str = "doc_id", shingle_n: int = 3,
                          hash_family: str = "xxhash64",
                          max_df: int | None = None
                          ) -> tuple[dict, dict, set]:
    """Driver-side ``(hash → [benchmark ids], id → shingle count,
    hot hashes)`` index from the same Spark-side shingle/hash
    expressions the batch operator uses.

    ``max_df`` marks shingles shared by more than that many BENCHMARK
    docs as HOT (benchmark-internal boilerplate).  Hot hashes gate
    CANDIDACY only — the overlap count and the per-doc sizes both use
    the full sets, mirroring the batch operator where ``max_df`` prunes
    candidate generation but the verify runs on exact full shingle sets
    (dropping hot hashes from the numerator while the denominator keeps
    them would systematically under-report overlap — a silent
    decontamination false negative)."""
    from ..operators.dedup import _shingle_base

    sh = _shingle_base(benchmark, text_col=text_col, id_col=id_col,
                       shingle_n=shingle_n)
    hasher = _hash_expr(hash_family)
    rows = (sh.select(F.col("_id").cast("string").alias("_id"),
                      F.transform("_sh", hasher).alias("_hs"))
            .collect())
    # duplicate benchmark doc_ids (un-deduped eval dumps) UNION their
    # shingle sets — appending per row would double-count shared hashes
    # in the scorer and report overlap > 1.0
    by_id: dict[str, set] = {}
    for r in rows:
        by_id.setdefault(r._id, set()).update(r._hs)
    index: dict[int, list] = {}
    sizes: dict[str, int] = {}
    for bid, hs in by_id.items():
        sizes[bid] = len(hs)
        for h in hs:
            index.setdefault(h, []).append(bid)
    hot = set() if max_df is None else \
        {h for h, ids in index.items() if len(ids) > max_df}
    return index, sizes, hot


def contamination_stream(stream_df: DataFrame, benchmark: DataFrame, *,
                         text_col: str = "text", id_col: str = "doc_id",
                         shingle_n: int = 3, threshold: float = 0.5,
                         hash_family: str = "xxhash64",
                         max_df: int | None = None) -> DataFrame:
    """Flag streaming documents whose shingle containment of any
    benchmark document reaches ``threshold``.  Returns a STREAMING
    DataFrame of ``(doc_id, benchmark_id, shared, bench_size, overlap)``
    rows — stateless, so any output mode/trigger works."""
    from ..operators.dedup import word_shingles

    index, sizes, hot = build_benchmark_index(
        benchmark, text_col=text_col, id_col=id_col, shingle_n=shingle_n,
        hash_family=hash_family, max_df=max_df)
    spark = stream_df.sparkSession
    b_index = spark.sparkContext.broadcast((index, sizes, hot, threshold))

    hasher = _hash_expr(hash_family)
    projected = stream_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.transform(word_shingles(F.col(text_col), shingle_n),
                    hasher).alias("_hs"))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx, szs, hot_hs, thr = b_index.value
        for pdf in batches:
            out = []
            for doc_id, hs in zip(pdf["doc_id"], pdf["_hs"]):
                if hs is None:
                    continue
                shared: dict[str, int] = {}
                cand: set[str] = set()
                for h in set(hs):
                    for bid in idx.get(h, ()):
                        shared[bid] = shared.get(bid, 0) + 1
                        if h not in hot_hs:
                            cand.add(bid)
                # hot (boilerplate) hashes never CREATE a candidate,
                # but a candidate's overlap counts its full shared set
                for bid in cand:
                    n, size = shared[bid], szs[bid]
                    if size and n / size >= thr:
                        out.append({"doc_id": doc_id,
                                    "benchmark_id": bid,
                                    "shared": n, "bench_size": size,
                                    "overlap": n / size})
            yield pd.DataFrame(
                out, columns=["doc_id", "benchmark_id", "shared",
                              "bench_size", "overlap"])

    return projected.mapInPandas(score, OUTPUT_SCHEMA)
