"""Streaming lexical relevance — incoming documents scored against a
BM25 model FITTED on a static corpus snapshot, statelessly.

The BM25 score of a document needs only corpus-level constants (per-term
quantized idf, average document length) plus the document itself, so —
like :mod:`.contamination_stream` — routing a live ingest by keyword
relevance needs NO cross-batch state: fit the model off a batch corpus
with :func:`fit_bm25_model` (the same integer pipeline as
``operators.search.bm25_topk`` — the idf/avgdl/posting definitions are
byte-shared, not re-implemented), broadcast it, and score each arriving
document in one Arrow-batched map.

Pipeline per micro-batch:

1. the stream projects each doc to ``(id, dl, tokens)`` with the SAME
   Spark expressions as the batch operator (:func:`..operators.search.
   doc_tokens` / ``doc_len`` — tokenization never re-implemented in
   Python);
2. a ``mapInPandas`` scorer walks the (tiny) model term table and emits
   ``(doc_id, query_id, score_int)`` per query whose score reaches
   ``min_score``.  All arithmetic is Python integer math — exact, so
   the stream's scores EQUAL the batch operator's int64 scores
   (convergence is pinned in tests).

State: zero.  Shuffle: zero (pure map stage).  The model costs
``O(query terms)`` memory per executor.  Out-of-contract documents
(``dl > max_doc_len``) are skipped, matching the batch exclusion.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.search import (IDF_SCALE, TF_SCALE, _check_params,
                                _corpus_stats, _postings, _query_terms,
                                doc_len, doc_tokens)

OUTPUT_SCHEMA = "doc_id string, query_id string, score_int long"


def fit_bm25_model(corpus: DataFrame, queries: DataFrame, *,
                   id_col: str = "doc_id", text_col: str = "text",
                   query_id_col: str = "query_id",
                   query_text_col: str = "query_text",
                   k1: tuple = (6, 5), b: tuple = (3, 4),
                   max_docs: int = 1 << 32,
                   max_query_len: int = 64,
                   max_doc_len: int = 1 << 18) -> dict:
    """Driver-side BM25 model from a corpus snapshot: per-term quantized
    idf (the batch integer formula, computed on exact Python ints),
    per-query term multipliers, and the corpus ``avg_dl_m`` — everything
    :func:`relevance_stream` needs to score a document in isolation.

    Terms with zero corpus matches carry ``df = 0`` (idf at its maximum
    — the batch operator simply never sees them, and a zero-tf document
    contributes 0 either way, so the two stay equal)."""
    k1n, k1d, bn, bd = _check_params(k1, b, max_docs, max_query_len,
                                     max_doc_len)
    # STREAMING-ONLY overflow arm (ADVICE r5): the model scores query
    # terms ABSENT from the fit corpus at df = 0, whose idf
    # IDF_SCALE*(2N+1) is ~3x the df=1 bound _check_params certifies —
    # a streamed document can hit it, the batch operator never can.
    # Size the guard on the df=0 idf so every score the model can
    # produce fits the declared int64 Arrow column.
    idf0_max = IDF_SCALE * (2 * max_docs + 1)
    tfq_max = (TF_SCALE * (k1n + k1d)) // k1d + 1
    if max_query_len * idf0_max * tfq_max >= (1 << 63):
        raise ValueError(
            f"fit_bm25_model: df=0 idf overflows int64 for streamed "
            f"documents (max_docs={max_docs}, "
            f"max_query_len={max_query_len}, k1={k1}) — lower "
            f"max_docs or max_query_len (the streaming bound is ~3x "
            f"the batch df=1 bound)")
    qt = _query_terms(queries, query_id_col, query_text_col,
                      max_query_len)
    stats = _corpus_stats(corpus, text_col, max_doc_len).first()
    n_docs, avg_dl_m = stats["n_docs"], stats["avg_dl_m"]
    if n_docs > max_docs:
        raise ValueError(
            f"fit_bm25_model: corpus exceeds max_docs={max_docs} "
            f"(score overflow contract) — got {n_docs}")
    dfreq = {r["term"]: r["df"] for r in
             _postings(corpus, qt, id_col, text_col, max_doc_len)
             .groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("df"))
             .collect()}
    qterms = [(str(r["query_id"]), r["term"], int(r["qtf"]))
              for r in qt.collect()]
    # idf over the QUERY term set, not just matched terms: a term with
    # zero corpus matches carries df = 0 (idf at its maximum) so an
    # out-of-snapshot streamed document holding it still scores — on
    # the fit corpus itself such a term can never match, so batch
    # equality is unaffected
    idf = {t: (IDF_SCALE * (2 * (n_docs - dfreq.get(t, 0)) + 1))
           // (2 * dfreq.get(t, 0) + 1)
           for t in {t for _, t, _ in qterms}}
    return {
        "avg_dl_m": int(avg_dl_m), "n_docs": int(n_docs),
        "coeffs": (k1n, k1d, bn, bd), "idf": idf, "qterms": qterms,
        "max_doc_len": int(max_doc_len),
    }


def _score_doc(tokens, dl: int, model: dict, wanted: set) -> dict:
    """score per query_id for one document — exact Python integer math,
    the same quantized formula as the batch operator.  ``wanted`` is
    the query-term set, hoisted out of this per-row path by the
    caller."""
    k1n, k1d, bn, bd = model["coeffs"]
    adl = model["avg_dl_m"]
    idf = model["idf"]
    tf: dict = {}
    for t in tokens:
        if t in wanted:
            tf[t] = tf.get(t, 0) + 1
    scores: dict = {}
    for qid, t, qtf in model["qterms"]:
        f = tf.get(t, 0)
        if f == 0 or t not in idf:
            continue
        denom = (k1d * bd * adl * f + k1n * (bd - bn) * adl
                 + k1n * bn * 1000 * dl)
        tfq = (TF_SCALE * (k1n + k1d) * bd * adl * f) // denom
        scores[qid] = scores.get(qid, 0) + qtf * idf[t] * tfq
    return scores


def relevance_stream(stream: DataFrame, model: dict, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     min_score: int = 1) -> DataFrame:
    """Score each arriving document against every model query:
    ``(doc_id, query_id, score_int)`` rows with ``score_int >=
    min_score``.  Stateless and shuffle-free — works identically on
    batch frames (the convergence test runs it both ways)."""
    if min_score < 1:
        raise ValueError(f"min_score must be >= 1, got {min_score}")
    spark = stream.sparkSession
    b_model = spark.sparkContext.broadcast(model)
    projected = stream.select(
        F.col(id_col).cast("string").alias("doc_id"),
        doc_len(F.col(text_col)).alias("dl"),
        doc_tokens(F.col(text_col)).alias("toks"))

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = b_model.value
        cap = m["max_doc_len"]
        wanted = {t for _, t, _ in m["qterms"]}
        for pdf in batches:
            out = []
            for doc_id, dl, toks in zip(pdf["doc_id"], pdf["dl"],
                                        pdf["toks"]):
                if dl is None or dl == 0 or dl > cap or toks is None:
                    continue
                for qid, s in _score_doc(toks, int(dl), m,
                                         wanted).items():
                    if s >= min_score:
                        out.append((doc_id, qid, s))
            yield pd.DataFrame(out,
                               columns=["doc_id", "query_id",
                                        "score_int"])

    return projected.mapInPandas(scorer, OUTPUT_SCHEMA)
