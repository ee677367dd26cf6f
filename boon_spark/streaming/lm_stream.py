"""Streaming LM perplexity scoring — incoming token sequences scored
against a bigram model FITTED on a static corpus snapshot, statelessly.

Like :mod:`.relevance_stream` (BM25) and :mod:`.contamination_stream`:
the per-document score needs only model-level constants (n-gram counts,
vocabulary size, the shared ln-boundary table) plus the document
itself, so live quality-routing needs NO cross-batch state — collect
the fitted model once (loud size guard: a reference LM for filtering
is pruned/small by design; a web-corpus-sized bigram table is not a
broadcastable model), broadcast it, and score each arriving sequence
in one Arrow-batched map with EXACT integer math, so the stream's
scores equal batch :func:`~boon_spark.operators.lm.score_bigram_lm`
bit-for-bit (convergence pinned in tests).

State: zero.  Shuffle: zero (pure map stage).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUTPUT_SCHEMA = ("doc_id string, n_bigrams long, nll_q64 long, "
                 "avg_nll_mq64 long")


def collect_lm_model(model: dict, *, max_ngrams: int = 2_000_000) -> dict:
    """Driver-side form of a :func:`~boon_spark.operators.lm.
    fit_bigram_lm` model: the count frames as plain dicts, ready to
    broadcast.  Raises loudly when the model exceeds ``max_ngrams``
    rows — stream-scoring wants a PRUNED reference LM (CCNet ships a
    filtered model, not the raw web counts); broadcasting an unbounded
    bigram table is the OOM this guard names."""
    n_bi = model["bi"].count()
    n_uni = model["uni"].count()
    if n_bi + n_uni > max_ngrams:
        raise ValueError(
            f"collect_lm_model: {n_bi} bigrams + {n_uni} unigrams "
            f"exceed max_ngrams={max_ngrams} — prune the model (e.g. "
            f"min-count filter on the count frames) or raise the guard "
            f"only if every executor can hold the broadcast")
    bi = {(int(r["w1"]), int(r["w2"])): int(r["c12"])
          for r in model["bi"].collect()}
    uni = {int(r["w1"]): int(r["c1"]) for r in model["uni"].collect()}
    return {"bi": bi, "uni": uni, "vocab": int(model["vocab"]),
            "bounds": model["bounds"]}


def lm_score_stream(stream: DataFrame, lm: dict, *,
                    tokens_col: str = "tokens",
                    id_col: str = "doc_id") -> DataFrame:
    """Score each arriving token sequence under the collected model:
    ``(doc_id, n_bigrams, nll_q64, avg_nll_mq64)`` — the exact batch
    integers (docs with <2 tokens emit nothing, the batch contract).
    Works identically on batch frames (the convergence test runs it
    both ways)."""
    spark = stream.sparkSession
    b_model = spark.sparkContext.broadcast(lm)
    projected = stream.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(tokens_col).alias("toks"))

    def scorer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = b_model.value
        bi, uni, v = m["bi"], m["uni"], m["vocab"]
        bounds = m["bounds"]
        last = int(bounds[-1])

        def q64(x: int) -> int:
            if x > last:
                raise ValueError(
                    f"q64 argument {x} exceeds the boundary table "
                    f"(max {last}) — raise n_steps")
            return int(np.searchsorted(bounds, np.int64(x),
                                       side="right"))

        q_v = q64(v)
        for pdf in batches:
            out = []
            for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
                if toks is None or len(toks) < 2:
                    continue
                nll = 0
                n = 0
                prev = None
                for w in toks:
                    w = int(w)
                    if prev is not None:
                        qn = q64(bi.get((prev, w), 0) + 1)
                        c1 = uni.get(prev)
                        qd = q_v if c1 is None else q64(c1 + v)
                        nll -= qn - qd
                        n += 1
                    prev = w
                out.append((doc_id, n, nll, (nll * 1000) // n))
            yield pd.DataFrame(out, columns=["doc_id", "n_bigrams",
                                             "nll_q64", "avg_nll_mq64"])

    return projected.mapInPandas(scorer, OUTPUT_SCHEMA)
