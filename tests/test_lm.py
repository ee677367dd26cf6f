"""Bigram LM scoring (operators/lm.py).

The DuckDB oracle gate (`lm_score` in test_oracle_parity) pins
cross-engine bit-exactness; this file pins the q64 integer-log
definition, hand-computed scores on a tiny corpus, the
out-of-range guard, and the discriminative property the filter exists
for (repetitive text scores lower NLL than novel text).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from boon_spark.operators.lm import (fit_bigram_lm, ln64_bounds,
                                     score_bigram_lm)


def _q64(bounds, x):
    return int(np.searchsorted(bounds, np.int64(x), side="right"))


def test_ln64_bounds_definition():
    b = ln64_bounds(768)  # covers x <= e^12 = 162755
    assert b[0] == 2 and (np.diff(b) >= 0).all()
    # q64(x) approximates floor(64 ln x) within 1 step (in range)
    for x in (1, 2, 3, 10, 100, 7919, 162000):
        q = _q64(b, x)
        assert abs(q - 64 * math.log(x)) <= 1.0 + 1e-9
    assert _q64(b, 1) == 0
    with pytest.raises(ValueError, match=r"n_steps"):
        ln64_bounds(0)


def test_hand_computed_scores(spark):
    # corpus: doc a = [1,2,1,2,1], doc b = [1,3]
    df = spark.createDataFrame(
        [("a", [1, 2, 1, 2, 1]), ("b", [1, 3])],
        "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df)
    v = model["vocab"]
    assert v == 3  # {1, 2, 3}
    bi = {(r.w1, r.w2): r.c12 for r in model["bi"].collect()}
    uni = {r.w1: r.c1 for r in model["uni"].collect()}
    assert bi == {(1, 2): 2, (2, 1): 2, (1, 3): 1}
    assert uni == {1: 4, 2: 2, 3: 1}
    b = model["bounds"]
    out = {r.doc_id: r for r in score_bigram_lm(df, model).collect()}

    def s(c12, c1):
        return _q64(b, c12 + 1) - _q64(b, c1 + v)

    nll_a = -(2 * s(2, 4) + 2 * s(2, 2))        # 1-2,2-1,1-2,2-1
    nll_b = -(s(1, 4))                           # 1-3
    assert out["a"].n_bigrams == 4 and out["a"].nll_q64 == nll_a
    assert out["b"].n_bigrams == 1 and out["b"].nll_q64 == nll_b
    assert out["a"].avg_nll_mq64 == (nll_a * 1000) // 4
    # single-token / empty docs produce no row
    df2 = df.union(spark.createDataFrame(
        [("c", [7]), ("d", [])], "doc_id string, tokens array<int>"))
    assert score_bigram_lm(df2, model).filter(
        F.col("doc_id").isin("c", "d")).count() == 0


def test_out_of_range_raises(spark):
    df = spark.createDataFrame(
        [("a", [1] * 200)], "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df, n_steps=64)  # covers counts <= e^1 = 3
    with pytest.raises(Exception, match=r"q64 argument .* exceeds"):
        score_bigram_lm(df, model).collect()


def test_repetitive_scores_below_novel(spark):
    # the filter's raison d'etre: a doc of one repeated bigram scores
    # far lower per-token NLL than a doc of all-unique bigrams
    rep = [5, 6] * 50
    novel = list(range(100, 200))
    filler = [[i % 7, (i + 1) % 7, (i + 2) % 7] for i in range(30)]
    rows = [("rep", rep), ("novel", novel)] + [
        (f"f{i}", t) for i, t in enumerate(filler)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df)
    out = {r.doc_id: r.avg_nll_mq64
           for r in score_bigram_lm(df, model).collect()}
    assert out["rep"] < out["novel"]


def test_q64_runs_on_count_frames_not_pairs(spark):
    """The Arrow kernel must annotate the (distinct-ngram) count frames
    — exactly two ArrowEvalPython nodes, each ABOVE an aggregate, never
    over the exploded pairs."""
    df = spark.createDataFrame(
        [("a", [1, 2, 3, 1, 2])], "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df)
    plan = score_bigram_lm(df, model) \
        ._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    arrow = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l]
    assert len(arrow) == 2, plan
    # each kernel feeds off the n-gram count aggregate (or its pinned
    # materialization — InMemoryTableScan for persist, ExistingRDD for
    # the r7 lazy localCheckpoint — possibly behind a pushed join-key
    # null filter) — the UDF consumes (distinct-ngram, count) rows;
    # an exploded-pairs Generate below the kernel would be the bug
    for i in arrow:
        window = "".join(lines[i + 1:i + 4])
        assert ("HashAggregate" in window
                or "InMemoryTableScan" in window
                or "ExistingRDD" in window), plan
        assert "Generate" not in window, plan


def test_lm_stream_matches_batch(spark, tmp_path):
    """Stateless stream scoring == batch integers, both on a real
    micro-batched stream and in batch mode (the scorer is mode-
    agnostic by construction)."""
    from boon_spark.streaming.lm_stream import (collect_lm_model,
                                                lm_score_stream)
    rows = [(f"d{i}", [(i * 7 + j) % 23 for j in range(5 + i % 4)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df)
    lm = collect_lm_model(model)
    want = {(r.doc_id, r.n_bigrams, r.nll_q64, r.avg_nll_mq64)
            for r in score_bigram_lm(df, model).collect()}
    # batch mode
    got_b = {(r.doc_id, r.n_bigrams, r.nll_q64, r.avg_nll_mq64)
             for r in lm_score_stream(df, lm).collect()}
    assert got_b == want
    # real stream, two micro-batches; an unseen-token doc must score
    # via the df=0 smoothing arms without error
    path = str(tmp_path / "lm_in")
    df.limit(20).coalesce(1).write.parquet(path + "/p1")
    extra = spark.createDataFrame(
        [("novel", [900, 901, 902])], "doc_id string, tokens array<int>")
    df.subtract(df.limit(20)).union(extra) \
        .coalesce(1).write.parquet(path + "/p2")
    stream = (spark.readStream
              .schema("doc_id string, tokens array<int>")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(path))
    q = (lm_score_stream(stream, lm).writeStream.format("memory")
         .queryName("t_lm").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_s = {(r.doc_id, r.n_bigrams, r.nll_q64, r.avg_nll_mq64)
             for r in spark.sql("select * from t_lm").collect()}
    novel = {t for t in got_s if t[0] == "novel"}
    assert got_s - novel == want
    # unseen bigrams: qn = q64(1) = 0, unseen context = q64(V) each
    (_, n, nll, avg) = next(iter(novel))
    assert n == 2 and nll > 0


def test_collect_lm_model_guard(spark):
    from boon_spark.streaming.lm_stream import collect_lm_model
    df = spark.createDataFrame(
        [("a", list(range(30)))], "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df)
    with pytest.raises(ValueError, match=r"max_ngrams"):
        collect_lm_model(model, max_ngrams=10)


def test_pmi_collocations(spark):
    from boon_spark.operators.lm import pmi_collocations
    # pair (100, 200) co-occurs ONLY together; filler pairs are spread
    rows = [(f"p{i}", [100, 200]) for i in range(6)]
    rows += [(f"f{i}", [i % 5, (i * 3) % 5, (i * 7) % 5, (i + 1) % 5])
             for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = pmi_collocations(df, 5, min_count=3).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    top = out[0]
    assert (top.w1, top.w2) == (100, 200) and top.c12 == 6
    # exclusive pair: q64-PMI within 4 steps of 64*ln(c12*N/(c1*c2))
    import math
    n = sum(len(t) - 1 for _, t in rows)
    true = 64 * math.log(6 * n / (6 * 6))
    assert abs(top.pmi_q64 - true) <= 4 + 1
    with pytest.raises(ValueError, match=r"k must be"):
        pmi_collocations(df, 0)
    with pytest.raises(ValueError, match=r"min_count"):
        pmi_collocations(df, 3, min_count=0)


def test_pmi_empty_corpus(spark):
    from boon_spark.operators.lm import pmi_collocations
    df = spark.createDataFrame([("a", [7])],
                               "doc_id string, tokens array<int>")
    assert pmi_collocations(df, 5).count() == 0


def test_backoff_lm_hand_computed(spark):
    from boon_spark.operators.lm import (BACKOFF_Q64, fit_backoff_lm,
                                         score_backoff_lm)
    # corpus: a = [1,2,3,1,2,3], b = [2,3,4]
    df = spark.createDataFrame(
        [("a", [1, 2, 3, 1, 2, 3]), ("b", [2, 3, 4])],
        "doc_id string, tokens array<int>")
    model = fit_backoff_lm(df)
    n = model["n_tokens"]
    assert n == 9
    b = model["bounds"]
    out = {r.doc_id: r for r in score_backoff_lm(df, model).collect()}
    q = lambda x: _q64(b, x)
    # doc a trigrams: (1,2,3)x2 c123=2 c12=2; (2,3,1) c123=1 c12(2,3)=3;
    # (3,1,2) c123=1 c12(3,1)=1
    nll_a = -((q(2) - q(2)) * 2 + (q(1) - q(3)) + (q(1) - q(1)))
    assert out["a"].n_trigrams == 4 and out["a"].nll_q64 == nll_a
    # doc b: (2,3,4) unseen trigram? c123(2,3,4)=1 -> seen (fit==score)
    assert out["b"].n_trigrams == 1
    # scoring fresh docs exercises the backoff arms:
    fresh = spark.createDataFrame(
        [("x", [1, 2, 9]),    # tri (1,2,9) unseen; bi (2,9) unseen ->
                              # 2A + q64(c(9)=0 -> 0) - q64(N)
         ("y", [9, 2, 3])],   # tri unseen; bi (2,3) c12=3, uni 2 c=3
                              # -> A + q(3) - q(3) = A
        "doc_id string, tokens array<int>")
    got = {r.doc_id: r.nll_q64
           for r in score_backoff_lm(fresh, model).collect()}
    assert got["x"] == -(2 * BACKOFF_Q64 + 0 - q(9))  # q64(N), N = 9
    assert got["y"] == -BACKOFF_Q64
    # docs with <3 tokens emit nothing
    short = spark.createDataFrame([("s", [1, 2])],
                                  "doc_id string, tokens array<int>")
    assert score_backoff_lm(short, model).count() == 0


from hypothesis import given, settings
from hypothesis import strategies as st

_corpus = st.lists(
    st.lists(st.integers(min_value=0, max_value=6),
             min_size=0, max_size=8),
    min_size=1, max_size=8)


def _py_bigram_scores(docs, bounds):
    uni, bi = {}, {}
    for toks in docs:
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for i, toks in enumerate(docs):
        if len(toks) < 2:
            continue
        nll = 0
        for a, b in zip(toks, toks[1:]):
            qn = _q64(bounds, bi.get((a, b), 0) + 1)
            qd = _q64(bounds, uni.get(a, 0) + v)
            nll -= qn - qd
        out[f"d{i}"] = (len(toks) - 1, nll, (nll * 1000) // (len(toks) - 1))
    return out


@settings(max_examples=15, deadline=None)
@given(_corpus)
def test_bigram_lm_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(docs)],
        "doc_id string, tokens array<int>")
    model = fit_bigram_lm(df)
    got = {r.doc_id: (r.n_bigrams, r.nll_q64, r.avg_nll_mq64)
           for r in score_bigram_lm(df, model).collect()}
    assert got == _py_bigram_scores(docs, model["bounds"])


@settings(max_examples=15, deadline=None)
@given(_corpus, _corpus)
def test_backoff_lm_matches_python_reference(spark, fit_docs, score_docs):
    from boon_spark.operators.lm import fit_backoff_lm, score_backoff_lm
    fit_df = spark.createDataFrame(
        [(f"f{i}", t) for i, t in enumerate(fit_docs)],
        "doc_id string, tokens array<int>")
    model = fit_backoff_lm(fit_df)
    # reference fits on fit_docs but scores score_docs (exercises all
    # three backoff arms on genuinely unseen n-grams)
    ref_model_docs = fit_docs
    uni, bi, tri = {}, {}, {}
    for toks in ref_model_docs:
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    from boon_spark.operators.lm import BACKOFF_Q64 as A
    n = sum(uni.values())
    b_ = model["bounds"]
    q = lambda x: _q64(b_, x)
    want = {}
    for i, toks in enumerate(score_docs):
        if len(toks) < 3:
            continue
        nll = 0
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            if (a, b, c) in tri:
                s = q(tri[(a, b, c)]) - q(bi[(a, b)])
            elif (b, c) in bi:
                s = A + q(bi[(b, c)]) - q(uni[b])
            else:
                s = 2 * A + (q(uni[c]) if c in uni else 0) - q(max(n, 1))
            nll -= s
        k = len(toks) - 2
        want[f"s{i}"] = (k, nll, (nll * 1000) // k)
    score_df = spark.createDataFrame(
        [(f"s{i}", t) for i, t in enumerate(score_docs)],
        "doc_id string, tokens array<int>")
    got = {r.doc_id: (r.n_trigrams, r.nll_q64, r.avg_nll_mq64)
           for r in score_backoff_lm(score_df, model).collect()}
    assert got == want
