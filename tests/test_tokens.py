"""Token-array operators: synthetic tokens, histograms, OOV, k-grams."""

import hashlib

import pytest
from pyspark.sql import functions as F

from boon_spark.operators.tokens import (KGRAM_SALT, TOKEN_SALT,
                                         oov_stats, synthetic_tokens,
                                         token_kgram_candidates,
                                         token_kgram_stats, token_topk)


def _md5_60(s: str, salt: int) -> int:
    return int(hashlib.md5(f"{s}#{salt}".encode()).hexdigest()[:15], 16)


def _py_tok(g, p, vocab=997) -> int:
    return _md5_60(f"{g}:{p}", TOKEN_SALT) % vocab


def _py_kgrams(toks, k):
    return {_md5_60(",".join(map(str, toks[p:p + k])), KGRAM_SALT)
            for p in range(len(toks) - k + 1)}


def test_synthetic_tokens_matches_python(spark):
    df = spark.createDataFrame([("a", 4), ("b", 0), ("c", None)],
                               "doc_id string, n_tok int")
    rows = {r.doc_id: r.tokens
            for r in synthetic_tokens(df, gen_col="doc_id").collect()}
    assert rows["a"] == [_py_tok("a", p) for p in range(4)]
    assert rows["b"] == [] and rows["c"] == []


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, "
                                       "source string")


TOK_ROWS = [
    ("a", [1, 2, 3, 4, 5], "web"),
    ("b", [1, 2, 3, 4, 9], "web"),      # shares 4-prefix with a
    ("c", [1, 2, 3, 4, 5, 6], "code"),  # contains a entirely
    ("d", [7, 7, 7], "code"),
    ("e", None, "web"),
    ("f", [], "web"),
]


def test_token_topk(spark):
    rows = token_topk(_tok_df(spark, TOK_ROWS), 3).orderBy("rank").collect()
    # counts: 1,2,3,4 appear 3x; 7 appears 3x; 5 appears 2x → tie by id
    assert [(r.rank, r.token, r.n) for r in rows] == \
        [(1, 1, 3), (2, 2, 3), (3, 3, 3)]


def test_oov_stats(spark):
    out = {r.source: r
           for r in oov_stats(_tok_df(spark, TOK_ROWS), 7).collect()}
    assert (out["web"].n_docs, out["web"].n_tokens,
            out["web"].n_oov, out["web"].docs_with_oov) == (4, 10, 1, 1)
    assert (out["code"].n_docs, out["code"].n_tokens,
            out["code"].n_oov, out["code"].docs_with_oov) == (2, 9, 3, 1)
    corpus = oov_stats(_tok_df(spark, TOK_ROWS), 7, by=None).collect()[0]
    assert (corpus.n_docs, corpus.n_oov) == (6, 4)
    with pytest.raises(ValueError, match="vocab_size"):
        oov_stats(_tok_df(spark, TOK_ROWS), 0)


def test_kgram_candidates_match_python(spark):
    k, df_ = 2, _tok_df(spark, TOK_ROWS)
    got = {(r.id_a, r.id_b): (r.shared, r.containment_permille)
           for r in token_kgram_candidates(df_, k, min_shared=1).collect()}
    gr = {d: _py_kgrams(t, k) for d, t, _ in TOK_ROWS if t}
    want = {}
    for x in gr:
        for y in gr:
            if x < y and gr[x] & gr[y]:
                s = len(gr[x] & gr[y])
                want[(x, y)] = (s, s * 1000 // min(len(gr[x]), len(gr[y])))
    assert got == want
    assert got[("a", "c")] == (4, 1000)  # a fully contained in c


def test_kgram_min_shared_filters(spark):
    got = token_kgram_candidates(_tok_df(spark, TOK_ROWS), 2,
                                 min_shared=4).collect()
    assert {(r.id_a, r.id_b) for r in got} == {("a", "c")}


def test_kgram_hot_exclusion_and_stats(spark):
    # 5 docs share [1,2]; with max_bucket=4 that k-gram is hot → dropped
    rows = [(f"h{i}", [1, 2, 100 + i], "web") for i in range(5)]
    df_ = _tok_df(spark, rows)
    stats = token_kgram_stats(df_, 2, max_bucket=4).collect()[0]
    assert (stats.n_kgrams, stats.n_hot, stats.max_df) == (6, 1, 5)
    got = token_kgram_candidates(df_, 2, min_shared=1,
                                 max_bucket=4).collect()
    assert got == []  # only the shared k-gram linked them
    kept = token_kgram_candidates(df_, 2, min_shared=1,
                                  max_bucket=5).collect()
    assert len(kept) == 10  # cap raised: all pairs linked


def test_kgram_guards(spark):
    df_ = _tok_df(spark, TOK_ROWS)
    with pytest.raises(ValueError, match="k must"):
        token_kgram_candidates(df_, 0)
    with pytest.raises(ValueError, match="min_shared"):
        token_kgram_candidates(df_, 2, min_shared=0)
    rows = [(f"h{i}", [1, 2], "web") for i in range(5)]
    with pytest.raises(ValueError, match="max_hot"):
        token_kgram_candidates(_tok_df(spark, rows), 2, max_bucket=1,
                               max_hot=0)


def test_token_windows_python_reference(spark):
    from boon_spark.operators.tokens import token_windows
    import hashlib
    df = spark.createDataFrame(
        [("a", list(range(10))), ("b", [7]), ("c", []), ("d", None)],
        "doc_id string, tokens array<int>")
    got = {(r.doc_id, r.win_id): (r.start_tok, r.n_tok, r.win_md5)
           for r in token_windows(df, 4, 3).collect()}
    want = {}
    for doc, toks in [("a", list(range(10))), ("b", [7])]:
        for w, start in enumerate(range(0, len(toks), 3)):
            piece = toks[start:start + 4]
            want[(doc, w)] = (start, len(piece), hashlib.md5(
                ",".join(map(str, piece)).encode()).hexdigest())
    assert got == want
    # doc "a": ceil(10/3) = 4 windows, tail is 1 token
    assert got[("a", 3)][1] == 1
    # empty / NULL arrays produce no windows
    assert not any(d in ("c", "d") for d, _ in got)


def test_token_windows_validation(spark):
    from boon_spark.operators.tokens import token_windows
    df = spark.createDataFrame([("a", [1])], "doc_id string, tokens array<int>")
    with pytest.raises(ValueError, match="window and stride"):
        token_windows(df, 0, 3)
    with pytest.raises(ValueError, match="window and stride"):
        token_windows(df, 4, 0)


def test_remove_hot_kgram_spans_semantics(spark):
    from boon_spark.operators.tokens import remove_hot_kgram_spans
    import hashlib
    # docs a,b share the 3-gram [1,2,3] (df=2 >= min_df); c is unique;
    # d is short; e is empty
    rows = [("a", [1, 2, 3, 9]), ("b", [7, 1, 2, 3]),
            ("c", [4, 5, 6, 8]), ("d", [1, 2]), ("e", []),
            ("f", None)]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r.doc_id: (r.n_kept, r.n_removed, r.kept_md5)
           for r in remove_hot_kgram_spans(df, 3, min_df=2).collect()}

    def h(toks):
        return hashlib.md5(",".join(map(str, toks)).encode()).hexdigest()
    # a: positions 0-2 covered -> [9]; b: positions 1-3 covered -> [7]
    assert got["a"] == (1, 3, h([9]))
    assert got["b"] == (1, 3, h([7]))
    assert got["c"] == (4, 0, h([4, 5, 6, 8]))
    assert got["d"] == (2, 0, h([1, 2]))
    assert got["e"] == (0, 0, h([]))
    # NULL arrays = empty arrays: same (0, 0, md5('')) arm as "e"
    assert got["f"] == (0, 0, h([]))


def test_remove_hot_kgram_spans_guards(spark):
    from boon_spark.operators.tokens import remove_hot_kgram_spans
    df = spark.createDataFrame([("a", [1, 2, 3]), ("b", [1, 2, 3])],
                               "doc_id string, tokens array<int>")
    with pytest.raises(ValueError, match="min_df must be"):
        remove_hot_kgram_spans(df, 3, min_df=1)
    with pytest.raises(ValueError, match="k must be"):
        remove_hot_kgram_spans(df, 0, min_df=2)
    with pytest.raises(ValueError, match="max_hot"):
        remove_hot_kgram_spans(df, 2, min_df=2, max_hot=1).collect()
    # no hot k-grams at high min_df: everything survives
    out = {r.doc_id: r.n_removed
           for r in remove_hot_kgram_spans(df, 3, min_df=5).collect()}
    assert out == {"a": 0, "b": 0}


def test_kgram_hashes_matches_expression(spark):
    # r7: the production k-gram hasher is an Arrow-batched pandas UDF;
    # pin bit-equality (values AND first-occurrence order) against the
    # expression reference on the edges: null array, shorter-than-k,
    # exactly-k, duplicates, and a null element (array_join skips it)
    from pyspark.sql import functions as F
    from boon_spark.operators.tokens import (_kgram_hashes,
                                             _kgram_hashes_expr)
    rows = [
        (0, None),
        (1, []),
        (2, [1]),
        (3, [1, 2]),
        (4, [1, 2, 3]),
        (5, [1, 2, 3, 4, 5, 6]),
        (6, [7, 7, 7, 7, 7, 7, 7]),   # duplicate k-grams
        (7, [1, None, 3, 4, 5]),       # null element
        (8, list(range(50))),
    ]
    df = spark.createDataFrame(rows, "i int, toks array<int>")
    for k in (1, 2, 3, 5):
        got = {r.i: r.h for r in df.select(
            "i", _kgram_hashes(F.col("toks"), k).alias("h")).collect()}
        want = {r.i: r.h for r in df.select(
            "i", _kgram_hashes_expr(F.col("toks"), k).alias("h"))
            .collect()}
        assert got == want, f"k={k}: {got} != {want}"

