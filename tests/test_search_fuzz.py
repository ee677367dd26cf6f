"""Cross-engine differential fuzz for the lexical-search family:
random word soup (whitespace shapes, case, duplicates, punctuation)
through the Spark engine and the generated DuckDB oracle side by side.

Documented exclusion: ``\\x0B`` (the one character Java's ``\\s`` and
RE2's disagree on — see ``dedup.normalized_text``) stays out of the
generator, like every other oracle-paired family's fuzz.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from boon_spark.operators.search import (bm25_topk, bm25_topk_oracle_sql)
from boon_spark.operators.tokens import (token_windows,
                                         token_windows_oracle_sql)

_word = st.sampled_from([
    "cat", "mat", "the", "CAT", "Cat.", "dog!", "a", "zz", "cat,",
    "1.2", "...", "-", "word", "Thé", "naïve", "x" * 25,
])
_sep = st.sampled_from([" ", "  ", "\t", "\n", " \t ", "\r\n"])


@st.composite
def _doc(draw):
    if draw(st.integers(0, 12)) == 0:
        return draw(st.sampled_from([None, "", "   ", "\t\n"]))
    words = draw(st.lists(_word, min_size=1, max_size=12))
    seps = draw(st.lists(_sep, min_size=len(words), max_size=len(words)))
    return "".join(w + s for w, s in zip(words, seps))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=st.lists(_doc(), min_size=1, max_size=10),
       qwords=st.lists(_word, min_size=1, max_size=4))
def test_bm25_cross_engine_fuzz(spark, docs, qwords):
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame([(0, " ".join(qwords))],
                               "query_id long, query_text string")
    got = sorted((r.query_id, r.rank, r.doc_id, r.score_int)
                 for r in bm25_topk(df, qs, k=20, max_query_len=8)
                 .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    con.execute("CREATE TABLE q(query_id BIGINT, query_text VARCHAR)")
    con.execute("INSERT INTO q VALUES (0, ?)", [" ".join(qwords)])
    want = sorted(tuple(w) for w in con.execute(bm25_topk_oracle_sql(
        queries_sql="SELECT query_id, query_text FROM q", k=20,
        max_query_len=8)).fetchall())
    con.close()
    assert got == want, f"docs={docs!r} q={qwords!r}"


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(lens=st.lists(st.one_of(st.none(), st.integers(0, 40)),
                     min_size=1, max_size=8),
       window=st.integers(1, 9), stride=st.integers(1, 9))
def test_token_windows_cross_engine_fuzz(spark, lens, window, stride):
    from boon_spark.operators.tokens import synthetic_tokens
    rows = [(i, n) for i, n in enumerate(lens)]
    df = synthetic_tokens(
        spark.createDataFrame(rows, "doc_id long, n_tok int"))
    got = sorted(tuple(r) for r in
                 token_windows(df, window, stride).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
                "source VARCHAR)")
    # synth oracle derives n from whitespace-token count of text: build
    # a text with exactly n one-char words (None -> NULL text, n=0)
    for i, n in rows:
        t = None if n is None or n == 0 else " ".join(["w"] * n)
        con.execute("INSERT INTO documents VALUES (?, ?, 's')", [i, t])
    want = sorted(tuple(w) for w in con.execute(
        token_windows_oracle_sql(window, stride)).fetchall())
    con.close()
    assert got == want, f"lens={lens!r} W={window} S={stride}"
