"""Text analysis + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from boon_spark.operators.multimodal import (MULTIMODAL_DDL, decode_images,
                                             deterministic_fake_decoder,
                                             sample_frames)
from boon_spark.operators.text import (analyze, bpe_ish_token_count,
                                       language_id, quality_score,
                                       rolling_fingerprint,
                                       whitespace_token_count)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        ("en1", "the cat and the dog sat in the garden that morning"),
        ("de1", "der hund und die katze sind nicht in der stadt"),
        ("fr1", "le chat est dans la maison et les oiseaux dans le jardin"),
        ("es1", "el perro y los gatos es una historia que para todos"),
        ("zh1", "这是一段中文文本用于测试语言识别功能"),
        ("und1", "xyzzy qwerty 12345"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_language_id(spark, texts):
    got = {r.doc_id: r.lang for r in texts.select(
        "doc_id", language_id(F.col("text")).alias("lang")).collect()}
    assert got == {"en1": "en", "de1": "de", "fr1": "fr",
                   "es1": "es", "zh1": "zh", "und1": "und"}


def test_token_counts(spark, texts):
    r = texts.filter("doc_id = 'en1'").select(
        whitespace_token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe")).collect()[0]
    assert r.ws == 11
    assert r.bpe >= r.ws  # subword correction never undercounts words


def test_quality_score_ranges(spark, texts):
    rows = texts.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)
    en = texts.filter("doc_id = 'en1'").select(
        quality_score(F.col("text")).alias("q")).collect()[0].q
    junk = spark.createDataFrame(
        [("j", "!!! ??? !!! ,,,, ;;;")], "doc_id string, text string") \
        .select(quality_score(F.col("text")).alias("q")).collect()[0].q
    assert en > junk


def test_rolling_fingerprint_robust_to_tail_edit(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = a + " appended tail words here"
    df = spark.createDataFrame([("a", a), ("b", b)],
                               "doc_id string, text string")
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    # same minimizing window survives the tail edit with high probability
    assert fps["a"] == fps["b"]


def test_analyze_single_projection(spark, texts):
    out = analyze(texts)
    assert {"lang_pred", "n_tokens_ws", "n_tokens_bpe", "quality",
            "fingerprint"} <= set(out.columns)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: no shuffle


def test_multimodal_decode_with_fake_kernel(spark):
    rows = [("m1", bytes([10, 20, 3, 4, 5])), ("m2", bytes([1, 2, 3, 4]))]
    df = spark.createDataFrame(rows, "doc_id string, payload binary")
    out = decode_images(df, decoder=deterministic_fake_decoder).collect()
    got = {r.doc_id: r for r in out}
    assert got["m1"].width == 11 and got["m1"].height == 21
    assert len(got["m1"].features) == 8
    assert got["m2"].channels == 3


def test_multimodal_decode_stub_raises_without_kernel(spark):
    df = spark.createDataFrame([("m1", b"abcd")],
                               "doc_id string, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|no image decoder"):
        decode_images(df).collect()


def test_frame_sampling_shape(spark):
    df = spark.createDataFrame([("v1", bytes(range(160)))],
                               "doc_id string, payload binary")
    out = sample_frames(df, every_n=3).collect()
    assert [r.frame for r in out] == [0, 3, 6, 9]
    assert all(len(r.chunk) == 16 for r in out)


def test_multimodal_ddl_parses(spark):
    df = spark.createDataFrame([], MULTIMODAL_DDL)
    assert "payload" in df.columns and "meta" in df.columns


def test_frame_sampling_multi_row_batch(spark):
    # vectorized explosion across a whole Arrow batch: mixed payload
    # sizes, empty/null payloads (→ one frame 0 each)
    df = spark.createDataFrame(
        [("a", bytes(range(160))), ("b", bytes(range(40))),
         ("c", b""), ("d", None)],
        "doc_id string, payload binary")
    out = sample_frames(df, every_n=3).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.frame)
    assert got == {"a": [0, 3, 6, 9], "b": [0], "c": [0], "d": [0]}


def test_no_row_wise_iteration_in_operators():
    # mapInPandas bodies must stay vectorized (the Arrow batch IS the
    # unit of work) — pin that no operator regresses to pandas iterrows
    import glob
    import os
    root = os.path.join(os.path.dirname(__file__), "..", "boon_spark")
    for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
        with open(path) as f:
            assert ".iterrows(" not in f.read(), f"row-wise loop in {path}"
