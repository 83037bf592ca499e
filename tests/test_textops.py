"""word_ngrams / top_ngrams: windowing, edge cases, deterministic cut."""

from pyspark.sql import functions as F

from graphit_spark.functions.textops import top_ngrams, word_ngrams


def _grams(spark, text, n=2):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(word_ngrams(F.col("text"), n).alias("g")).first()["g"]


def test_word_ngrams_windows(spark):
    assert _grams(spark, "A b c d") == ["a b", "b c", "c d"]
    assert _grams(spark, "a b c d", 3) == ["a b c", "b c d"]
    assert _grams(spark, "  a   b  ") == ["a b"]  # trim + multi-space


def test_word_ngrams_short_texts(spark):
    assert _grams(spark, "solo") == []
    assert _grams(spark, "") == []
    assert _grams(spark, "x y", 2) == ["x y"]  # exactly n tokens → 1 gram


def test_top_ngrams_counts_and_tiebreak(spark):
    rows = [(1, "a b a b"), (2, "a b z z"), (3, "m m")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in top_ngrams(df, k=3).collect()]
    # "a b": doc1 twice-windowed ("a b","b a","a b") + doc2 once = 3
    assert got[0] == ("a b", 3, 2)
    # count-1 ties resolved by ngram text ascending
    assert [g for g, *_ in got] == ["a b", "b a", "b z"]
