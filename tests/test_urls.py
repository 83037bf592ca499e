"""URL canonicalization: rule-by-rule unit checks plus the dedup
grouping contract (functions/urls.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from graphit_spark.functions.urls import (
    canonical_dedup,
    canonical_url,
    url_host,
)

CASES = [
    # identity: already canonical
    ("http://a.com/x", "http://a.com/x"),
    # 1. fragment stripped
    ("http://a.com/x#sec-2", "http://a.com/x"),
    # 2. scheme + host lowercased, path case kept
    ("HTTP://WWW.Ex.COM/Path/File", "http://www.ex.com/Path/File"),
    # 3. default ports dropped, explicit ports kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),  # 80 not https default
    # 4. trailing slashes; empty path becomes /
    ("http://a.com/x/", "http://a.com/x"),
    ("http://a.com/x///", "http://a.com/x"),
    ("http://a.com", "http://a.com/"),
    ("http://a.com/", "http://a.com/"),
    ("http://a.com//", "http://a.com/"),
    # 5. tracking params dropped, rest sorted, empty query drops ?
    ("http://a.com/x?b=2&a=1", "http://a.com/x?a=1&b=2"),
    ("http://a.com/x?utm_source=t&a=1", "http://a.com/x?a=1"),
    ("http://a.com/x?utm_campaign=c&utm_medium=m", "http://a.com/x"),
    ("http://a.com/x?gclid=123", "http://a.com/x"),
    ("http://a.com/x?fbclid=9&z=1", "http://a.com/x?z=1"),
    ("http://a.com/x?", "http://a.com/x"),
    ("http://a.com/x?a=1&&b=2", "http://a.com/x?a=1&b=2"),
    # tracking-lookalikes survive: must match at the param boundary
    ("http://a.com/x?gclid2=1", "http://a.com/x?gclid2=1"),
    ("http://a.com/x?xutm_a=1", "http://a.com/x?xutm_a=1"),
    # everything at once
    (
        "HTTPS://Ex.COM:443/a/b/?utm_source=s&b=2&a=1#frag",
        "https://ex.com/a/b?a=1&b=2",
    ),
    # non-absolute -> NULL
    ("/relative/path", None),
    ("not a url", None),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], ["id", "url"]
    )


def test_canonical_rules(spark, urls_df):
    got = {
        r["id"]: r["c"]
        for r in urls_df.select(
            "id", canonical_url("url").alias("c")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_host(spark, urls_df):
    rows = spark.createDataFrame(
        [
            ("http://A.com:8080/x", "a.com"),
            ("https://b.Ex.org/", "b.ex.org"),
            ("nope", None),
        ],
        ["url", "want"],
    ).select(url_host("url").alias("h"), "want").collect()
    for r in rows:
        assert r["h"] == r["want"]


def test_canonical_dedup_min_id(spark):
    df = spark.createDataFrame(
        [
            (7, "http://a.com/x/"),
            (3, "HTTP://A.COM:80/x#f"),
            (5, "http://a.com/x?utm_source=t"),
            (9, "http://b.com/y"),
            (11, "garbage"),  # NULL canon -> kept keyed by raw string
        ],
        ["doc_id", "url"],
    )
    out = {
        r["canon_url"]: (r["doc_id"], r["n_variants"])
        for r in canonical_dedup(df).collect()
    }
    assert out["http://a.com/x"] == (3, 3)
    assert out["http://b.com/y"] == (9, 1)
    assert out["garbage"] == (11, 1)


def test_no_udf_in_plan(spark, urls_df):
    plan = urls_df.select(
        canonical_url("url")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
