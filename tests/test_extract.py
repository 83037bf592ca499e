"""Extractor + generator + ingest-pipeline tests.

The core invariant (BASELINE.json input_hint): vectorized Arrow UDF text
is byte-identical to the per-row pure-Python reference extractor for
every url; and the distributed Spark pages generator is byte-identical to
the pure-Python one."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphit_spark import LinkGraph
from graphit_spark.datagen import (
    gen_pages,
    gen_pages_python,
    golden_pages_edges,
    page_html,
)
from graphit_spark.extract import (
    build_url_ids,
    extract_pages,
    pages_to_edges,
    reference_extract,
)
from tests.oracles import squish

N = 120  # small but has hubs (i < N/200 -> none; use >=200 for hub boost)
N_HUBBY = 400


EDGE_CASES = [
    b"",
    b"<html></html>",
    b"no tags at all",
    b"<p>a&amp;b &lt;c&gt; &quot;d&quot; &amp;amp;</p>",
    b'<a href="x">t</a><a href=\'single\'>u</a>',  # single quotes NOT matched
    b"\xff\xfe invalid utf8 <b>bold</b>",
    b"<p>multi\n\nline\t text  </p>",
    b'<a href="">empty</a>',
]


def test_reference_extract_contract():
    text, links = reference_extract(
        b'<p>a&amp;b</p> <a href="http://x/1">one</a>'
    )
    assert text == "a&b one"
    assert links == ["http://x/1"]
    # double-escape decodes ONE level
    text, _ = reference_extract(b"&amp;lt;")
    assert text == "&lt;"


@pytest.mark.parametrize("html", EDGE_CASES)
def test_vectorized_matches_reference_edge_cases(spark, html):
    ref_text, ref_links = reference_extract(html)
    df = (
        spark.createDataFrame([(html,)], "html binary")
        .withColumn("url", F.lit("u"))
        .withColumn("warc_ts", F.current_timestamp())
        .withColumn("text", F.lit(""))
        .withColumn("lang", F.lit("en"))
    )
    out = extract_pages(df).collect()[0]
    assert out["text"] == ref_text
    assert list(out["links"]) == ref_links


def test_generator_spark_matches_python(spark):
    got = {
        r["url"]: r
        for r in gen_pages(spark, N, num_partitions=4).collect()
    }
    exp = gen_pages_python(N)
    assert len(got) == len(exp)
    for e in exp:
        g = got[e["url"]]
        assert bytes(g["html"]) == e["html"], e["url"]
        assert g["text"] == e["text"], e["url"]
        assert g["lang"] == e["lang"]
        assert g["warc_ts"] == e["warc_ts"]


def test_stored_text_is_extractor_output(spark):
    pages = gen_pages(spark, N, num_partitions=4)
    ex = extract_pages(pages).withColumnRenamed("text", "re_text")
    joined = pages.join(ex, "url").select("text", "re_text").collect()
    for r in joined:
        assert r["text"] == r["re_text"]


def test_url_ids_dense_and_ordered(spark):
    pages = gen_pages(spark, N, num_partitions=4)
    ids = build_url_ids(extract_pages(pages)).collect()
    by_url = sorted(ids, key=lambda r: r["url"])
    assert [r["id"] for r in by_url] == list(range(len(ids)))


def test_pipeline_edges_match_formula(spark):
    """pages → extract → ids → edges reproduces the generator's edge list
    mapped through the url→id dictionary permutation."""
    from graphit_spark.datagen import golden_pages_edge_ids

    pages = gen_pages(spark, N_HUBBY, num_partitions=8)
    edges_df, url_ids = pages_to_edges(pages)
    assert url_ids.count() == N_HUBBY  # every target is an existing page
    got = sorted((r["src"], r["dst"]) for r in edges_df.collect())
    exp = sorted(golden_pages_edge_ids(N_HUBBY))
    assert got == exp


def test_pipeline_graph_kernels_run(spark):
    from graphit_spark.kernels import pagerank
    from tests.oracles import pagerank_oracle
    import numpy as np

    from graphit_spark.datagen import golden_pages_edge_ids

    pages = gen_pages(spark, N_HUBBY, num_partitions=8)
    edges_df, _ = pages_to_edges(pages)
    g = LinkGraph(edges_df, persist=False)
    ranks = pagerank(g, max_iters=10)
    exp = pagerank_oracle(golden_pages_edge_ids(N_HUBBY), iters=10)
    got = np.zeros(len(exp))
    for r in ranks.collect():
        got[r["id"]] = r["rank"]
    assert np.allclose(got, exp, atol=1e-6)


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _frag = st.one_of(
        st.binary(max_size=24),
        st.sampled_from([
            b"<a href=\"", b"\">", b"</a>", b"<p>", b"</p>", b"&amp;",
            b"&lt;", b"&gt;", b"&quot;", b"  ", b"\n", b"\t", b"<",
            b">", b'"', b"&", b"\xff", b"\xc3\xa9", b"<b", b"href=",
        ]),
    )
    _html = st.lists(_frag, max_size=12).map(b"".join)

    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(_html, min_size=1, max_size=8))
    def test_vectorized_matches_reference_fuzz(spark, payloads):
        """Property: for ARBITRARY byte soup (entity fragments, broken
        tags, invalid UTF-8), the Arrow UDF path is byte-identical to
        reference_extract, row for row."""
        df = (
            spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                                  "i long, html binary")
            .withColumn("url", F.col("i").cast("string"))
            .withColumn("warc_ts", F.current_timestamp())
            .withColumn("text", F.lit(""))
            .withColumn("lang", F.lit("en"))
        )
        got = {int(r["url"]): (r["text"], list(r["links"]))
               for r in extract_pages(df).collect()}
        for i, p in enumerate(payloads):
            assert got[i] == reference_extract(p), p
except ImportError:  # pragma: no cover
    pass


class TestAnchors:
    def test_reference_anchor_contract(self):
        from graphit_spark.extract import reference_extract_anchors

        html = (
            b'<p>x</p><a href="http://a/">First &amp; best</a>'
            b'<a href="http://b/" class="z">\n two\n lines </a>'
            b'<a name="no-href">skipped</a>'
            b'<a href="http://c/"><b>bold</b> text</a>'
        )
        assert reference_extract_anchors(html) == [
            ("http://a/", "First & best"),
            ("http://b/", "two lines"),
            ("http://c/", "bold text"),
        ]

    def test_vectorized_matches_reference(self, spark):
        from graphit_spark.datagen import gen_pages
        from graphit_spark.extract import (
            extract_anchors_udf,
            reference_extract_anchors,
        )

        pages = gen_pages(spark, 60)
        got = {
            r["url"]: [(a["href"], a["anchor"]) for a in r["a"]]
            for r in pages.select(
                "url", extract_anchors_udf("html").alias("a")
            ).collect()
        }
        for r in pages.select("url", "html").collect():
            assert got[r["url"]] == reference_extract_anchors(
                bytes(r["html"])
            ), r["url"]

    def test_anchor_hrefs_subset_of_links(self, spark):
        from graphit_spark.datagen import gen_pages
        from graphit_spark.extract import (
            reference_extract,
            reference_extract_anchors,
        )

        for r in gen_pages(spark, 30).select("html").collect():
            h = bytes(r["html"])
            _text, links = reference_extract(h)
            hrefs = [a for a, _ in reference_extract_anchors(h)]
            it = iter(links)
            assert all(x in it for x in hrefs)  # ordered subsequence

    def test_anchor_terms_index(self, spark):
        from graphit_spark.extract import anchor_terms, build_url_ids
        from graphit_spark.extract import extract_pages

        rows = [
            ("u0", b'<a href="u1">alpha beta</a><a href="u2">alpha</a>'),
            ("u1", b'<a href="u2">beta Beta</a>'),
            ("u2", b"no links"),
        ]
        import datetime

        pages = spark.createDataFrame(
            [
                (u, datetime.datetime(2024, 1, 1), h, "", "en")
                for u, h in rows
            ],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        ids = build_url_ids(extract_pages(pages))
        idmap = {r["url"]: r["id"] for r in ids.collect()}
        got = {
            (r["dst"], r["term"]): r["n"]
            for r in anchor_terms(pages, ids).collect()
        }
        assert got == {
            (idmap["u1"], "alpha"): 1,
            (idmap["u1"], "beta"): 1,
            (idmap["u2"], "alpha"): 1,
            (idmap["u2"], "beta"): 2,
        }

    def test_unclosed_openers_linear_and_skipped(self):
        import time

        from graphit_spark.extract import reference_extract_anchors

        # 2000 closer-less openers over ~1 MB: the lazy-DOTALL regex
        # form (and a naive per-opener str.find) rescans to EOF per
        # opener (~2 GB of scanning); the contract's precomputed-closer
        # pass finishes instantly and skips every one of them
        blob = (b'<a href="u">' + b"x" * 500) * 2000
        t0 = time.time()
        assert reference_extract_anchors(blob) == []
        assert time.time() - t0 < 2.0
        # with one closer at the end, the FIRST opener claims it (the
        # nearest-following-closer rule) and the rest stay unmatched
        got = reference_extract_anchors(blob + b" tail</a>")
        assert len(got) == 1 and got[0][0] == "u"
        assert got[0][1].endswith("tail")
