"""Deterministic synthetic Common-Crawl-style pages table (no external data).

Produces the exact input shape from BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

The link structure is a power-law web graph (hubs + skew), the analogue of
the reference's RMAT/uniform synthetic generator
(infra_gapbs/builder.h:239-241, generator.h) — but defined with PURE
INTEGER arithmetic so the distributed Spark generator and the pure-Python
small-scale generator produce byte-identical rows (no float/RNG drift).

Scheme for page i in [0, n):
    url_i   = https://host-{i % H}.example/p/{i:09d}     (zero-padded so
              lexicographic url order == numeric id order)
    deg_i   = 1 + (A*i + B) % 2^31 % MAX_DEG,  hubs (i < n/200) += HUB_BOOST
    link t  = hashed target; 40% of links point into the hub set
              [0, max(1, n/100)) — this is the skew kernels must survive.
    html_i  = fixed template: <title>, one <p> of deterministic tokens,
              one <a href> per link.
    text_i  = the reference extractor applied to html_i (so the stored
              column IS the contract).
    lang_i  = cycle of BCP-47-ish codes.

Self-links and duplicate links are generated on purpose (link t may equal
i or repeat) — the engine's squish stage must handle them, mirroring the
reference test graph 4.el which contains both.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F

A = 2654435761  # Knuth multiplicative hash constant
B = 1013904223
M31 = 2**31
MAX_DEG = 40
HUB_BOOST = 120
LANGS = ["en", "de", "fr", "es", "ja"]
EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)


# -- pure-Python reference implementation (the contract) -------------------


def n_hosts(n: int) -> int:
    return max(1, n // 50)


def n_hubs(n: int) -> int:
    return max(1, n // 100)


def out_degree(i: int, n: int) -> int:
    d = 1 + ((A * i + B) % M31) % MAX_DEG
    if i < max(1, n // 200):
        d += HUB_BOOST
    return min(d, n)


def link_target(i: int, t: int, n: int) -> int:
    h = (A * (i * 1_000_003 + t) + B) % M31
    if h % 10 < 4:  # 40% of links hit the hub set
        return (h // 10) % n_hubs(n)
    return (h // 10) % n


def page_url(i: int, n: int) -> str:
    return f"https://host-{i % n_hosts(n)}.example/p/{i:09d}"


def page_links(i: int, n: int) -> list[int]:
    return [link_target(i, t, n) for t in range(out_degree(i, n))]


def page_html(i: int, n: int) -> bytes:
    words = " ".join(
        f"tok{(A * (i + w) + B) % M31 % 997}" for w in range(12)
    )
    anchors = "".join(
        f'<a href="{page_url(j, n)}">link {k}</a>\n'
        for k, j in enumerate(page_links(i, n))
    )
    html = (
        f"<html><head><title>Page {i:09d} &amp; friends</title></head>\n"
        f"<body><h1>Page {i:09d}</h1>\n"
        f"<p>{words} &lt;deterministic&gt; corpus</p>\n"
        f"{anchors}</body></html>\n"
    )
    return html.encode("utf-8")


def page_lang(i: int) -> str:
    return LANGS[i % len(LANGS)]


def page_ts(i: int) -> _dt.datetime:
    return EPOCH + _dt.timedelta(seconds=i % 86400, days=i % 30)


def gen_pages_python(n: int) -> list[dict]:
    """Reference generator — small n only; the distributed generator must
    match this byte-for-byte (tested)."""
    from graphit_spark.extract import reference_extract

    rows = []
    for i in range(n):
        html = page_html(i, n)
        text, _links = reference_extract(html)
        rows.append(
            {
                "url": page_url(i, n),
                "warc_ts": page_ts(i),
                "html": html,
                "text": text,
                "lang": page_lang(i),
            }
        )
    return rows


# -- distributed Spark generator ------------------------------------------


def gen_pages(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Distributed pages generator: spark.range → mapInPandas batch builder.

    The per-batch function applies the same integer arithmetic as the
    pure-Python reference; Arrow moves the batches, so generation scales
    with partitions (each partition builds its id range independently —
    no shuffle at all)."""
    import pandas as pd

    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def build(batches):
        from graphit_spark.extract import reference_extract

        for pdf in batches:
            ids = pdf["id"].tolist()
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for i in ids:
                html = page_html(i, n)
                text, _ = reference_extract(html)
                out["url"].append(page_url(i, n))
                out["warc_ts"].append(page_ts(i))
                out["html"].append(html)
                out["text"].append(text)
                out["lang"].append(page_lang(i))
            yield pd.DataFrame(out)

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    return (
        spark.range(0, n, numPartitions=num_partitions)
        .mapInPandas(build, schema=schema)
    )


def golden_pages_edges(n: int) -> list[tuple[int, int]]:
    """The raw (pre-squish) edge list the generated pages encode, in PAGE
    NUMBERS — ground truth for pipeline tests."""
    out = []
    for i in range(n):
        for j in page_links(i, n):
            out.append((i, j))
    return out


def url_id_permutation(n: int) -> list[int]:
    """perm[page_number] = vertex id assigned by the url→id dictionary
    (rank of the page's url in lexicographic order — the contract of
    extract.build_url_ids)."""
    order = sorted(range(n), key=lambda i: page_url(i, n))
    perm = [0] * n
    for rank, page in enumerate(order):
        perm[page] = rank
    return perm


def golden_pages_edge_ids(n: int) -> list[tuple[int, int]]:
    """golden_pages_edges mapped through the url→id permutation — exactly
    what pages_to_edges must produce."""
    perm = url_id_permutation(n)
    return [(perm[s], perm[d]) for s, d in golden_pages_edges(n)]
