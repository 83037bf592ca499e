"""HTML → (text, links) extraction: the frozen byte-identical contract.

The per-row pure-Python ``reference_extract`` DEFINES the contract
(BASELINE.json input_hint: "byte-identical extracted text per url versus
the reference extractor"); the vectorized Arrow implementations must match
it byte-for-byte and are tested against it property-style.

Contract (frozen — do not change without updating every stored fixture):
  1. html bytes are decoded as UTF-8 with errors='replace';
  2. links = every href attribute value, in document order, matched by
     href="([^"]*)" (double-quoted only);
  3. text = tags ``<[^>]*>`` replaced by a single space, then exactly four
     entities decoded in this order: &lt; → <, &gt; → >, &quot; → ",
     &amp; → & (amp LAST, so double-escapes decode one level only),
     then whitespace runs collapsed to one space and ends stripped.

Two production implementations:
  - ``extract_udfs``: pandas_udf pair (text, links) — Arrow-batched,
    pandas C-level .str regex ops, no per-row Python in the Spark hot
    path (input_hint mandate);
  - ``extract_pages``: the full pipeline step pages → (url, text, links).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

TAG_RE = re.compile(r"<[^>]*>")
HREF_RE = re.compile(r'href="([^"]*)"')
WS_RE = re.compile(r"\s+")

# (pattern, replacement) in contract order — amp LAST
ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&")]


def reference_extract(html: bytes) -> tuple[str, list[str]]:
    """Per-row reference implementation — the contract."""
    s = html.decode("utf-8", errors="replace")
    links = HREF_RE.findall(s)
    text = TAG_RE.sub(" ", s)
    for pat, rep in ENTITIES:
        text = text.replace(pat, rep)
    text = WS_RE.sub(" ", text).strip()
    return text, links


# -- vectorized Arrow implementations -------------------------------------


def _decode_series(html: pd.Series) -> pd.Series:
    return html.map(lambda b: b.decode("utf-8", errors="replace"))


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    s = _decode_series(html)
    s = s.str.replace(TAG_RE, " ", regex=True)
    for pat, rep in ENTITIES:
        s = s.str.replace(pat, rep, regex=False)
    s = s.str.replace(WS_RE, " ", regex=True).str.strip()
    return s


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    s = _decode_series(html)
    return s.str.findall(HREF_RE)


_BOTH_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_BOTH_TYPE)
def extract_both_udf(html: pd.Series) -> pd.DataFrame:
    """text + links in ONE Arrow pass — html is decoded once instead of
    once per UDF (same operations as the two single-column UDFs, so the
    byte-identical contract is unchanged; tests assert all three agree
    with reference_extract)."""
    s = _decode_series(html)
    links = s.str.findall(HREF_RE)
    text = s.str.replace(TAG_RE, " ", regex=True)
    for pat, rep in ENTITIES:
        text = text.str.replace(pat, rep, regex=False)
    text = text.str.replace(WS_RE, " ", regex=True).str.strip()
    return pd.DataFrame({"text": text, "links": links})


ANCHOR_OPEN_RE = re.compile(r'<a href="([^"]*)"[^>]*>')
ANCHOR_CLOSE = "</a>"


def _clean_text(s: str) -> str:
    """The contract's text normalization (tag strip → the four entities
    in order → whitespace collapse) applied to an arbitrary fragment."""
    s = TAG_RE.sub(" ", s)
    for pat, rep in ENTITIES:
        s = s.replace(pat, rep)
    return WS_RE.sub(" ", s).strip()


def reference_extract_anchors(html: bytes) -> list[tuple[str, str]]:
    """Per-row reference for anchor extraction — the companion contract
    to reference_extract (frozen the same way):
      scan openers ``<a href="([^"]*)"[^>]*>`` (double-quoted href) in
      document order; each opener's anchor body runs to the NEAREST
      following ``</a>`` and scanning resumes after it (matched spans
      are consumed, so anchors never nest); an opener with no closer is
      skipped. The body is then normalized by the SAME
      tag/entity/whitespace rules as the main text contract.
    Deliberately a manual scan, not ``<a ...>(.*?)</a>`` findall: the
    lazy-DOTALL regex rescans to end-of-document for EVERY unclosed
    opener (O(openers·len) on truncated crawl HTML, a real executor
    stall risk); this loop is one pass. On well-formed pages the two
    are identical. The href stream is a SUBSET of reference_extract's
    links (only closed ``<a>`` pairs produce anchor text), so edge
    derivation keeps using the cheaper links UDF."""
    import bisect

    s = html.decode("utf-8", errors="replace")
    # all closer positions up front (one pass) — a per-opener s.find()
    # would rescan to EOF for every closer-less opener, which is the
    # exact quadratic blowup this implementation exists to avoid
    closers: list[int] = []
    c = s.find(ANCHOR_CLOSE)
    while c != -1:
        closers.append(c)
        c = s.find(ANCHOR_CLOSE, c + 1)
    out: list[tuple[str, str]] = []
    pos = 0
    while True:
        m = ANCHOR_OPEN_RE.search(s, pos)
        if m is None:
            break
        j = bisect.bisect_left(closers, m.end())
        if j == len(closers):
            pos = m.end()
            continue
        end = closers[j]
        out.append((m.group(1), _clean_text(s[m.end():end])))
        pos = end + len(ANCHOR_CLOSE)
    return out


_ANCHOR_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("href", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)


@F.pandas_udf(_ANCHOR_TYPE)
def extract_anchors_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched anchors: one decode per batch, then the SAME
    linear scan as the reference (shared code → byte-identical by
    construction; no Spark-row Python — the per-document loop is the
    contract's single pass, Arrow only batches the transfer)."""
    return html.map(
        lambda b: [
            {"href": href, "anchor": anchor}
            for href, anchor in reference_extract_anchors(b)
        ]
    )


def anchor_terms(pages: DataFrame, url_ids: DataFrame) -> DataFrame:
    """Inlink anchor-term index: (dst, term, n) — for every page, the
    terms other pages use when linking TO it, the classic web-search
    relevance signal (anchor text describes the target better than the
    target describes itself). Composition: anchors UDF → explode →
    target-id join (the url dictionary) → whitespace term explode →
    map-side-combined count. Targets outside the dictionary are
    dropped (same universe rule as pages_to_edges)."""
    flat = pages.select(
        F.explode(extract_anchors_udf("html")).alias("a")
    ).select(
        F.col("a.href").alias("target"), F.col("a.anchor").alias("anchor")
    )
    dst_ids = url_ids.select(
        F.col("url").alias("target"), F.col("id").alias("dst")
    )
    return (
        flat.join(dst_ids, "target")
        .select(
            "dst",
            F.explode(
                F.split(F.lower(F.trim(F.col("anchor"))), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("dst", "term")
        .agg(F.count("*").alias("n"))
    )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → (url, text, links).

    ``text`` is recomputed from html with the vectorized UDF — writers can
    cross-check it against the stored column (byte-identical invariant)."""
    return pages.select(
        "url", extract_both_udf("html").alias("e")
    ).select("url", F.col("e.text").alias("text"), F.col("e.links").alias("links"))


def build_url_ids(extracted: DataFrame) -> DataFrame:
    """Deterministic url → id dictionary: dense ids [0, n) assigned by
    lexicographic url order (row_number over sorted distinct urls —
    SURVEY.md §7 step 2). The universe includes every url seen as either a
    page or a link target, so dangling targets get ids too.

    Scale: dense numbering runs as a range-partitioned sort with
    per-partition offsets (plans/ranking.py) — no single-task global
    Window, so the dictionary build scales to 10^12 urls."""
    from graphit_spark.plans.ranking import dense_rank_ids

    urls = (
        extracted.select(F.col("url"))
        .unionByName(extracted.select(F.explode("links").alias("url")))
        .distinct()
    )
    return dense_rank_ids(urls, [F.asc("url")], out_col="id").select("url", "id")


def pages_to_edges(pages: DataFrame, url_ids: DataFrame | None = None):
    """The full ingest: pages → squish-ready edge list (src, dst) plus the
    url↔id dictionary. Returns (edges_df, url_ids_df).

    Edge derivation needs only the LINKS half of the extraction (text is
    recomputed/validated separately via extract_pages), so this runs the
    links UDF alone — no tag-strip/entity/whitespace regex chain — and
    materializes the exploded (url, target) pairs so the Arrow extraction
    executes once, not once per downstream consumer (the url universe
    and the edge join both read it; page urls come straight from the
    source column, no UDF). localCheckpoint instead of persist(): the
    blocks are freed by the ContextCleaner once the caller drops the
    result, so repeated one-shot calls don't accumulate cached RDDs."""
    flat = pages.select(
        "url", F.explode(extract_links_udf("html")).alias("target")
    ).localCheckpoint(eager=True)
    if url_ids is None:
        from graphit_spark.plans.ranking import dense_rank_ids

        urls = (
            pages.select("url")
            .unionByName(flat.select(F.col("target").alias("url")))
            .distinct()
        )
        url_ids = dense_rank_ids(urls, [F.asc("url")], out_col="id").select(
            "url", "id"
        )
    src_ids = url_ids.withColumnRenamed("id", "src")
    dst_ids = url_ids.select(
        F.col("url").alias("target"), F.col("id").alias("dst")
    )
    edges = (
        flat.join(src_ids, "url")
        .join(dst_ids, "target")
        .select("src", "dst")
    )
    return edges, url_ids
