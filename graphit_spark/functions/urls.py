"""URL canonicalization — the web-crawl dedup primitive.

Common-Crawl-style pipelines dedup fetches and merge link-graph mass
by CANONICAL url: the same page is reachable as `HTTP://Example.com`,
`http://example.com:80/`, `http://example.com/?utm_source=x`, and a
link graph built on raw strings splits its PageRank across all of
them. The reference engine takes integer vertex ids as given
(GraphIt loads pre-built edge lists — see builder.h SquishGraph's
dedup, which this step feeds); canonicalization is the step that
MAKES those ids well-defined when the input is a crawl.

Everything here is a native Column expression (whole-stage codegen,
zero UDFs) so it composes into the extraction scan for free. The
canonical form applied, in order:

1. strip the `#fragment`;
2. lowercase the scheme and the host (path/query case preserved —
   paths are case-sensitive per RFC 3986);
3. drop the default port (`:80` for http, `:443` for https), keep
   any other explicit port;
4. strip trailing slashes from the path (`/a/` == `/a`); an empty or
   all-slash path becomes `/`;
5. drop tracking query params (`utm_*`, `gclid=`, `fbclid=`) and
   empty fragments between `&`s, then SORT the survivors — param
   order never changes the resource (`?b=2&a=1` == `?a=1&b=2`);
   an emptied query drops its `?`.

Non-absolute inputs (no `://`) canonicalize to NULL — the caller
decides whether to resolve them against a base url first.

DuckDB twin fragments live next to the query registration in
textqueries.py (same split/sort/filter steps, asserted equal by the
driver's correctness gate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid)="


def url_host(url: Column | str) -> Column:
    """Lowercased host (no port) of an absolute url; NULL when the
    input has no `://`. The host-graph rollup key for real crawls."""
    url = F.col(url) if isinstance(url, str) else url
    rest = F.get(F.split(url, "://", 2), 1)  # NULL when not absolute
    hostport = F.split(rest, "/", 2).getItem(0)
    return F.lower(F.split(hostport, ":", 2).getItem(0))


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute url (see module docstring for the
    exact rules). One nested native expression — no UDF, no shuffle."""
    url = F.col(url) if isinstance(url, str) else url
    u = F.split(url, "#", 2).getItem(0)  # 1. strip fragment
    scheme = F.lower(F.split(u, "://", 2).getItem(0))
    # F.get (not getItem): missing parts yield NULL instead of an ANSI
    # out-of-bounds error when the url is not absolute / has no port
    rest = F.get(F.split(u, "://", 2), 1)
    hostport = F.split(rest, "/", 2).getItem(0)
    # everything after the host: '/path?query' (may be empty)
    pathq = F.substring(rest, F.length(hostport) + F.lit(1), F.length(rest))
    host = F.lower(F.split(hostport, ":", 2).getItem(0))
    port = F.coalesce(F.get(F.split(hostport, ":", 2), 1), F.lit(""))
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    raw_path = F.split(pathq, "[?]", 2).getItem(0)
    query = F.coalesce(F.get(F.split(pathq, "[?]", 2), 1), F.lit(""))
    stripped = F.regexp_replace(raw_path, "/+$", "")  # 4. trailing /
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "")
        & ~x.rlike(TRACKING_PARAM_RE),  # 5. drop tracking params
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    return F.when(
        u.contains("://"),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(
                F.lit("")
            ),
            path,
            F.when(qsorted != "", F.concat(F.lit("?"), qsorted)).otherwise(
                F.lit("")
            ),
        ),
    )  # non-absolute url -> NULL


def canonical_dedup(df, url_col: str = "url", id_col: str = "doc_id"):
    """Group rows by canonical url, keep the minimum id per group (the
    engine's min-id-wins dedup canonical), count the merged variants.
    Returns (canon_url, doc_id, n_variants). Rows whose url fails to
    canonicalize (NULL) are kept as singletons keyed by the raw url.

    Scale shape: the canonicalization is a per-row expression inside
    the scan; the dedup is one short-row groupBy (canon key, two
    aggregates) — map-side combined, same cost class as dedup_exact."""
    canon = df.select(
        F.col(id_col),
        F.coalesce(canonical_url(F.col(url_col)), F.col(url_col)).alias(
            "canon_url"
        ),
    )
    return canon.groupBy("canon_url").agg(
        F.min(id_col).alias(id_col),
        F.count("*").alias("n_variants"),
    )
