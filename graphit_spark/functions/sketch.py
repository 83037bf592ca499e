"""Sketches for crawl-scale pipelines: HyperLogLog distinct counting and
a broadcastable Bloom membership pre-filter (both bit-deterministic).

A 100 TB corpus question — "how many distinct documents / urls are
there?" — must not require the exact-dedup shuffle of one row per
document. HyperLogLog answers it with a fixed 2^p-register state that
partial-aggregates map-side (register merge = elementwise max, which is
exactly what groupBy(bucket).max compiles to), so the shuffle carries at
most 2^p short rows per partition regardless of input size.

Spark ships approx_count_distinct (also HLL), but its estimate is not
reproducible in an external oracle. This implementation is
**bit-deterministic end to end** so the DuckDB twin matches exactly:

- hash: first 15 md5 hex digits as a 60-bit BIGINT (the fingerprint
  contract shared with dedup.py / textqueries.py);
- bucket = low p bits (``h & (m-1)``), w = high ``60-p`` bits
  (``h >> p``) — bit ops only, no float division anywhere;
- rho(w) = position of the first 1-bit of w within its 52-bit width
  (via ``instr(lpad(bin(w)))`` — identical in both engines), 53 if 0;
- the harmonic sum is kept EXACT: sum(2^-reg) scaled by 2^53 is the
  integer sum(1 << (53 - reg)) (reg <= 53, 2^p terms → fits BIGINT),
  so no float-accumulation-order ambiguity exists;
- the estimate is two IEEE ops on exact integers
  (alpha_m * m^2 * 2^53 / sum_scaled), with the standard small-range
  linear-counting correction (m * ln(m / zero_buckets)) when E <= 2.5m
  and empty buckets exist; the final double is rounded to 4 places.

Reference surface: the reference DSL has global reductions
(vector.sum/max, SURVEY.md §2 #28) but no sketches; this extends the
engine for the training-data-pipeline brief (approximate analytics a
user would otherwise bolt on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HLL_P = 8  # 2^8 = 256 registers
HASH_BITS = 60  # 15 md5 hex digits
W_WIDTH = HASH_BITS - HLL_P  # 52 bits of rho material


def _alpha_m2(m: int) -> float:
    """alpha_m * m^2 (Flajolet et al. 2007) — embedded as the same
    literal in the SQL twin, so the estimator arithmetic is identical."""
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def hash60(col: Column) -> Column:
    """60-bit md5 hash (the textqueries fingerprint contract)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(
    df: DataFrame, col: Column, p: int = HLL_P
) -> DataFrame:
    """(bucket, reg) — the 2^p HyperLogLog registers of ``col``, with
    absent buckets materialized as reg 0. One column-pruned scan +
    one groupBy(bucket).max whose map-side partial IS the HLL merge;
    the shuffle is bounded by 2^p rows per input partition at any
    input size."""
    m = 1 << p
    w_width = HASH_BITS - p
    h = hash60(col)
    w = F.shiftright(h, p)
    rho = F.instr(F.lpad(F.bin(w), w_width, "0"), "1")
    rho = F.when(rho == 0, F.lit(w_width + 1)).otherwise(rho)
    regs = (
        df.select(
            (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    all_buckets = df.sparkSession.range(m).select(
        F.col("id").alias("bucket")
    )
    return (
        all_buckets.join(regs, "bucket", "left")
        .select("bucket", F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
    )


def hll_estimate(df: DataFrame, col: Column, p: int = HLL_P) -> DataFrame:
    """Single-row (n_buckets, zero_buckets, sum_scaled, est_distinct):
    the HLL cardinality estimate plus its exact integer internals
    (auditable, and hash-comparable against the SQL twin)."""
    return hll_estimate_from_registers(hll_registers(df, col, p), p=p)


def hll_estimate_from_registers(regs: DataFrame, p: int = HLL_P) -> DataFrame:
    """The estimator over an existing (bucket, reg) register table —
    lets merged sketches (streaming max-merge, cross-corpus union)
    report cardinality without rebuilding from raw rows."""
    m = 1 << p
    w_width = HASH_BITS - p
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({w_width + 1} - reg AS INT))")
    agg = regs.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("reg") == 0).cast("long")).alias("zero_buckets"),
        F.sum(term).alias("sum_scaled"),
    )
    scale = float(1 << (w_width + 1))
    raw = F.lit(_alpha_m2(m)) * F.lit(scale) / F.col("sum_scaled")
    v = F.col("zero_buckets")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        "n_buckets",
        "zero_buckets",
        "sum_scaled",
        F.round(est, 4).alias("est_distinct"),
    )


def hll_grouped(
    df: DataFrame, key, col: Column, p: int = HLL_P
) -> DataFrame:
    """Per-GROUP HyperLogLog: (key, zero_buckets, sum_scaled,
    est_distinct) — the grouped-sketch primitive a crawl pipeline uses
    for "distinct contents per host" / "distinct urls per domain"
    without the exact-distinct shuffle of one row per (key, value).

    100 TB plan: the only shuffle groups on (key, bucket), and the
    register merge (max) partial-aggregates map-side, so the shuffle
    carries at most 2^p rows per key per partition regardless of group
    size. Absent buckets are NEVER materialized (keys × 2^p rows would
    be 10^10+ at crawl scale): since an absent bucket's term is exactly
    2^(w+1), the exact integer harmonic sum is
    sum(present terms) + (m − n_present)·2^(w+1) — computed from the
    per-key present-bucket aggregate alone. The estimator arithmetic is
    identical to hll_estimate (same exact-integer sum, same
    linear-counting branch), so DuckDB twins replay it bit for bit."""
    m = 1 << p
    w_width = HASH_BITS - p
    h = hash60(col)
    w = F.shiftright(h, p)
    rho = F.instr(F.lpad(F.bin(w), w_width, "0"), "1")
    rho = F.when(rho == 0, F.lit(w_width + 1)).otherwise(rho)
    regs = (
        df.select(
            F.col(key) if isinstance(key, str) else key.alias("__key"),
            (h.bitwiseAND(F.lit(m - 1))).alias("bucket"),
            rho.cast("long").alias("rho"),
        )
        # NULL values hash to a NULL bucket; hll_registers drops them
        # via its all-buckets left join, so drop them here too — else
        # the NULL-bucket row inflates __present while contributing no
        # term, skewing zero_buckets/sum_scaled for null-bearing groups
        .filter(F.col("bucket").isNotNull())
        .groupBy(key if isinstance(key, str) else "__key", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    kcol = key if isinstance(key, str) else "__key"
    term = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({w_width + 1} - reg AS INT))"
    )
    per = regs.groupBy(kcol).agg(
        F.count("*").alias("__present"),
        F.sum(term).alias("__s_present"),
    )
    zero = (F.lit(m) - F.col("__present")).cast("long")
    sum_scaled = (
        F.col("__s_present")
        + zero * F.lit(1 << (w_width + 1)).cast("long")
    )
    scale = float(1 << (w_width + 1))
    raw = F.lit(_alpha_m2(m)) * F.lit(scale) / sum_scaled
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zero),
    ).otherwise(raw)
    return per.select(
        F.col(kcol),
        zero.alias("zero_buckets"),
        sum_scaled.alias("sum_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Bloom filter — broadcastable membership pre-filter
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 16  # 65536 bits = 1024 BIGINT words
BLOOM_K = 4


def _bloom_positions(col: Column, k: int, m_bits: int) -> Column:
    """Array of the k bit positions of ``col`` — position j is the
    60-bit md5 of "{value}_{j}" mod m_bits (deterministic, same
    arithmetic as the DuckDB twin)."""
    return F.array(*[
        F.pmod(
            hash60(F.concat_ws("_", col.cast("string"), F.lit(str(j)))),
            F.lit(m_bits),
        )
        for j in range(k)
    ])


def bloom_words(
    df: DataFrame, col: Column, *, k: int = BLOOM_K, m_bits: int = BLOOM_M_BITS
) -> DataFrame:
    """Build the filter: (word long, bits long) — m_bits/64 BIGINT words
    with the k md5-derived bits of every value OR-ed in. The whole
    filter is at most m_bits/64 SHORT rows (1024 by default) — small
    enough to broadcast to every executor no matter how large the
    input that built it was; the build itself is one scan + a
    word-keyed bit_or that partial-aggregates map-side.

    Spark ships ``bloom_filter_agg`` internally, but its bit layout is
    not reproducible in an external engine; this one is deterministic
    md5 arithmetic end to end (same contract as hll_registers).
    """
    pos = F.explode(_bloom_positions(col, k, m_bits)).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
            .alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_prune(
    df: DataFrame,
    col: Column,
    bloom: DataFrame,
    *,
    k: int = BLOOM_K,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Keep only the DISTINCT rows of ``df`` whose ``col`` MIGHT be in
    the set the bloom was built from — never drops a true member
    (duplicated input rows only inflate the per-row hit count, so the
    survival test is ``hits >= k``, monotone under duplication);
    false-positive rate ~(1-e^{-kn/m})^k, and false positives are the
    caller's contract to remove with an exact confirm join. The probe
    is k broadcast-joined word lookups per row — the 100 TB shape: the
    corpus-sized side is scanned once against a ≤ m_bits/64-row
    broadcast table, so the overwhelming share of rows dies before any
    expensive exact join. ``df`` must not use column names __bloom_*.
    """
    probes = (
        df.select("*", F.explode(_bloom_positions(col, k, m_bits))
                  .alias("__bloom_pos"))
        .select(
            "*",
            (F.col("__bloom_pos") / 64).cast("long").alias("__bloom_word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__bloom_pos % 64 AS INT))"
            ).alias("__bloom_mask"),
        )
    )
    b = bloom.select(
        F.col("word").alias("__bloom_word"), F.col("bits").alias("__bloom_bits")
    )
    return (
        probes.join(F.broadcast(b), "__bloom_word")
        .filter(F.expr("(__bloom_bits & __bloom_mask) = __bloom_mask"))
        .groupBy(*df.columns)
        .agg(F.count("*").alias("__bloom_hits"))
        .filter(F.col("__bloom_hits") >= k)
        .drop("__bloom_hits")
    )


# --- Count-Min sketch: frequency estimation in fixed space --------------

CMS_D = 4  # hash rows
CMS_W = 512  # columns per row


def _cms_cell(r_col: Column, tok_col: Column, w: int) -> Column:
    """Column index of token `tok` in hash row `r`: the 60-bit md5
    fingerprint of "r_tok" mod w — same hash contract as hash60, with
    the row index salted into the hashed string so the d rows are
    independent draws (Cormode & Muthukrishnan 2005)."""
    return F.pmod(
        hash60(F.concat_ws("_", r_col.cast("string"), tok_col)), F.lit(w)
    )


def count_min_cells(
    words: DataFrame, tok_col: str = "tok", d: int = CMS_D, w: int = CMS_W
) -> DataFrame:
    """(r, c, cnt) — the d×w Count-Min sketch of a token stream.

    The 100 TB shape: the explode multiplies the stream by d BEFORE the
    groupBy, but map-side partial aggregation collapses every partition
    to ≤ d·w short rows, so the shuffle is O(d·w) per partition at any
    input size — the same bounded-state argument as hll_registers.
    Sketch merge across corpora = cell-wise sum (which is exactly what
    a further groupBy(r, c).sum compiles to). Absent cells are true
    zeros and omitted."""
    rows = words.select(
        F.col(tok_col).alias("tok"),
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    )
    return (
        rows.groupBy("r", _cms_cell(F.col("r"), F.col("tok"), w).alias("c"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimates(
    tokens: DataFrame,
    cells: DataFrame,
    tok_col: str = "tok",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(tok, cms_est) — point estimates min_r sketch[r][c_r(tok)] for
    each probe token. The sketch is ≤ d·w rows, so the probe join is a
    broadcast; estimates are exact integers (never under the true
    count, over only on hash collisions)."""
    probes = tokens.select(
        F.col(tok_col).alias("tok"),
        F.explode(F.array(*[F.lit(r) for r in range(d)])).alias("r"),
    ).select("tok", "r", _cms_cell(F.col("r"), F.col("tok"), w).alias("c"))
    return (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("cms_est"))
    )
