"""HyperLogLog sketch: accuracy, merge algebra, and plan shape.

Exact-value parity with the DuckDB twin is covered by tests/test_entry.py
(hll_registers / hll_distinct registry entries); here we test the sketch
semantics themselves."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphit_spark.functions import sketch as K

SF_DIR = os.environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")


def test_hll_estimate_within_rse(spark):
    """Standard error of HLL with m=256 is 1.04/sqrt(m) ~= 6.5%; a
    deterministic single draw should land well within 4 sigma."""
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("doc-"), F.col("id")).alias("t"))
    row = K.hll_estimate(df, F.col("t")).collect()[0]
    est = row["est_distinct"]
    assert abs(est - n) / n < 0.26
    assert row["n_buckets"] == 1 << K.HLL_P


def test_hll_registers_merge_is_elementwise_max(spark):
    """The scale contract: sketching the union == elementwise max of the
    parts' registers (this is what makes the map-side partial agg a
    correct distributed merge)."""
    a = spark.range(0, 2000).select(F.concat(F.lit("x"), F.col("id")).alias("t"))
    b = spark.range(1500, 4000).select(F.concat(F.lit("x"), F.col("id")).alias("t"))
    ra = {r["bucket"]: r["reg"] for r in K.hll_registers(a, F.col("t")).collect()}
    rb = {r["bucket"]: r["reg"] for r in K.hll_registers(b, F.col("t")).collect()}
    ru = {
        r["bucket"]: r["reg"]
        for r in K.hll_registers(a.union(b), F.col("t")).collect()
    }
    assert ru == {k: max(ra[k], rb[k]) for k in ra}


def test_hll_estimate_small_range_correction(spark):
    """With n << m the linear-counting branch fires (zero buckets
    present) and still estimates within a few percent."""
    n = 30
    df = spark.range(n).select(F.concat(F.lit("s"), F.col("id")).alias("t"))
    row = K.hll_estimate(df, F.col("t")).collect()[0]
    assert row["zero_buckets"] > 0
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_hll_shuffle_is_bounded(spark):
    """The register aggregation must show a map-side partial max — the
    property that bounds the shuffle at 2^p rows per partition."""
    df = spark.range(10000).select(F.concat(F.lit("d"), F.col("id")).alias("t"))
    plan = K.hll_registers(df, F.col("t"))._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan


class TestBloom:
    def test_no_false_negatives_and_prunes(self, spark):
        """Every member survives the prune; the non-member survivor set
        (false positives) is a sliver at n=2000, m=65536, k=4."""
        members = spark.range(2000).select(
            F.concat(F.lit("m-"), F.col("id")).alias("v")
        )
        bloom = K.bloom_words(members, F.col("v"))
        # words table is broadcast-sized by construction
        assert bloom.count() <= K.BLOOM_M_BITS // 64
        probe = spark.range(10000).select(
            F.when(F.col("id") < 2000, F.concat(F.lit("m-"), F.col("id")))
            .otherwise(F.concat(F.lit("x-"), F.col("id"))).alias("v")
        )
        kept = set(r["v"] for r in K.bloom_prune(probe, F.col("v"), bloom).collect())
        missing = [f"m-{i}" for i in range(2000) if f"m-{i}" not in kept]
        assert missing == []  # bloom contract: no false negatives
        fps = sum(1 for v in kept if v.startswith("x-"))
        # (1-e^{-kn/m})^k at k=4, n=2000, m=65536 ≈ 1.6e-4 → E[fp] ≈ 1.3
        assert fps < 40

    def test_duplicated_rows_survive(self, spark):
        """The >= k survival test is monotone under row duplication —
        a duplicated member row must not be dropped (the == k form
        would double-count probe hits and lose it)."""
        members = spark.createDataFrame([("a",)], "v string")
        bloom = K.bloom_words(members, F.col("v"))
        dup = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
        kept = sorted(r["v"] for r in K.bloom_prune(dup, F.col("v"), bloom).collect())
        assert "a" in kept

    def test_decontaminate_bloom_equals_exact(self, spark):
        """The bloom-pruned decontamination query is output-identical
        to the exact one (no false negatives + exact confirm join)."""
        from graphit_spark.textqueries import q_decontaminate, q_decontaminate_bloom

        exact = {
            (r["doc_id"], r["n_shared_13grams"])
            for r in q_decontaminate(spark, SF_DIR).collect()
        }
        pruned = {
            (r["doc_id"], r["n_shared_13grams"])
            for r in q_decontaminate_bloom(spark, SF_DIR).collect()
        }
        assert pruned == exact and len(exact) > 0


class TestCountMin:
    def _stream(self, spark):
        # zipf-ish: token k appears ~ 600/k times, k = 1..30
        rows = []
        for k in range(1, 31):
            rows += [(f"tok{k:02d}",)] * (600 // k)
        return spark.createDataFrame(rows, "tok string")

    def test_never_underestimates_and_tight_without_collisions(self, spark):
        words = self._stream(spark)
        cells = K.count_min_cells(words)
        exact = {
            r["tok"]: r["cnt"]
            for r in words.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
        }
        est = {
            r["tok"]: r["cms_est"]
            for r in K.cms_estimates(
                words.select("tok").distinct(), cells
            ).collect()
        }
        assert set(est) == set(exact)
        for t, e in exact.items():
            assert est[t] >= e, t
            # 30 distinct tokens in 4x512 cells: collisions essentially
            # impossible, the min row is exact
            assert est[t] == e, t

    def test_merge_is_cellwise_sum(self, spark):
        a = self._stream(spark)
        b = spark.createDataFrame([("tok01",)] * 50 + [("new",)] * 9, "tok string")
        def grid(df):
            return {
                (r["r"], r["c"]): r["cnt"]
                for r in K.count_min_cells(df).collect()
            }
        ga, gb, gu = grid(a), grid(b), grid(a.unionAll(b))
        for key in set(ga) | set(gb):
            assert gu[key] == ga.get(key, 0) + gb.get(key, 0), key

    def test_bounded_cell_grid(self, spark):
        words = self._stream(spark)
        cells = K.count_min_cells(words).collect()
        assert all(0 <= r["r"] < K.CMS_D for r in cells)
        assert all(0 <= r["c"] < K.CMS_W for r in cells)
        assert len(cells) <= K.CMS_D * K.CMS_W


class TestHllGrouped:
    """Per-group HyperLogLog (round 4): the grouped-sketch primitive —
    per-key estimates within the sketch's error, equivalence with the
    global estimator on each key's slice (absent-bucket fold is exact),
    and the bounded-shuffle plan property."""

    def _df(self, spark):
        # 3 hosts with very different distinct-content counts; host b
        # repeats the same 40 texts many times
        a = spark.range(3000).select(
            F.lit("a").alias("source"),
            F.concat(F.lit("ax"), F.col("id")).alias("text"),
        )
        b = spark.range(2000).select(
            F.lit("b").alias("source"),
            F.concat(F.lit("bx"), F.pmod(F.col("id"), F.lit(40))).alias("text"),
        )
        c = spark.range(300).select(
            F.lit("c").alias("source"),
            F.concat(F.lit("cx"), F.col("id")).alias("text"),
        )
        return a.union(b).union(c)

    def test_per_group_estimates_within_error(self, spark):
        rows = {
            r["source"]: r
            for r in K.hll_grouped(self._df(spark), "source", F.col("text")).collect()
        }
        for src, n in (("a", 3000), ("b", 40), ("c", 300)):
            est = rows[src]["est_distinct"]
            assert abs(est - n) / n < 0.26, (src, est)

    def test_equals_global_estimator_per_slice(self, spark):
        """hll_grouped(key) on the union == hll_estimate on each key's
        slice: the absent-bucket fold reproduces the materialized-
        register sum exactly (same sum_scaled, same estimate)."""
        df = self._df(spark)
        grouped = {
            r["source"]: r
            for r in K.hll_grouped(df, "source", F.col("text")).collect()
        }
        for src in ("a", "b", "c"):
            solo = K.hll_estimate(
                df.filter(F.col("source") == src), F.col("text")
            ).collect()[0]
            assert grouped[src]["sum_scaled"] == solo["sum_scaled"]
            assert grouped[src]["zero_buckets"] == solo["zero_buckets"]
            assert grouped[src]["est_distinct"] == solo["est_distinct"]

    def test_shuffle_is_bounded_and_partial(self, spark):
        plan = (
            K.hll_grouped(self._df(spark), "source", F.col("text"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "partial_max" in plan  # register merge combines map-side

    def test_null_values_are_dropped_like_global(self, spark):
        """NULL values hash to a NULL bucket; the grouped estimator
        must drop them exactly as hll_registers' all-buckets join does
        — the per-slice equivalence contract includes null-bearing
        groups."""
        df = self._df(spark).union(
            spark.createDataFrame(
                [("a", None), ("c", None), ("c", None)],
                "source string, text string",
            )
        )
        grouped = {
            r["source"]: r
            for r in K.hll_grouped(df, "source", F.col("text")).collect()
        }
        for src in ("a", "c"):
            solo = K.hll_estimate(
                df.filter(F.col("source") == src), F.col("text")
            ).collect()[0]
            assert grouped[src]["sum_scaled"] == solo["sum_scaled"]
            assert grouped[src]["est_distinct"] == solo["est_distinct"]
