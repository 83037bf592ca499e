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
