"""dense_rank_ids must equal the single-partition global row_number."""

import random

from pyspark.sql import functions as F

from graphit_spark.plans.ranking import dense_rank_ids


def test_matches_global_row_number(spark):
    rng = random.Random(42)
    rows = [(i, rng.randrange(100)) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, deg long")
    got = {
        r["id"]: r["rank"]
        for r in dense_rank_ids(
            df, [F.desc("deg"), F.asc("id")], out_col="rank", num_partitions=7
        ).collect()
    }
    exp = {
        t[0]: i
        for i, t in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))
    }
    assert got == exp


def test_empty(spark):
    df = spark.range(0).select(F.col("id").cast("long").alias("id"))
    assert dense_rank_ids(df, [F.asc("id")], out_col="r").count() == 0
