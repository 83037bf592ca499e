"""Vertexset operator tests (SURVEY §2.6; reference vertexsubset.h,
intrinsics.h:466-621, mir.h:844 IntersectionExpr)."""

from pyspark.sql import functions as F

from graphit_spark.vertexset import (
    add_vertex,
    difference_vertexsets,
    empty_vertexset,
    full_vertexset,
    intersection_size,
    union_vertexsets,
    vertexset_filter,
    vertexset_size,
)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_empty_and_full(spark):
    assert vertexset_size(empty_vertexset(spark)) == 0
    assert _ids(full_vertexset(spark, 5)) == [0, 1, 2, 3, 4]


def test_add_vertex_idempotent(spark):
    s = add_vertex(empty_vertexset(spark), 3)
    s = add_vertex(s, 3)
    s = add_vertex(s, 7)
    assert _ids(s) == [3, 7]


def test_filter_and_setops(spark):
    verts = spark.range(10).select(
        F.col("id").cast("long").alias("id"), (F.col("id") % 2).alias("par")
    )
    evens = vertexset_filter(verts, F.col("par") == 0)
    odds = vertexset_filter(verts, F.col("par") == 1)
    assert _ids(evens) == [0, 2, 4, 6, 8]
    assert intersection_size(evens, odds) == 0
    assert intersection_size(evens, full_vertexset(spark, 5)) == 3  # 0,2,4
    assert _ids(union_vertexsets(evens, odds)) == list(range(10))
    assert _ids(difference_vertexsets(full_vertexset(spark, 4), evens)) == [1, 3]
