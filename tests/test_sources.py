from graphit_spark import LinkGraph
from graphit_spark.sources import (
    read_edge_list,
    read_weighted_edge_list,
    write_edge_list,
)
from graphit_spark.sources.edgelist import read_mtx


def test_el_roundtrip(spark, tmp_path):
    p = tmp_path / "g.el"
    p.write_text("% comment\n# also comment\n0 1\n1 2\n\n2 0\n")
    df = read_edge_list(spark, str(p))
    assert sorted((r["src"], r["dst"]) for r in df.collect()) == [
        (0, 1),
        (1, 2),
        (2, 0),
    ]
    out = tmp_path / "out_el"
    write_edge_list(df, str(out))
    back = read_edge_list(spark, str(out))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_wel(spark, tmp_path):
    p = tmp_path / "g.wel"
    p.write_text("0 1 5\n1 2 3\n")
    df = read_weighted_edge_list(spark, str(p))
    g = LinkGraph(df, persist=False)
    assert g.weighted
    assert sorted(map(tuple, g.edges.collect())) == [(0, 1, 5), (1, 2, 3)]


def test_mtx_one_indexed(spark, tmp_path):
    p = tmp_path / "g.mtx"
    p.write_text("%%MatrixMarket matrix coordinate\n% c\n3 3 2\n1 2\n3 1\n")
    df = read_mtx(spark, str(p))
    assert sorted(map(tuple, df.collect())) == [(0, 1), (2, 0)]
