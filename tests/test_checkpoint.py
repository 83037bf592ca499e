"""Resume-mid-algorithm tests (north rule): run k supersteps, "kill",
resume from snapshot, final state identical to the uninterrupted run."""

import numpy as np

from graphit_spark import LinkGraph, SnapshotStore
from graphit_spark.kernels import connected_components, pagerank
from tests.oracles import pagerank_oracle


def _edges():
    import random

    rng = random.Random(17)
    return [(rng.randrange(60), rng.randrange(60)) for _ in range(250)]


def test_snapshot_manifest_lineage(spark, tmp_path):
    g = LinkGraph.from_pairs(spark, _edges(), persist=False)
    store = SnapshotStore(str(tmp_path), "pr")
    pagerank(g, max_iters=3, store=store)
    assert store.complete_iterations() == [0, 1, 2]
    m = store.manifest(2)
    assert m["rows"] == g.num_vertices
    assert m["metrics"]["kernel"] == "pagerank"
    assert sum(m["partitions"].values()) == m["rows"]
    assert m["elapsed_write_sec"] > 0


def test_pagerank_resume_identical(spark, tmp_path):
    edges = _edges()
    g = LinkGraph.from_pairs(spark, edges, persist=False)

    # uninterrupted 10 iters
    full = {r["id"]: r["rank"] for r in pagerank(g, max_iters=10).collect()}

    # interrupted at 4, resumed to 10
    store = SnapshotStore(str(tmp_path), "pr_resume")
    pagerank(g, max_iters=4, store=store)
    assert store.latest() == 3
    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(g, max_iters=10, store=store, resume=True).collect()
    }
    assert store.latest() == 9
    for v in full:
        assert resumed[v] == full[v], v  # byte-identical, not just close

    exp = pagerank_oracle(edges, iters=10)
    got = np.zeros(len(exp))
    for v, r in resumed.items():
        got[v] = r
    assert np.allclose(got, exp, atol=1e-6)


def test_cc_resume(spark, tmp_path):
    edges = _edges()
    g = LinkGraph.from_pairs(spark, edges, persist=False)
    full = {r["id"]: r["comp"] for r in connected_components(g).collect()}

    store = SnapshotStore(str(tmp_path), "cc_resume")
    connected_components(g, max_iters=1, store=store)
    resumed = {
        r["id"]: r["comp"]
        for r in connected_components(g, store=store, resume=True).collect()
    }
    assert resumed == full
