"""Parity against the REFERENCE RUNTIME ITSELF (the strongest oracle):
tests/ref_outputs/reference_kernel_outputs.json holds per-vertex outputs
produced by a harness compiled against the reference's header-only
runtime (GAPBS loader — exact SquishGraph semantics) executing the
pagerank.gt / cc.gt / sssp.gt / tc.gt formulas on the reference's own
test graphs (test/graphs/4.el, 4_sym.el, 4.wel, rmat10.el). Our engine
reads the SAME files through its own .el/.wel readers and must
reproduce them: PR allclose 1e-6 (north rule), CC/SSSP/TC exact."""

import json
import os

import pytest
from pyspark.sql import functions as F

from graphit_spark import LinkGraph
from graphit_spark.kernels import (
    connected_components,
    pagerank,
    sssp,
    triangle_count,
)
from graphit_spark.sources.edgelist import (
    read_edge_list,
    read_weighted_edge_list,
)

GRAPH_DIR = "/root/reference/test/graphs"
FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "ref_outputs",
    "reference_kernel_outputs.json",
)

needs_reference = pytest.mark.skipif(
    not os.path.isdir(GRAPH_DIR), reason="reference graphs not available"
)


@pytest.fixture(scope="module")
def fix():
    with open(FIXTURE) as f:
        return json.load(f)


def _graph(spark, name):
    reader = read_weighted_edge_list if name.endswith(".wel") else read_edge_list
    return LinkGraph(reader(spark, f"{GRAPH_DIR}/{name}"), persist=False)


@needs_reference
@pytest.mark.parametrize("graph_name", ["4.el", "4_sym.el", "rmat10.el"])
def test_pagerank_matches_reference_runtime(spark, fix, graph_name):
    g = _graph(spark, graph_name)
    want = {int(k): v for k, v in fix[graph_name]["pr"].items()}
    got = {r["id"]: r["rank"]
           for r in pagerank(g, max_iters=fix[graph_name]["pr_iters"]).collect()}
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst <= 1e-6, f"max |d_rank| = {worst}"  # north-rule tolerance
    assert worst <= 1e-12, f"max |d_rank| = {worst}"  # actual precision


@needs_reference
def test_cc_directed_matches_reference_runtime(spark, fix):
    """cc.gt semantics verbatim: min-label propagation over the edges AS
    STORED (no symmetrize) — fixpoint is min-id-that-reaches-v."""
    for graph_name in ["4.el", "rmat10.el"]:
        g = _graph(spark, graph_name)
        want = {int(k): v for k, v in fix[graph_name]["cc_directed"].items()}
        got = {r["id"]: r["comp"]
               for r in connected_components(g, symmetrize=False).collect()}
        assert got == want, graph_name


@needs_reference
def test_cc_symmetric_matches_reference_runtime(spark, fix):
    """The reference's own CC verification input (4_sym.el, GAPBS -s)."""
    g = _graph(spark, "4_sym.el")
    want = {int(k): v for k, v in fix["4_sym.el"]["cc"].items()}
    got = {r["id"]: r["comp"] for r in connected_components(g).collect()}
    assert got == want


@needs_reference
def test_tc_matches_reference_runtime(spark, fix):
    """tc_verifier.cpp ground truth on 4_sym.el; our kernel symmetrizes
    internally, so the raw 4.el must give the same count."""
    want = fix["4_sym.el"]["tc"]
    for graph_name in ["4_sym.el", "4.el"]:
        g = _graph(spark, graph_name)
        got = triangle_count(g).collect()[0]["triangles"]
        assert got == want, graph_name


@needs_reference
def test_sssp_matches_reference_runtime(spark, fix):
    g = _graph(spark, "4.wel")
    inf = fix["4.wel"]["sssp_inf"]
    want = {int(k): (None if v == inf else v)
            for k, v in fix["4.wel"]["sssp"].items()}
    got = {r["id"]: r["dist"]
           for r in sssp(g, fix["4.wel"]["sssp_source"], max_iters=100).collect()}
    assert got == want


@needs_reference
@pytest.mark.parametrize("graph_name", ["4.el", "rmat10.el"])
def test_bfs_matches_reference_runtime(spark, fix, graph_name):
    from graphit_spark.kernels import bfs

    g = _graph(spark, graph_name)
    want = {int(k): (None if v == -1 else v)
            for k, v in fix[graph_name]["bfs"].items()}
    got = {r["id"]: r["dist"]
           for r in bfs(g, fix[graph_name]["bfs_source"], max_iters=100).collect()}
    assert got == want


@needs_reference
@pytest.mark.parametrize("graph_name", ["4.el", "rmat10.el"])
def test_pagerank_delta_matches_reference_runtime(spark, fix, graph_name):
    """pagerankdelta.gt verbatim, INCLUDING the epsilon2 frontier
    threshold — the float comparison that decides frontier membership
    agrees because both sides compute the same per-vertex arithmetic."""
    from graphit_spark.kernels import pagerank_delta

    g = _graph(spark, graph_name)
    want = {int(k): v for k, v in fix[graph_name]["prd"].items()}
    got = {r["id"]: r["rank"]
           for r in pagerank_delta(
               g, max_iters=fix[graph_name]["prd_rounds"]).collect()}
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want)
    assert worst <= 1e-6, f"max |d_rank| = {worst}"


@needs_reference
@pytest.mark.parametrize("graph_name,source", [("4.el", 0), ("rmat10.el", 3)])
def test_bc_matches_reference_runtime(spark, fix, graph_name, source):
    """bc.gt verbatim (inverse-sigma backward accumulation). The
    reference leaves the source's own total dependency on the source;
    this kernel reports 0 there (verifier convention) — every other
    vertex must match."""
    from graphit_spark.kernels import betweenness_centrality

    g = _graph(spark, graph_name)
    want = {int(k): v for k, v in fix[graph_name][f"bc_source_{source}"].items()}
    got = {r["id"]: r["bc"]
           for r in betweenness_centrality(g, source).collect()}
    assert set(got) == set(want)
    worst = max(abs(got[v] - want[v]) for v in want if v != source)
    assert worst <= 1e-9, f"max |d_bc| = {worst}"


@needs_reference
def test_delta_stepping_matches_reference_runtime(spark, fix):
    """Ordered schedule changes work order, not the fixpoint (CGO 2020
    claim) — delta-stepping must land on the same Bellman-Ford
    distances the reference runtime computed."""
    from graphit_spark.kernels import sssp_delta_stepping

    g = _graph(spark, "4.wel")
    inf = fix["4.wel"]["sssp_inf"]
    want = {int(k): (None if v == inf else v)
            for k, v in fix["4.wel"]["sssp"].items()}
    got = {r["id"]: r["dist"]
           for r in sssp_delta_stepping(
               g, fix["4.wel"]["sssp_source"], delta=3).collect()}
    assert got == want


@needs_reference
@pytest.mark.parametrize("target", [5, 11])
def test_astar_target_matches_reference_runtime(spark, fix, target):
    from graphit_spark.kernels import astar

    g = _graph(spark, "4.wel")
    inf = fix["4.wel"]["sssp_inf"]
    want = fix["4.wel"]["sssp"][str(target)]
    want = None if want == inf else want
    got = {r["id"]: r["dist"]
           for r in astar(g, fix["4.wel"]["sssp_source"], target, delta=3).collect()}
    assert got[target] == want


@needs_reference
@pytest.mark.parametrize("graph_name", ["4.el", "rmat10.el"])
def test_eigenvector_matches_reference_runtime(spark, fix, graph_name):
    """eigenvector_centrality.gt: 9 un-normalized power iterations.
    (Fixture computed in double; the reference declares float32 vectors,
    a codegen type choice — the formula is what parity checks.)"""
    from graphit_spark.kernels import eigenvector_centrality

    g = _graph(spark, graph_name)
    want = {int(k): v for k, v in fix[graph_name]["ec"].items()}
    got = {r["id"]: r["ec"]
           for r in eigenvector_centrality(
               g, rounds=fix[graph_name]["ec_rounds"]).collect()}
    assert set(got) == set(want)
    worst = max(
        abs(got[v] - want[v]) / max(abs(want[v]), 1e-30) for v in want
    )
    assert worst <= 1e-9, f"max rel err = {worst}"


@needs_reference
def test_closeness_matches_reference_runtime(spark, fix):
    """closeness_centrality_weighted.gt on its dedicated graph
    (test_closeness_sssp.wel, source 3): per-vertex distances with
    unreached mapped to 0, and the printed sum-of-distances scalar."""
    from graphit_spark.kernels import closeness_centrality, closeness_score

    g = _graph(spark, "test_closeness_sssp.wel")
    spec = fix["test_closeness_sssp.wel"]
    want = {int(k): (0 if v == spec["inf"] else v)
            for k, v in spec["sssp"].items()}
    got = {r["id"]: r["dist"]
           for r in closeness_centrality(g, spec["source"]).collect()}
    assert got == want
    assert closeness_score(g, spec["source"]) == spec["closeness_sum"]


def test_sweepcut_best_cut_matches_reference(spark):
    """serialSweepCut parity on the reference's own graphs: with unique
    scores (deg + id*1e-6) the best_cut index is well-defined; the
    fixture records it from the compiled reference runtime (see
    _provenance — the reference's returned member array is an
    unsorted-copy artifact, so the SIZE is the checkable contract)."""
    import json
    import os

    from pyspark.sql import functions as F

    from graphit_spark import LinkGraph
    from graphit_spark.kernels import sweep_cut
    from graphit_spark.sources import read_edge_list

    fix = json.load(
        open(os.path.join(os.path.dirname(__file__), "ref_outputs",
                          "sweepcut_reference.json"))
    )
    for gname in ("4.el", "rmat10.el"):
        g = LinkGraph(
            read_edge_list(spark, f"/root/reference/test/graphs/{gname}"),
            persist=False,
        )
        assert g.num_vertices == fix[gname]["n"]
        assert g.num_edges == fix[gname]["m"]
        vals = g.out_degrees().select(
            "id",
            (F.col("out_degree") + F.col("id") * F.lit(1e-6)).alias("val"),
        )
        metrics = {}
        cut = sweep_cut(g, vals, metrics_out=metrics)
        assert cut.count() == fix[gname]["cut_size"], gname
        assert metrics["best_cut"] == fix[gname]["cut_size"], gname


def test_msf_total_weight_matches_reference_prim(spark):
    """serialMinimumSpanningTree parity: the reference's lazy Prim and
    our distributed Boruvka must agree on total weight (every MST of a
    graph shares the weight multiset) and tree size on the connected
    symmetric fixture graph."""
    import json
    import os

    from graphit_spark import LinkGraph
    from graphit_spark.kernels import minimum_spanning_forest

    fix = json.load(
        open(os.path.join(os.path.dirname(__file__), "ref_outputs",
                          "mst_reference.json"))
    )
    pairs = [(u, v, w) for u, v, w in fix["edges"]]
    pairs += [(v, u, w) for u, v, w in fix["edges"]]
    g = LinkGraph.from_pairs(spark, pairs, persist=False)
    forest = minimum_spanning_forest(g).collect()
    assert len(forest) == fix["ref_tree_edges"]
    assert sum(r["weight"] for r in forest) == fix["ref_total_weight"]


def test_cf_latents_match_reference(spark):
    """cf.gt parity: 10 GD iterations on the reference's own 4.wel —
    per-vertex latent[0] and vertex 0's full K-vector allclose 1e-9
    (sum-order noise enters scaled by step=3.5e-7)."""
    import json
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from graphit_spark import LinkGraph
    from graphit_spark.kernels import collaborative_filtering
    from graphit_spark.sources import read_weighted_edge_list

    fix = json.load(
        open(os.path.join(os.path.dirname(__file__), "ref_outputs",
                          "cf_reference.json"))
    )
    g = LinkGraph(
        read_weighted_edge_list(
            spark, "/root/reference/test/graphs/4.wel"
        ),
        persist=False,
    )
    assert g.num_vertices == fix["n"]
    rows = {
        r["id"]: r["latent"]
        for r in collaborative_filtering(g, iters=10).collect()
    }
    got0 = np.array([rows[v][0] for v in range(fix["n"])])
    assert np.allclose(got0, np.array(fix["latent0"]), atol=1e-9)
    assert np.allclose(
        np.array(rows[0]), np.array(fix["latent_v0"]), atol=1e-9
    )


@needs_reference
@pytest.mark.parametrize("graph_name", ["4_sym.el", "rmat10.el"])
def test_core_decomposition_matches_reference_runtime(spark, graph_name):
    """apps/k_core.gt (Julienne lazy buckets: priority = out-degree,
    decrements clamped at the dequeue level — the dequeue priority IS
    the core number) against our synchronous-peel core_decomposition.
    Both fixture inputs are symmetric edge lists, so the unique peel
    fixpoint equals undirected coreness and our kernel's symmetrize is
    an identity (modulo the shared squish semantics). Fixture:
    tests/ref_outputs/kcore_reference.json (see its _provenance)."""
    from graphit_spark.kernels import core_decomposition

    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "ref_outputs",
            "kcore_reference.json",
        )
    ) as f:
        want = json.load(f)[graph_name]["core"]
    g = _graph(spark, graph_name)
    got = {r["id"]: r["core"] for r in core_decomposition(g).collect()}
    assert len(got) == len(want)
    mism = {v: (got[v], want[v]) for v in got if got[v] != want[v]}
    assert not mism, f"core mismatches: {dict(list(mism.items())[:5])}"


@needs_reference
@pytest.mark.parametrize("graph_name", ["4_sym.el", "4.el", "rmat10.el"])
def test_set_cover_matches_reference_runtime(spark, graph_name):
    """apps/set_cover.gt + set_cover_extern.cpp (Julienne MaxCover).
    The extern's stale-bucket dequeue sequence and our fresh-bucket
    rounds visit the same EFFECTIVE rounds (a stale bucket's members
    repack below k and are filtered by the ceil(1.01^k) threshold, so
    still_active = {true bucket == k} on both sides), and writeMin
    min-set-id acquisition makes the admitted cover unique — the cover
    SET must match exactly. Fixture:
    tests/ref_outputs/setcover_reference.json (see _provenance)."""
    from graphit_spark.kernels import set_cover

    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "ref_outputs",
            "setcover_reference.json",
        )
    ) as f:
        want = json.load(f)[graph_name]["cover"]
    g = _graph(spark, graph_name)
    got = sorted(r["set_id"] for r in set_cover(g).collect())
    assert got == want
