"""Autotuner tests (graphit_spark/tune.py — the reference
autotune/graphit_autotuner.py analogue).

Wall-clock on this shared host swings 4-5x minute to minute
(BENCH/BASELINE.md capacity probe), so a "fast config beats slow
config" timing assertion would be weather, not a test. Instead:

- the deterministic structural pruning is asserted directly: two
  synthetic graphs with different skew/density produce DIFFERENT
  candidate spaces, and a deterministic injected cost function then
  picks DIFFERENT winners — the input-dependence the reference tuner
  exists for;
- the real measured path runs as a smoke test (shape + winner-from-
  space assertions only, no timing comparison).
"""

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphit_spark.graph import LinkGraph
from graphit_spark.tune import (
    ADJACENCY_MAX_DEGREE_CAP,
    BROADCAST_VERTEX_CAP,
    autotune,
    candidate_schedules,
    measure_stats,
)


def _uniform_graph(spark, n=400, deg=8):
    """Every vertex has out-degree `deg`: dense-ish, no skew."""
    e = spark.range(n).select(
        F.col("id").alias("src"), F.explode(F.sequence(F.lit(1), F.lit(deg))).alias("k")
    ).select("src", ((F.col("src") + F.col("k") * 7) % n).alias("dst"))
    return LinkGraph(e, persist=False)


def _skewed_graph(spark, n=400):
    """Hub vertex 0 links to everyone; everyone else has out-degree 1:
    max_degree ≈ n, avg ≈ 2 — high skew, low density."""
    hub = spark.range(1, n).select(
        F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
    )
    chain = spark.range(1, n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    return LinkGraph(hub.union(chain), persist=False)


def test_stats_capture_skew(spark):
    u = measure_stats(_uniform_graph(spark))
    s = measure_stats(_skewed_graph(spark))
    assert u.skew < 3
    assert s.skew > 32
    assert s.max_degree >= 398


def test_candidate_spaces_differ_by_graph(spark):
    """The pruning rules are input-dependent, like the reference tuner's
    per-graph schedule search: the low-degree skewed graph loses the
    adjacency-scatter candidates (density rule), and the bfs threshold
    candidates flip from lazier (50) to eager (10) dense-switching."""
    u = measure_stats(_uniform_graph(spark))
    s = measure_stats(_skewed_graph(spark))

    pu = candidate_schedules(u, "pagerank", parallelism=8)
    ps = candidate_schedules(s, "pagerank", parallelism=8)
    assert any(c["use_adjacency"] for c in pu)  # avg degree 8 ≥ 4
    assert not any(c["use_adjacency"] for c in ps)  # avg degree ~2 < 4
    # both are under the broadcast cap: broadcast must be admissible
    assert any(c["join_strategy"] == "broadcast" for c in pu)

    bu = candidate_schedules(u, "bfs", parallelism=8)
    bs = candidate_schedules(s, "bfs", parallelism=8)
    assert {c["threshold_fraction"] for c in bu} == {20, 50}
    assert {c["threshold_fraction"] for c in bs} == {20, 10}


def test_big_graph_rules_without_timing():
    """Pure-pruning regimes that small test graphs can't reach, driven
    through synthetic stats: over the broadcast vertex cap the broadcast
    build disappears (driver-serialization rule) and a mega-hub kills
    the adjacency wide-row candidates."""
    from graphit_spark.tune import GraphStats

    big = GraphStats(
        num_vertices=BROADCAST_VERTEX_CAP * 10,
        num_edges=10**8, avg_degree=20.0,
        max_degree=ADJACENCY_MAX_DEGREE_CAP * 2,
        skew=1e5, mean_weight=None,
    )
    cands = candidate_schedules(big, "pagerank", parallelism=32)
    assert not any(c["join_strategy"] == "broadcast" for c in cands)
    assert any(c["join_strategy"] == "merge" for c in cands)
    assert not any(c["use_adjacency"] for c in cands)
    # m/parallelism >> target rows/partition: a wider candidate appears
    assert any(c["shuffle_partitions"] > 32 for c in cands)


def test_autotune_picks_cost_argmin_and_writes_json(spark, tmp_path):
    """With an injected deterministic cost the search must return the
    argmin and the JSON report the bench harness consumes."""
    g = _uniform_graph(spark)

    def cost(_g, _kernel, config, _rounds):
        # cheapest: 8 partitions, shuffle_hash, no adjacency
        return (
            config["shuffle_partitions"]
            + (0 if config["join_strategy"] == "shuffle_hash" else 100)
            + (50 if config["use_adjacency"] else 0)
        )

    out = str(tmp_path / "tuned.json")
    rep = autotune(g, "pagerank", measure_fn=cost, out_path=out)
    assert rep["best"] == {
        "shuffle_partitions": 8,
        "join_strategy": "shuffle_hash",
        "use_adjacency": False,
    }
    assert len(rep["candidates"]) >= 4
    on_disk = json.load(open(out))
    assert on_disk["best"] == rep["best"]
    assert on_disk["stats"]["num_edges"] == g.num_edges


def test_autotune_real_measurement_smoke(spark):
    """The measured path end to end on a tiny graph: winner comes from
    the space, every candidate got a finite time, and the session's
    shuffle-partition conf is restored afterwards."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    g = _skewed_graph(spark, n=120)
    rep = autotune(g, "bfs", trials=1, rounds=2)
    assert rep["best"] in [r["config"] for r in rep["candidates"]]
    assert all(r["best_sec"] > 0 for r in rep["candidates"])
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_threshold_knob_preserves_semantics(spark):
    """Any direction threshold must give identical BFS distances — the
    knob trades plan shape, never results (same contract as the
    reference's direction schedules)."""
    from graphit_spark.kernels import bfs

    g = _skewed_graph(spark, n=150)
    base = {r["id"]: r["dist"] for r in bfs(g, 0).collect()}
    for frac in (10, 50):
        got = {r["id"]: r["dist"] for r in bfs(g, 0, threshold_fraction=frac).collect()}
        assert got == base, frac


def test_tc_relabel_candidates_order_by_heuristic():
    """The tc schedule space carries the reference's relabel decision
    (builtin_relabel guard): hub-skewed dense graphs try relabel=True
    first, flat or sparse ones try False first — so a budget-capped
    search measures the heuristic's pick before its alternative."""
    from graphit_spark.tune import GraphStats

    skewed = GraphStats(num_vertices=10**6, num_edges=2 * 10**7,
                        avg_degree=20.0, max_degree=10**5,
                        skew=5000.0, mean_weight=None)
    flat = GraphStats(num_vertices=10**6, num_edges=12 * 10**6,
                      avg_degree=12.0, max_degree=13,
                      skew=13 / 12.0, mean_weight=None)
    sparse = GraphStats(num_vertices=10**6, num_edges=2 * 10**6,
                        avg_degree=2.0, max_degree=10**4,
                        skew=5000.0, mean_weight=None)
    first = lambda stats: candidate_schedules(stats, "tc", parallelism=8)[0]
    assert first(skewed)["relabel"] is True
    assert first(flat)["relabel"] is False   # mean ≈ median regime
    assert first(sparse)["relabel"] is False  # avg degree < 10 gate


def test_autotune_tc_smoke(spark):
    """End-to-end tc tuning on a real (tiny) graph — both relabel
    branches measured, a winner recorded."""
    g = _skewed_graph(spark)
    rep = autotune(g, "tc", trials=1, rounds=1)
    assert {c["config"]["relabel"] for c in rep["candidates"]} == {True, False}
    assert "relabel" in rep["best"]
