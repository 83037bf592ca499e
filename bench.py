#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "throughput": {...}}

Inputs: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) for the
testdata-derived queries; the headline PageRank runs on a JVM-generated
synthetic power-law graph (graphit_spark/synth.py) sized by
$BENCH_SYNTH_V vertices (default 1M → ~17M edges), reporting
edges/sec — the BASELINE.json metric. local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphit_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    synth_v = int(os.environ.get("BENCH_SYNTH_V", "1000000"))
    pr_iters = int(os.environ.get("BENCH_PR_ITERS", "10"))

    # tmpfs shuffle dirs: the sandbox block device stalls under shuffle
    # I/O (cluster analogue: local NVMe shuffle volumes)
    local_dir = os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/graphit-bench")
    spark = get_spark(
        app_name="graphit-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": local_dir,
        },
    )

    from graphit_spark import LinkGraph
    from graphit_spark.benchqueries import (
        q_bfs,
        q_cc,
        q_hits,
        q_hyperball_harmonic,
        q_k_truss,
        q_louvain,
        q_lpa,
        q_pagerank,
        q_scc,
        q_triangle_count,
    )
    from graphit_spark.datagen import gen_pages
    from graphit_spark.extract import pages_to_edges
    from graphit_spark.kernels import pagerank
    from graphit_spark.synth import synth_edges

    times: dict[str, float] = {}
    times_cold: dict[str, float] = {}
    throughput: dict[str, float] = {}

    def timed(name, fn, trials=1):
        """Record fn()'s wall time; with trials>1, best-of-N (the
        reference harness pattern, graphit_eval/eval/table7/benchmark.py
        runs 10): this host's capacity swings several-fold minute to
        minute, so single shots measure the host, not the engine. Only
        the round-over-round comparison queries pay the extra trials.
        The FIRST trial is additionally recorded under queries_cold so
        round-over-round tables can compare cold-with-cold regardless
        of each round's trial count."""
        trial_times = []
        out = None
        for _ in range(max(1, trials)):
            t0 = time.time()
            out = fn()
            trial_times.append(round(time.time() - t0, 3))
        times[name] = min(trial_times)
        times_cold[name] = trial_times[0]
        if len(trial_times) > 1:
            throughput.setdefault("sf_trials", {})[name] = trial_times
        return out

    # best-of-N for the queries tracked round-over-round (BENCH_r{N}
    # comparisons); everything newer runs single-shot to bound wall time
    sf_trials = int(os.environ.get("BENCH_SF_TRIALS", "2"))

    # soft wall-clock guard for the single-shot tail: this host's
    # capacity swings 4-5x minute to minute (BENCH/BASELINE.md), and a
    # slow window must never prevent the run from reaching the headline
    # metrics and emitting its JSON line. Tail queries past the budget
    # are skipped and listed in throughput["skipped"]; the
    # round-over-round comparison set and the headline always run.
    t_start = time.time()
    soft_deadline = float(os.environ.get("BENCH_SOFT_DEADLINE_SEC", "1200"))

    def budget_left() -> bool:
        return time.time() - t_start < soft_deadline

    def timed_tail(name, fn, trials=1):
        if budget_left():
            return timed(name, fn, trials)
        throughput.setdefault("skipped", []).append(name)
        return None

    # testdata-derived kernel queries (the driver's correctness queries at bench sf)
    timed("pagerank_sf", lambda: q_pagerank(spark, sf_dir).count(),
          trials=sf_trials)
    timed("connected_components_sf", lambda: q_cc(spark, sf_dir).count(),
          trials=sf_trials)
    timed("label_propagation_sf", lambda: q_lpa(spark, sf_dir).count(),
          trials=sf_trials)
    timed_tail("louvain_sf", lambda: q_louvain(spark, sf_dir).count())
    timed("triangle_count_sf", lambda: q_triangle_count(spark, sf_dir).collect(),
          trials=sf_trials)
    # DOULION sparsified estimator (p=1/4): the TC scale path — should
    # beat the exact kernel by roughly the sampled edge/intersect work
    from graphit_spark.benchqueries import q_triangle_count_approx

    approx = timed_tail(
        "triangle_approx_sf",
        lambda: q_triangle_count_approx(spark, sf_dir).collect(),
    )
    if approx is not None:
        throughput["triangle_approx_est"] = int(approx[0]["triangles_est"])
    timed("bfs_sf", lambda: q_bfs(spark, sf_dir).count(), trials=sf_trials)
    # round-3 kernels: directed bowtie SCC, HITS, k-truss peel,
    # HyperBall harmonic centrality (the crawl-scale closeness path)
    timed_tail("scc_sf", lambda: q_scc(spark, sf_dir).count())
    timed_tail("hits_sf", lambda: q_hits(spark, sf_dir).count())
    from graphit_spark.benchqueries import q_link_prediction, q_salsa

    timed_tail("salsa_sf", lambda: q_salsa(spark, sf_dir).count())
    timed_tail("link_prediction_sf",
               lambda: q_link_prediction(spark, sf_dir).count())
    timed_tail("k_truss_sf", lambda: q_k_truss(spark, sf_dir).count())
    timed_tail("hyperball_sf",
               lambda: q_hyperball_harmonic(spark, sf_dir).count())

    # output-verification overhead: the distributed PR certificate
    # (verifiers.py, run_kernel --verify) over the sf pagerank output —
    # the evidence for "verify-after-resume costs ~one superstep"
    from graphit_spark.benchqueries import graph as bench_graph
    from graphit_spark.verifiers import pr_certificate

    if budget_left():
        graw = bench_graph(spark, sf_dir, "raw")
        ranks_sf = pagerank(graw, max_iters=10)
        timed(
            "pagerank_verify_sf",
            lambda: pr_certificate(graw, ranks_sf).collect(),
        )
    else:
        throughput.setdefault("skipped", []).append("pagerank_verify_sf")

    # ingest throughput: Arrow extraction + url-dict + edge build, read
    # from a materialized pages table (generation is test-fixture work,
    # not engine work — kept out of the timed span)
    n_pages = int(os.environ.get("BENCH_PAGES", "20000"))
    pages_path = os.path.join(local_dir, f"bench_pages_{n_pages}")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        gen_pages(spark, n_pages).write.mode("overwrite").parquet(pages_path)

    def ingest():
        pages = spark.read.parquet(pages_path)
        edges, _ids = pages_to_edges(pages)
        return edges.count()

    n_links = timed("extract_pages", ingest, trials=sf_trials)
    throughput["extract_pages_per_sec"] = round(n_pages / times["extract_pages"], 1)
    throughput["extract_links"] = n_links

    # skew stress: hub gather (30% of edges into one dst) — plain
    # groupBy vs the explicit salted two-level aggregation. Records the
    # evidence that map-side partial aggregation absorbs the hub (the
    # two should track each other within host noise).
    if os.environ.get("BENCH_SKEW", "1") == "1":
        from pyspark.sql import functions as F

        from graphit_spark.plans.traversal import salted_sum

        sm = int(os.environ.get("BENCH_SKEW_EDGES", "10000000"))
        sn = max(sm // 10, 1)
        skew_e = (
            spark.range(sm)
            .select(
                (F.col("id") % sn).alias("src"),
                F.when(F.pmod(F.hash("id"), F.lit(10)) < 3, F.lit(0))
                .otherwise(F.pmod(F.hash("id", "id"), F.lit(sn)))
                .alias("dst"),
                F.rand(1).alias("contrib"),
            )
            .repartition(cpus, "src")
            .persist()
        )
        skew_e.count()
        timed(
            "skew_gather_plain",
            lambda: skew_e.groupBy("dst").agg(F.sum("contrib")).count(),
        )
        timed(
            "skew_gather_salted",
            lambda: salted_sum(skew_e, "dst", "contrib").count(),
        )
        throughput["skew_edges"] = sm
        throughput["skew_hub_share"] = 0.3
        skew_e.unpersist()

    # curation pipeline at bench sf: the two round-3 composition
    # queries (gates + LSH near-dup removal; CC-kernel dup clustering)
    if os.environ.get("BENCH_PIPELINE", "1") == "1":
        from graphit_spark.textqueries import (
            q_corpus_select_dedup,
            q_dedup_clusters,
        )

        timed_tail("corpus_select_dedup_sf",
              lambda: q_corpus_select_dedup(spark, sf_dir).count())
        timed_tail("dedup_clusters_sf",
              lambda: q_dedup_clusters(spark, sf_dir).count())

    # headline: PageRank on the synthetic power-law graph (BASELINE
    # metric). Best-of-N trials like the reference harness (10 trials,
    # graphit_eval/eval/table7/benchmark.py) — the sandbox host's
    # capacity swings several-fold minute to minute, so a single trial
    # measures the host, not the engine.
    trials = int(os.environ.get("BENCH_PR_TRIALS", "3"))
    # isolate the headline from the query tail above: drop every cached
    # block the sf-queries left behind so the synth graph's cache and
    # shuffle work start from clean executor memory (the round-3
    # pagerank_synth "regression" was cache pressure from the growing
    # tail, not kernel work — see BENCH/BASELINE.md)
    spark.catalog.clearCache()
    g = LinkGraph(synth_edges(spark, synth_v), squished=False)
    num_edges = g.num_edges  # also forces edge materialization + cache
    # warm the per-graph caches the kernel touches on first use (degree
    # table; one codegen'd superstep) BEFORE the trials, like the
    # reference harness which times trials only after graph build —
    # otherwise trial 1 measures one-time materialization (~35 s at 17M
    # edges), which is what r02/r03's 45-55 s first trials were, not
    # kernel work. queries_cold still records trial 1, so the warm-up
    # is visible, not hidden.
    g.out_degrees().count()
    pagerank(g, max_iters=1).count()

    # optional schedule autotune (reference autotune/graphit_autotuner.py
    # analogue): BENCH_TUNE=1 searches the pruned schedule space on the
    # actual synthetic graph first and runs the headline with the winner;
    # the search report is recorded under throughput["tuned"].
    pr_kwargs: dict = {}
    if os.environ.get("BENCH_TUNE", "0") == "1":
        from graphit_spark.tune import autotune

        tune_out = os.path.join(local_dir, "tuned_pagerank.json")
        rep = timed(
            "autotune_pagerank",
            lambda: autotune(g, "pagerank", trials=1, rounds=2,
                             out_path=tune_out),
        )
        throughput["tuned"] = {"best": rep["best"],
                               "n_candidates": len(rep["candidates"])}
        pr_kwargs = {k: v for k, v in rep["best"].items()
                     if k != "shuffle_partitions"}
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(rep["best"]["shuffle_partitions"]))
    elif os.environ.get("SPARK_GRAFT_TUNED"):
        # consume a PREVIOUSLY RECORDED winner (tune.py's production
        # path) without paying the search again: the env var points at
        # an autotune JSON (e.g. BENCH/TUNE.json) and the first
        # pagerank-kernel entry's best config is applied. Opt-in: a
        # recorded winner is host+input-specific, so it is never
        # silently assumed to transfer.
        with open(os.environ["SPARK_GRAFT_TUNED"]) as fh:
            recorded = json.load(fh)
        best = next(
            (v["best"] for v in recorded.values()
             if v.get("kernel") == "pagerank" and v.get("best")),
            None,
        )
        if best:
            throughput["tuned"] = {
                "best": best,
                "from": os.environ["SPARK_GRAFT_TUNED"],
            }
            pr_kwargs = {k: v for k, v in best.items()
                         if k != "shuffle_partitions"}
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(best["shuffle_partitions"]))

    trial_times = []
    for _ in range(trials):
        t0 = time.time()
        pagerank(g, max_iters=pr_iters, **pr_kwargs).count()
        trial_times.append(time.time() - t0)
    pr_time = min(trial_times)
    times["pagerank_synth"] = round(pr_time, 3)
    times_cold["pagerank_synth"] = round(trial_times[0], 3)
    throughput["pagerank_synth_trials"] = [round(t, 3) for t in trial_times]
    throughput["pagerank_edges_per_sec"] = round(num_edges * pr_iters / pr_time, 1)

    # the BASELINE.json metric verbatim: edges/sec (iterations/hour) to
    # 1e-6 convergence (L1). The hub-heavy synthetic mixes fast
    # (~10-15 supersteps to 1e-6), so this adds modest wall time.
    if os.environ.get("BENCH_CONVERGE", "1") == "1":
        # N trials (default 5): convergence is deterministic (same
        # iteration count and final L1 every run), so the only thing
        # repeated runs sample is the host's minute-scale capacity
        # swing — and this is the BASELINE.json headline metric. The
        # HEADLINE is the MEDIAN (robust to a single bad host window,
        # unlike min which is a lucky-window number and unlike mean
        # which one 4x outlier drags); min is recorded alongside as
        # pagerank_converge_best.
        conv_trials = max(
            1, int(os.environ.get("BENCH_CONVERGE_TRIALS", "5"))
        )
        conv_times = []
        conv: dict = {}
        for _ in range(conv_trials):
            conv = {}
            t0 = time.time()
            pagerank(g, tol=1e-6, max_iters=200, metrics_out=conv,
                     **pr_kwargs).count()
            conv_times.append(time.time() - t0)
        conv_time = statistics.median(conv_times)
        iters = conv.get("iterations", 0)
        times["pagerank_converge_1e6"] = round(conv_time, 3)
        times_cold["pagerank_converge_1e6"] = round(conv_times[0], 3)
        throughput["pagerank_converge_trials"] = [
            round(t, 3) for t in conv_times
        ]
        throughput["pagerank_converge_headline"] = "median"
        throughput["pagerank_converge_best"] = round(min(conv_times), 3)
        throughput["pagerank_converge_iterations"] = iters
        throughput["pagerank_converge_final_l1"] = conv.get("final_err")
        throughput["pagerank_converge_edges_per_sec"] = round(
            num_edges * iters / conv_time, 1
        )
        throughput["pagerank_converge_edges_per_sec_best"] = round(
            num_edges * iters / min(conv_times), 1
        )
        throughput["pagerank_iterations_per_hour"] = round(
            3600.0 * iters / conv_time, 1
        )
    # RMAT/Kronecker self-similar skew (the reference's -g graphs,
    # infra_gapbs generator): PR fixed iters on a Graph500-parameter
    # RMAT graph — recursive hub structure, heavier-tailed dst skew
    # than the power-law synth above, exercising the same gather plan
    # under the reference's own degree distribution. Expect edges/sec
    # well below the power-law headline and that is NOT a plan
    # pathology (measured): at ~4M edges the fixed per-superstep cost
    # floor dominates — an equal-size power-law graph also drops to
    # ~5M e/s vs 17M at 17M edges. (pagerank does NO dangling-mass
    # redistribution, per apps/pagerank.gt and kernels/pagerank.py —
    # the only V-sized extra anywhere is the tol-path error norm,
    # which this fixed-iters row never takes.)
    rmat_on = os.environ.get("BENCH_RMAT", "1") == "1"
    if rmat_on and not budget_left():
        throughput.setdefault("skipped", []).append("pagerank_rmat")
    elif rmat_on:
        from graphit_spark.synth import synth_rmat

        rscale = int(os.environ.get("BENCH_RMAT_SCALE", "18"))
        # the pagerank_synth discipline: time the BUILD (generate +
        # materialize + degree/superstep cache warm-up) apart from the
        # WARM kernel trials, so the row measures the kernel; the
        # all-in first pass is still visible in queries_cold.
        t0 = time.time()
        gr = LinkGraph(synth_rmat(spark, rscale), squished=False)
        r_edges = gr.num_edges
        gr.out_degrees().count()
        pagerank(gr, max_iters=1).count()
        rmat_build = time.time() - t0
        rmat_trials = max(1, int(os.environ.get("BENCH_RMAT_TRIALS", "3")))
        r_times = []
        for _ in range(rmat_trials):
            t0 = time.time()
            pagerank(gr, max_iters=pr_iters).count()
            r_times.append(time.time() - t0)
        rt = min(r_times)
        times["pagerank_rmat"] = round(rt, 3)
        times_cold["pagerank_rmat"] = round(rmat_build + r_times[0], 3)
        throughput["rmat_scale"] = rscale
        throughput["rmat_edges"] = r_edges
        throughput["rmat_build_sec"] = round(rmat_build, 3)
        throughput["pagerank_rmat_trials"] = [round(t, 3) for t in r_times]
        throughput["pagerank_rmat_edges_per_sec"] = round(
            r_edges * pr_iters / rt, 1
        )
        gr.unpersist()

    # kernel fusion evidence (eigenvector_pr_fusion.gt analogue): one
    # edge scan + one groupBy drives PR and EC together vs running the
    # two kernels separately on the same graph. The edge-side shuffle
    # halves; V-side join/checkpoint costs are shared, so the local
    # ratio (~1.2-1.35x here) understates the cluster-scale win where
    # the E-sized shuffle dominates.
    if os.environ.get("BENCH_FUSION", "1") == "1":
        from graphit_spark.kernels import (
            eigenvector_centrality,
            fused_pr_eigenvector,
        )

        fr = int(os.environ.get("BENCH_FUSION_ROUNDS", "5"))
        f_times, s_times = [], []
        for _ in range(2):  # alternated trials, min of each: the host's
            t0 = time.time()  # minute-scale capacity swings would other-
            fused_pr_eigenvector(g, rounds=fr).count()  # wise dominate
            f_times.append(time.time() - t0)
            t0 = time.time()
            pagerank(g, max_iters=fr).count()
            eigenvector_centrality(g, rounds=fr).count()
            s_times.append(time.time() - t0)
        t_fused, t_sep = min(f_times), min(s_times)
        times["fused_pr_ec_synth"] = round(t_fused, 3)
        times["separate_pr_ec_synth"] = round(t_sep, 3)
        times_cold["fused_pr_ec_synth"] = round(f_times[0], 3)
        times_cold["separate_pr_ec_synth"] = round(s_times[0], 3)
        throughput["fusion_speedup"] = round(t_sep / t_fused, 3)

    throughput["synth_edges"] = num_edges
    throughput["synth_vertices"] = synth_v
    throughput["pr_iters"] = pr_iters

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "graphit_spark_bench_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "queries_cold": times_cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "throughput": throughput,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
