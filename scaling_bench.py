#!/usr/bin/env python
"""Scaling-efficiency harness (north rule: ≥0.8 from N to 4N parallelism).

Runs the identical PageRank job at local[N] and local[4N] (shuffle
partitions scaled with cores — the sandbox analogue of N vs 4N executors;
a real cluster run would use spark-submit --num-executors N/4N), on the
SAME synthetic input, and reports edges/sec at both plus
efficiency = throughput(4N) / (4 * throughput(N)).

Writes BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_once(cores: int, synth_v: int, pr_iters: int) -> dict:
    from graphit_spark import LinkGraph
    from graphit_spark.kernels import pagerank
    from graphit_spark.session import get_spark, stop_spark
    from graphit_spark.synth import synth_edges

    stop_spark()
    spark = get_spark(
        app_name=f"graphit-scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    g = LinkGraph(synth_edges(spark, synth_v, num_partitions=cores))
    num_edges = g.num_edges  # materialize + cache before timing
    t0 = time.time()
    pagerank(g, max_iters=pr_iters).count()
    elapsed = time.time() - t0
    stop_spark()
    return {
        "cores": cores,
        "edges": num_edges,
        "iters": pr_iters,
        "sec": round(elapsed, 3),
        "edges_per_sec": round(num_edges * pr_iters / elapsed, 1),
    }


def main() -> None:
    n = int(os.environ.get("SCALE_N", "8"))
    synth_v = int(os.environ.get("BENCH_SYNTH_V", "300000"))
    pr_iters = int(os.environ.get("BENCH_PR_ITERS", "10"))

    low = run_once(n, synth_v, pr_iters)
    high = run_once(4 * n, synth_v, pr_iters)
    eff = high["edges_per_sec"] / (4 * low["edges_per_sec"])
    result = {
        "metric": "pagerank_scaling_efficiency_N_to_4N",
        "N": n,
        "low": low,
        "high": high,
        "efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured numbers

Scaling evidence for the north rule (two parallelism levels on the same
input stand in for N vs 4N executors in this single-machine sandbox).

Job: PageRank, {pr_iters} iterations, synthetic power-law graph
({synth_v:,} vertices, {low['edges']:,} squished edges, 30% of links
into the hub set).

| parallelism | wall sec | edges/sec |
|---|---|---|
| local[{n}], {n} shuffle partitions | {low['sec']} | {low['edges_per_sec']:,} |
| local[{4 * n}], {4 * n} shuffle partitions | {high['sec']} | {high['edges_per_sec']:,} |

**Scaling efficiency (throughput(4N) / (4 x throughput(N))): {eff:.3f}**
(target >= 0.8; values near/above 1.0 here reflect fixed driver overhead
amortizing — at cluster scale the shuffle fabric dominates instead).

Raw JSON: `{json.dumps(result)}`

Regenerate: `python scaling_bench.py` (env: SCALE_N, BENCH_SYNTH_V,
BENCH_PR_ITERS). The per-round bench harness is `python bench.py`.
"""
        )


if __name__ == "__main__":
    main()
