"""bench.py is the driver's per-round artifact: one subprocess smoke
run at tiny settings pins (a) the JSON contract (single parseable line
with the required keys) and (b) the soft-deadline path (tail queries
skip but the headline still emits) — a bench.py crash would cost the
round its BENCH_r{N}.json entirely."""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_deadline_path_emits_json():
    env = dict(
        os.environ,
        BENCH_SOFT_DEADLINE_SEC="0.1",
        BENCH_SKEW="0",
        BENCH_CONVERGE="0",
        BENCH_PIPELINE="0",
        BENCH_SYNTH_V="5000",
        BENCH_PAGES="200",
        BENCH_SF_TRIALS="1",
        BENCH_PR_TRIALS="1",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    assert d["metric"] == "graphit_spark_bench_total"
    assert d["unit"] == "sec"
    # headline + comparison set always present
    for k in ("pagerank_sf", "connected_components_sf", "bfs_sf",
              "extract_pages", "pagerank_synth"):
        assert k in d["queries"], k
    assert d["value"] > 0
    # the deadline actually skipped the tail (and said so)
    assert "k_truss_sf" in d["throughput"]["skipped"]
    assert "k_truss_sf" not in d["queries"]
    # cold-trial record mirrors the best-of-N table (round-4 contract)
    assert set(d["queries_cold"]) == set(d["queries"])
    assert all(d["queries_cold"][k] >= d["queries"][k]
               for k in d["queries"])
