"""The README "write your own kernel" example, executed verbatim — the
programmability story (GraphIt's user-defined vertex programs mapped to
the plan layer) must actually work as documented."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphit_spark import LinkGraph

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readme_example() -> str:
    text = open(os.path.join(ROOT, "README.md")).read()
    sect = text.split("## Writing your own kernel")[1]
    return sect.split("```python")[1].split("```")[0]


def test_readme_custom_kernel_runs_and_matches_oracle(spark):
    ns = {}
    exec(_readme_example(), ns)  # the documented code, verbatim
    influence = ns["influence"]

    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    g = LinkGraph.from_pairs(spark, edges, persist=False)
    seeds = [0, 5]
    got = {r["id"]: r["inf"] for r in influence(g, seeds).collect()}

    # numpy-free oracle: fixpoint of inf(v) = max(seed, max_u inf(u)/2)
    es = sorted({(a, b) for a, b in edges if a != b})
    n = g.num_vertices
    inf = {v: (1.0 if v in seeds else 0.0) for v in range(n)}
    for _ in range(100):
        nxt = dict(inf)
        for a, b in es:
            nxt[b] = max(nxt[b], inf[a] * 1 / 2)
        if nxt == inf:
            break
        inf = nxt
    assert got == inf
