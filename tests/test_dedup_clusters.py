"""q_dedup_clusters semantics: transitive closure of the confirmed
near-dup pair relation via the engine's CC kernel.

The load-bearing case is the CHAIN: jaccard(A,B) >= 0.8 and
jaccard(B,C) >= 0.8 but jaccard(A,C) < 0.8. Pairwise drop-the-larger
(corpus_select_dedup) would keep A and C as "distinct" even though
they're transitively near-dups; clustering must put all three in one
cluster keyed by min doc_id. Texts are built from 4-char tokens so
changed regions land on shingle boundaries (SHINGLE_LEN=8, STRIDE=4):
one 5-token region diff => jaccard ~0.815, two regions => ~0.662.
"""

import os

import pytest

from graphit_spark.functions import dedup as D
from graphit_spark.textqueries import NEAR_DUP_JACCARD, q_dedup_clusters

_TOKS = [f"{i:03d}_" for i in range(60)]


def _mk(r1: bool, r2: bool) -> str:
    t = list(_TOKS)
    if r1:
        for j in range(5, 10):
            t[j] = f"x{j:02d}_"
    if r2:
        for j in range(45, 50):
            t[j] = f"y{j:02d}_"
    return "".join(t)


@pytest.fixture(scope="module")
def chain_sf_dir(spark, tmp_path_factory):
    """documents.parquet with a 3-chain A~B~C (A!~C), one exact-dup
    pair {10,11}, and two singletons — same schema as the testdata."""
    rows = [
        (0, _mk(False, False)),  # A
        (1, _mk(False, True)),   # B: suffix region changed
        (2, _mk(True, True)),    # C: prefix+suffix changed (far from A)
        (10, "an unrelated document about entirely other things " * 5),
        (11, "an unrelated document about entirely other things " * 5),
        (20, "a lone singleton document with its own words " * 5),
        (21, "another text sharing nothing with the rest at all " * 5),
    ]
    sf = str(tmp_path_factory.mktemp("chain_sf"))
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def test_chain_preconditions(spark, chain_sf_dir):
    """The fixture really is a chain: A~B and B~C confirm, A~C fails."""
    docs = spark.read.parquet(
        os.path.join(chain_sf_dir, "documents.parquet")
    )
    cands = D.lsh_candidate_pairs(docs)
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.jaccard_on_candidates(docs, cands).collect()
    }
    assert jac[(0, 1)] >= NEAR_DUP_JACCARD
    assert jac[(1, 2)] >= NEAR_DUP_JACCARD
    # A~C is proposed by LSH but rejected by exact Jaccard
    assert jac[(0, 2)] < NEAR_DUP_JACCARD


def test_chain_merges_into_one_cluster(spark, chain_sf_dir):
    out = q_dedup_clusters(spark, chain_sf_dir).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.cluster_size) for r in out}
    assert len(by_doc) == 7  # one row per document
    # the chain: all three in cluster 0 (min doc_id), size 3
    assert by_doc[0] == (0, 3)
    assert by_doc[1] == (0, 3)
    assert by_doc[2] == (0, 3)
    # exact dup pair
    assert by_doc[10] == (10, 2)
    assert by_doc[11] == (10, 2)
    # singletons map to themselves
    assert by_doc[20] == (20, 1)
    assert by_doc[21] == (21, 1)


def _py_clusters(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    """Independent pure-Python oracle: the same deterministic pipeline
    (char shingles → md5 minhash → 2-row LSH bands → exact Jaccard →
    union-find transitive closure) with none of the Spark code paths.
    Returns {doc_id: (cluster_id, cluster_size)}."""
    import hashlib

    from graphit_spark.functions.dedup import (
        MERSENNE31,
        MINHASH_A,
        MINHASH_B,
        SHINGLE_LEN,
        SHINGLE_STRIDE,
    )
    from graphit_spark.textqueries import MINHASH_K, NEAR_DUP_JACCARD

    def shingles(t):
        t = t.strip().lower()
        n = max((len(t) - SHINGLE_LEN) // SHINGLE_STRIDE + 1, 1)
        return {
            t[i * SHINGLE_STRIDE:i * SHINGLE_STRIDE + SHINGLE_LEN]
            for i in range(n)
        }

    def md5i(s):
        # first 32 bits, matching functions/dedup.py md5_int
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    sh = {i: shingles(t) for i, t in texts.items()}
    sig = {
        i: [
            min((MINHASH_A[t] * (md5i(x) % MERSENNE31) + MINHASH_B[t])
                % MERSENNE31 for x in s)
            for t in range(MINHASH_K)
        ]
        for i, s in sh.items()
    }
    bands = {i: [tuple(s[0:2]), tuple(s[2:4])] for i, s in sig.items()}
    ids = sorted(texts)
    parent = {i: i for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not any(x == y for x, y in zip(bands[a], bands[b])):
                continue  # LSH did not propose the pair
            inter = len(sh[a] & sh[b])
            jac = round(inter / (len(sh[a]) + len(sh[b]) - inter), 6)
            if jac >= NEAR_DUP_JACCARD:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    roots = {i: find(i) for i in ids}
    sizes: dict[int, int] = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    return {i: (roots[i], sizes[roots[i]]) for i in ids}


def test_randomized_corpus_matches_union_find_oracle(spark, tmp_path):
    """80 seeded random docs (8 templates × per-doc token mutations at
    mixed intensities, so near-dups, borderline pairs, and chains all
    occur) — the Spark pipeline must equal the pure-Python union-find
    oracle exactly, doc for doc."""
    import random

    rng = random.Random(20260817)
    templates = [
        [f"t{k}w{j:02d}" for j in range(50)] for k in range(8)
    ]
    texts = {}
    for i in range(80):
        base = list(templates[rng.randrange(8)])
        n_mut = rng.choice([0, 1, 2, 3, 5, 8, 13, 21])
        for _ in range(n_mut):
            base[rng.randrange(len(base))] = f"m{rng.randrange(9999):04d}"
        texts[i] = " ".join(base)
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    got = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in q_dedup_clusters(spark, sf).collect()
    }
    exp = _py_clusters(texts)
    assert got == exp
    # the fixture is non-trivial: some multi-doc cluster must exist
    assert any(sz > 1 for _, sz in exp.values())


def test_no_pairs_all_singletons(spark, tmp_path):
    """Empty pair graph: every doc is its own cluster (the CC-kernel
    branch is skipped entirely; no crash on a zero-edge graph)."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, f"totally unique text number {i} " + "zz" * i, "en",
          "synthetic", 30) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    out = q_dedup_clusters(spark, sf).collect()
    assert {r.doc_id for r in out} == set(range(5))
    assert all(r.cluster_id == r.doc_id and r.cluster_size == 1 for r in out)


def test_train_split_leakage_repair(spark, chain_sf_dir):
    """No near-dup cluster may straddle splits; singletons keep their
    raw md5 split; moved flags exactly the overridden docs."""
    import hashlib

    from graphit_spark.textqueries import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        q_corpus_train_split,
    )

    def raw_split(doc_id: int) -> str:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        if h < SPLIT_TRAIN_PCT:
            return "train"
        if h < SPLIT_VAL_PCT:
            return "val"
        return "test"

    rows = {
        r["doc_id"]: r
        for r in q_corpus_train_split(spark, chain_sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2, 10, 11, 20, 21}
    # one split per cluster, and it is the canonical member's raw split
    for cid in {r["cluster_id"] for r in rows.values()}:
        members = [r for r in rows.values() if r["cluster_id"] == cid]
        assert len({r["split"] for r in members}) == 1
        assert members[0]["split"] == raw_split(cid)
    # the chain {0,1,2} all landed on doc 0's split
    assert rows[1]["split"] == rows[0]["split"] == raw_split(0)
    assert rows[2]["split"] == raw_split(0)
    # singletons keep their own hash split, unmoved
    for d in (20, 21):
        assert rows[d]["split"] == raw_split(d)
        assert not rows[d]["moved"]
    # moved == (raw hash split != cluster split), exactly
    for d, r in rows.items():
        assert r["moved"] == (raw_split(d) != r["split"])


class TestHotBandCap:
    """The 100 TB guard on lsh_candidate_pairs: a degenerate band
    bucket (here: 300 byte-identical texts, far above the cap) must be
    blacklisted BEFORE the self-join so candidate generation stays
    sub-quadratic, while ordinary buckets keep pairing — and the drop
    is never silent (lsh_band_stats + a logged warning)."""

    @pytest.fixture(scope="class")
    def degenerate_docs(self, spark):
        clone = "".join(f"z{i:03d}" for i in range(40))  # 300 copies
        pair = "".join(f"w{i:03d}" for i in range(40))   # 2 copies
        rows = [(0, pair), (1, pair)] + [
            (100 + i, clone) for i in range(300)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hot_bucket_is_dropped_others_pair(self, spark, degenerate_docs):
        capped = D.lsh_candidate_pairs(degenerate_docs, max_bucket=100)
        assert [(r["doc_a"], r["doc_b"]) for r in capped.collect()] == [(0, 1)]

    def test_uncapped_rule_is_quadratic_in_the_bucket(
        self, spark, degenerate_docs
    ):
        full = D.lsh_candidate_pairs(degenerate_docs, max_bucket=None)
        # C(300,2) clone pairs + the (0,1) pair — the blow-up the cap
        # exists to prevent.
        assert full.count() == 300 * 299 // 2 + 1

    def test_stats_expose_dropped_mass(self, spark, degenerate_docs):
        stats = D.lsh_band_stats(degenerate_docs, max_bucket=100).collect()
        hot = [r for r in stats if r["is_hot"]]
        assert hot and all(r["bucket_docs"] == 300 for r in hot)
        cold = [r for r in stats if not r["is_hot"]]
        assert cold and all(r["bucket_docs"] <= 2 for r in cold)

    def test_drop_is_logged(self, spark, degenerate_docs, caplog):
        import logging
        import time

        # the dropped-mass metrics ride the plan as an observe() node
        # and are logged by a watcher thread once the first action
        # completes — poll briefly for the asynchronous record
        with caplog.at_level(logging.WARNING, logger="graphit_spark.dedup"):
            D.lsh_candidate_pairs(degenerate_docs, max_bucket=100).collect()
            deadline = time.monotonic() + 10.0
            while time.monotonic() < deadline:
                if any(
                    "hot band bucket" in r.message for r in caplog.records
                ):
                    break
                time.sleep(0.05)
        assert any("hot band bucket" in r.message for r in caplog.records)

    def test_cap_accounting_is_collect_free(self, spark, degenerate_docs):
        """The round-5 contract: the hot-band cap's dropped-mass
        accounting rides the plan as observed metrics — composing the
        capped plan runs EXACTLY the same (one, shared band-table
        checkpoint) job as the uncapped plan, no occupancy
        materialization and no driver collect."""
        sc = spark.sparkContext

        def jobs(group, fn):
            sc.setJobGroup(group, "")
            try:
                fn()
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)
            return len(list(sc.statusTracker().getJobIdsForGroup(group)))

        uncapped = jobs(
            "lsh-probe-uncapped",
            lambda: D.lsh_candidate_pairs(degenerate_docs, max_bucket=None),
        )
        capped = jobs(
            "lsh-probe-capped",
            lambda: D.lsh_candidate_pairs(degenerate_docs, max_bucket=100),
        )
        # (AQE may split the shared checkpoint into >1 job; the pinned
        # invariant is that the cap adds ZERO jobs over uncapped)
        assert capped == uncapped

    def test_default_cap_never_fires_at_test_scale(self, spark):
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        stats = D.lsh_band_stats(docs)
        assert stats.filter("is_hot").count() == 0
