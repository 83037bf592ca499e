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
