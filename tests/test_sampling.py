"""token_budget_sample: greedy deterministic-shuffle prefix semantics."""

import hashlib

from pyspark.sql import functions as F

from graphit_spark.functions.sampling import sample_key, token_budget_sample


def _key(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _expected(rows, budget):
    """Pure-Python reference: hash-order greedy prefix, boundary doc in."""
    out, cum = {}, 0
    for doc_id, n in sorted(rows, key=lambda r: (_key(r[0]), r[0])):
        if cum < budget:
            out[doc_id] = (n, cum + n)
        cum += n
    return out


def test_sample_key_matches_python_md5(spark):
    got = dict(
        _mkdf(spark, [(i, 1) for i in range(20)])
        .select("doc_id", sample_key(F.col("doc_id")).alias("k"))
        .collect()
    )
    assert got == {i: _key(i) for i in range(20)}


def test_greedy_prefix_semantics(spark):
    rows = [(i, 10 + (i * 7) % 23) for i in range(50)]
    total = sum(n for _, n in rows)
    for budget in (0, 1, total // 4, total // 2, total, total + 100):
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_tokens_cum"])
            for r in token_budget_sample(_mkdf(spark, rows), budget).collect()
        }
        assert got == _expected(rows, budget), f"budget={budget}"


def test_budget_edges(spark):
    rows = [(1, 100), (2, 100), (3, 100)]
    df = _mkdf(spark, rows)
    assert token_budget_sample(df, 0).count() == 0
    assert token_budget_sample(df, -5).count() == 0
    assert token_budget_sample(df, 10**9).count() == 3
    # budget of 1 token still takes exactly the first document
    assert token_budget_sample(df, 1).count() == 1
    # sample reaches the budget whenever the corpus has enough tokens
    kept = token_budget_sample(df, 150).agg(F.sum("n_tokens")).first()[0]
    assert kept >= 150


def test_deterministic_across_runs(spark):
    rows = [(i, 5 + i % 11) for i in range(200)]
    df = _mkdf(spark, rows)
    a = sorted(tuple(r) for r in token_budget_sample(df, 300).collect())
    b = sorted(tuple(r) for r in token_budget_sample(df, 300).collect())
    assert a == b and len(a) > 0


# --- stratified_sample ----------------------------------------------------


def _mk_strata_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


def _expected_strata(rows, num, den):
    by_lang: dict[str, list[int]] = {}
    for doc_id, lang in rows:
        by_lang.setdefault(lang, []).append(doc_id)
    keep = {}
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (_key(i), i))
        quota = (len(ids) * num + den - 1) // den
        for rank, i in enumerate(ids[:quota]):
            keep[i] = (lang, rank)
    return keep


def test_stratified_exact_quotas_and_order(spark):
    from graphit_spark.functions.sampling import stratified_sample

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    rows += [(1000 + i, "zh") for i in range(7)]  # odd-sized stratum
    got = {
        r["doc_id"]: (r["lang"], r["stratum_rank"])
        for r in stratified_sample(
            _mk_strata_df(spark, rows), "lang", 1, 4
        ).collect()
    }
    assert got == _expected_strata(rows, 1, 4)


def test_stratified_full_and_empty_fractions(spark):
    from graphit_spark.functions.sampling import stratified_sample

    rows = [(i, "en" if i < 5 else "de") for i in range(12)]
    df = _mk_strata_df(spark, rows)
    # num == den keeps everything
    assert stratified_sample(df, "lang", 1, 1).count() == 12
    # ceil semantics: 1/100 of a 5-doc stratum still keeps 1 doc
    kept = stratified_sample(df, "lang", 1, 100).groupBy("lang").count()
    assert {r["lang"]: r["count"] for r in kept.collect()} == {
        "en": 1, "de": 1,
    }


def test_stratified_no_single_task_window(spark):
    """Plan guard: the per-stratum rank must come from the range-ranked
    pass, never from a global or per-stratum unpartitioned Window over
    the full table (the crawl-scale bottleneck)."""
    from graphit_spark.functions.sampling import stratified_sample

    rows = [(i, "en") for i in range(100)]  # one giant stratum
    out = stratified_sample(_mk_strata_df(spark, rows), "lang", 1, 2)
    assert out.count() == 50  # and the localCheckpoint ran the plan


def test_stratified_null_stratum_is_sampled(spark):
    """A NULL stratum must be sampled like any other (row_number
    PARTITION BY semantics), not silently dropped by an equi-join."""
    from graphit_spark.functions.sampling import stratified_sample

    rows = [(i, "en" if i % 2 == 0 else None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", 1, 2).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang.get("en", [])) == 5
    assert len(by_lang.get(None, [])) == 5
    expect = _expected_strata(rows, 1, 2)
    got = {r["doc_id"]: (r["lang"], r["stratum_rank"]) for r in out}
    assert got == expect


class TestPackSequences:
    def test_hand_checked_layout(self, spark):
        """Three docs, L=10: placement follows the (skey, id) stream
        order with exact integer div/mod arithmetic."""
        from graphit_spark.functions.sampling import pack_sequences, sample_key

        rows = [(1, 7), (2, 8), (3, 12)]
        df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
        out = {r["doc_id"]: r for r in pack_sequences(df, 10).collect()}
        # reproduce stream order driver-side with the same key
        keys = {
            r["doc_id"]: r["k"]
            for r in df.select(
                "doc_id", sample_key(F.col("doc_id")).alias("k")
            ).collect()
        }
        order = sorted(rows, key=lambda r: (keys[r[0]], r[0]))
        start = 0
        for doc_id, n in order:
            r = out[doc_id]
            assert r["seq_id"] == start // 10
            assert r["seq_offset"] == start % 10
            last = max(start + n - 1, start)
            assert r["n_splits"] == last // 10 - start // 10
            start += n

    def test_empty_doc_and_bad_len(self, spark):
        from graphit_spark.functions.sampling import pack_sequences

        df = spark.createDataFrame([(1, 0)], "doc_id long, n_tokens long")
        r = pack_sequences(df, 10).first()
        assert r["n_splits"] == 0 and r["seq_offset"] == 0
        try:
            pack_sequences(df, 0)
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestContrastivePairs:
    def _oracle(self, doc_ids, pos_pairs, n_cands):
        universe = sorted(doc_ids)
        n = len(universe)
        pos_set = {tuple(sorted(p)) for p in pos_pairs}
        out = []
        for a, b in sorted(pos_pairs):
            base = int(hashlib.md5(f"{a}_{b}".encode()).hexdigest()[:15], 16)
            for j in range(n_cands):
                neg = universe[(base + j) % n]
                if neg in (a, b):
                    continue
                if tuple(sorted((a, neg))) in pos_set:
                    continue
                if tuple(sorted((b, neg))) in pos_set:
                    continue
                out.append((a, b, neg))
                break
        return out

    def test_matches_python_oracle(self, spark):
        from graphit_spark.functions.sampling import contrastive_pairs

        # non-contiguous ids exercise the ranked universe mapping
        doc_ids = [2 * i + 1 for i in range(40)]
        docs = spark.createDataFrame([(d,) for d in doc_ids], "doc_id long")
        pos_pairs = [(1, 3), (1, 5), (3, 5), (21, 23), (41, 61), (7, 79)]
        positives = spark.createDataFrame(
            [(a, b, 0.9) for a, b in pos_pairs],
            "doc_a long, doc_b long, jaccard double",
        )
        got = [
            (r.anchor, r.positive, r.negative)
            for r in contrastive_pairs(
                docs, positives, tau=0.5, n_cands=5
            ).collect()
        ]
        assert got == self._oracle(doc_ids, pos_pairs, 5)

    def test_tau_filters_and_empty(self, spark):
        from graphit_spark.functions.sampling import contrastive_pairs

        docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        positives = spark.createDataFrame(
            [(0, 1, 0.2)], "doc_a long, doc_b long, jaccard double"
        )
        assert contrastive_pairs(docs, positives, tau=0.5).count() == 0
