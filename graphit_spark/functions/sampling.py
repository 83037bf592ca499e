"""Deterministic corpus sampling for training-data pipelines.

A token-budget sample is how a pretraining run actually consumes a
curated corpus: shuffle the documents by a deterministic hash of their
id (reproducible, and unbiased w.r.t. crawl/storage order), then take
documents in that order until the cumulative token count reaches the
budget. The reference has no counterpart (GraphIt is a graph DSL);
this is builder's-brief training-pipeline surface, composed from the
engine's own distributed prefix-sum primitive.

Scale shape: one hash projection over (id, tokens) rows + the
two-phase ordered_prefix_sum (range shuffle -> P parallel within-
bucket window sums -> broadcast per-bucket offsets; plans/ranking.py:29)
+ a filter. No single-partition Window, no driver-side iteration, and
the shuffled rows are 3 small columns regardless of document width —
at 10^12 documents that is one range shuffle of ~24 TB spread over the
cluster, not a sort of the corpus text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from graphit_spark.plans.ranking import ordered_prefix_sum


def sample_key(col: Column) -> Column:
    """60-bit md5 shuffle key of the decimal string of ``col`` — the
    deterministic stand-in for a random permutation. SQL twin:
    ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy hash-ordered prefix of ``df`` holding ~``budget`` tokens.

    A row is kept iff the cumulative token count of all rows BEFORE it
    (in (sample_key, id) order) is < budget — so the boundary document
    is included and the sample always reaches the budget whenever the
    corpus holds enough tokens; budget <= 0 selects nothing. Returns
    (id, tokens, <token_col>_cum) with the inclusive running total, so
    callers can audit exactly where the budget landed.

    The result is localCheckpointed: it is a terminal sample (consumed
    by training-data writers, typically more than once) and truncating
    lineage lets the internal range-shuffled table be released here.
    """
    keyed = df.select(
        F.col(id_col),
        F.col(token_col),
        sample_key(F.col(id_col)).alias("skey"),
    )
    release: list = []
    cum = ordered_prefix_sum(
        keyed,
        [F.asc("skey"), F.asc(id_col)],
        [token_col],
        release=release,
    )
    cum_col = f"{token_col}_cum"
    out = (
        cum.filter(F.col(cum_col) - F.col(token_col) < F.lit(int(budget)))
        .select(id_col, token_col, cum_col)
        .localCheckpoint(eager=True)
    )
    for cached in release:
        cached.unpersist()
    return out
