"""Streaming incremental analytics: crawl deltas → warm-started kernels.

Composes the streaming ingest path (streaming/ingest.py) with the
kernels' warm-start contracts (kernels/pagerank.py `init_ranks`,
kernels/components.py `init_labels`): each micro-batch of new edges
appends to the accumulated edge table, then the kernel re-converges
FROM THE PREVIOUS BATCH'S STATE instead of from scratch. The fixpoint
is identical to a cold run on the grown graph (Jacobi limits and
min-label fixpoints don't depend on the start vector; warm CC labels
stay valid because edge ADDITIONS only merge components), so each
batch pays only the iterations the delta actually perturbs. With
``with_deletes=True`` the stream carries (src, dst, op) rows and the
edge set is last-writer-wins; PageRank warm starts are unconditionally
valid, CC repairs locally by resetting exactly the components a
deleted edge touches (exactness argument in the function docstring).

Every batch's converged state lands in a SnapshotStore iteration
(= the streaming batch sequence), with per-partition lineage and the
kernel's iteration/error metrics in the manifest — a killed stream
restarts from the last committed batch via the stream checkpoint, and
the warm start resumes from the last committed snapshot. GraphIt has
no analogue (SURVEY.md §2.8: the reference is single-node batch); this
is the engine's evolving-web-graph path.

Scale shape: the accumulated edge table is a plain append-only parquet
(Iceberg when jars are present — checkpoint.py backend note); each
batch runs the same scale-audited superstep plan as batch PageRank/CC.
The cost of a batch is O(warm iterations × E-scan), NOT O(cold
iterations), and nothing driver-side grows with |E| or batch count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from graphit_spark.checkpoint import SnapshotStore

EDGE_SCHEMA = "src long, dst long"
OPS_SCHEMA = "src long, dst long, op string"


def _incremental_stream(
    spark: SparkSession,
    edges_dir: str,
    work_dir: str,
    kernel_name: str,
    run_kernel,
    max_files_per_trigger: int,
    certify=None,
    with_deletes: bool = False,
):
    from graphit_spark.graph import LinkGraph

    store = SnapshotStore(os.path.join(work_dir, "snapshots"), kernel_name)
    acc_dir = os.path.join(work_dir, "edges")

    def process(batch_df, batch_id: int):
        delta = batch_df.filter(F.col("src") != F.col("dst"))
        dels = None
        if with_deletes:
            # append-only (src, dst, op, seq) log; the live edge set is
            # last-writer-wins per edge, 'del' beating 'add' inside one
            # batch. One groupBy on the edge key per batch — the same
            # shuffle class as the kernel's own squish; at crawl scale
            # compact the log periodically (rewrite the winning rows)
            # exactly like any Iceberg merge-on-read table.
            delta.withColumn("seq", F.lit(int(batch_id))).write.mode(
                "append"
            ).parquet(acc_dir)
            log = spark.read.parquet(acc_dir)
            last = log.groupBy("src", "dst").agg(
                F.max(
                    F.struct(
                        F.col("seq"),
                        (F.col("op") == "del").cast("int").alias("d"),
                    )
                ).alias("m")
            )
            edges = last.filter(F.col("m.d") == 0).select("src", "dst")
            dels = delta.filter(F.col("op") == "del").select("src", "dst")
        else:
            delta.write.mode("append").parquet(acc_dir)
            edges = spark.read.parquet(acc_dir)
        g = LinkGraph(edges)
        prev = store.latest()
        init = store.read(spark, prev) if prev is not None else None
        metrics: dict = {}
        out = run_kernel(g, init, metrics, dels)
        if certify is not None:
            # distributed output certificate (verifiers.py) per batch:
            # the warm-start contract ("fixpoint identical to a cold
            # run on the grown graph") is asserted on every snapshot,
            # not trusted — the probe counts land in the manifest next
            # to the lineage. Cost: ~one extra superstep over the
            # kernel's checkpointed result.
            metrics["certificate"] = {
                r["probe"]: int(r["violations"])
                for r in certify(g, out).collect()
            }
        store.write(
            out,
            (prev if prev is not None else -1) + 1,
            metrics={"batch_id": int(batch_id), **metrics},
        )
        g.unpersist()

    stream = (
        spark.readStream.schema(OPS_SCHEMA if with_deletes else EDGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(edges_dir)
    )
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option(
            "checkpointLocation", os.path.join(work_dir, "stream_checkpoint")
        )
        .start()
    ), store


def incremental_pagerank_stream(
    spark: SparkSession,
    edges_dir: str,
    work_dir: str,
    *,
    damp: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    max_files_per_trigger: int = 4,
    verify: bool = False,
    with_deletes: bool = False,
):
    """Start (and return, with its SnapshotStore) a streaming query that
    maintains converged PageRank over an edge table growing under
    `edges_dir`. Drive synchronously in tests with
    q.processAllAvailable(); read the current ranks with
    store.read(spark, store.latest()). With ``verify`` every batch's
    manifest carries the pr_certificate probe counts for its snapshot
    (0 = the written ranks are a tol-fixpoint of the grown graph).

    with_deletes: the stream schema becomes (src, dst, op) with op in
    {'add', 'del'} and the maintained edge set is last-writer-wins per
    edge. PageRank's warm start stays valid under removals unchanged —
    the Jacobi fixpoint is independent of the start vector — so each
    batch still re-converges from the previous ranks."""
    from graphit_spark.kernels import pagerank

    def run(g, init, metrics, _dels):
        init_ranks = init.select("id", "rank") if init is not None else None
        return pagerank(
            g, damp=damp, tol=tol, max_iters=max_iters,
            init_ranks=init_ranks, metrics_out=metrics,
        )

    certify = None
    if verify:
        from graphit_spark.verifiers import pr_certificate

        def certify(g, out):
            return pr_certificate(g, out, damp=damp, eps=tol)

    return _incremental_stream(
        spark, edges_dir, work_dir, "incremental_pagerank", run,
        max_files_per_trigger, certify, with_deletes=with_deletes,
    )


def incremental_cc_stream(
    spark: SparkSession,
    edges_dir: str,
    work_dir: str,
    *,
    max_files_per_trigger: int = 4,
    verify: bool = False,
    with_deletes: bool = False,
):
    """Streaming connected components with warm labels: additions only
    merge components, so the previous labels are a valid start state
    and each batch converges in O(merged-chain) rounds. With ``verify``
    every batch's manifest carries the cc_certificate probe counts
    (this is exactly the case the certificate exists for: a warm start
    from stale labels that failed to merge would show up as
    edge_label_mismatch > 0 in that batch's manifest).

    with_deletes: stream schema (src, dst, op), op in {'add', 'del'},
    edge set = last-writer-wins. Deletions can SPLIT components, which
    invalidates a naive warm start (a stale merged-min label is too
    small and min-propagation never raises it). Exact localized repair:
    every vertex whose PREVIOUS component contains an endpoint of a
    deleted edge restarts at its own id; all other labels are kept.
    Why exact: an untouched old component cannot have split (no edge of
    it was removed), so its kept label is the id of a member — and the
    new fixpoint is min-over-init-labels per new component = min(member
    ids, own ids) = the cold answer. Cost scales with the size of the
    components the deletions touch, not the graph; the per-batch
    cc_certificate (``verify=True``) independently re-proves exactness
    of every snapshot."""
    from graphit_spark.kernels import connected_components

    def run(g, init, metrics, dels):
        init_labels = None
        if init is not None:
            init_labels = init.select("id", "comp")
            if dels is not None:
                touched = (
                    dels.select(F.col("src").alias("id"))
                    .union(dels.select(F.col("dst").alias("id")))
                    .distinct()
                )
                affected = (
                    init_labels.join(touched, "id", "left_semi")
                    .select("comp")
                    .distinct()
                    .withColumn("hit", F.lit(True))
                )
                init_labels = init_labels.join(affected, "comp", "left").select(
                    "id",
                    F.when(F.col("hit").isNotNull(), F.col("id"))
                    .otherwise(F.col("comp"))
                    .alias("comp"),
                )
        return connected_components(
            g, init_labels=init_labels, metrics_out=metrics
        )

    certify = None
    if verify:
        from graphit_spark.verifiers import cc_certificate

        def certify(g, out):
            return cc_certificate(g, out)

    return _incremental_stream(
        spark, edges_dir, work_dir, "incremental_cc", run,
        max_files_per_trigger, certify, with_deletes=with_deletes,
    )


DOC_SCHEMA = "doc_id long, text string"


def incremental_lsh_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    work_dir: str,
    *,
    k: int = 4,
    rows_per_band: int = 2,
    max_files_per_trigger: int = 4,
    verify: bool = False,
):
    """Streaming MinHash-LSH near-duplicate suppression over a growing
    crawl: each micro-batch of (doc_id, text) is banded with the SAME
    band derivation as the batch operator (functions/dedup.band_table),
    and a document is suppressed iff any of its band buckets is already
    occupied by a lower-id document — earlier batch OR same batch. The
    surviving documents of each batch land in a SnapshotStore iteration
    (per-partition lineage + {arrived, kept, suppressed} metrics), so
    the deduped corpus is the union of snapshots and a killed stream
    resumes from the stream checkpoint without re-emitting.

    Contract (pinned in tests/test_streaming.py): because ALL arriving
    documents' bands are registered — suppressed ones too — the kept
    set after in-doc_id-order delivery equals the batch rule's keep set
    exactly: {d : d appears as doc_b in no lsh_candidate_pairs row}
    (the UNCAPPED rule, max_bucket=None — the batch hot-band cap is a
    candidate-generation bound, not part of this keep-set contract),
    i.e. batch `dedup_lsh_pairs` + min-id-wins. Under out-of-order
    delivery a doc already emitted cannot be recalled when a lower-id
    bucket-mate arrives later (both ship — the inherent streaming
    divergence, same note as dedup_stream's first-seen contract).

    Scale shape (100 TB crawl): per batch, one shingle scan of the
    DELTA only (never the accumulated corpus), one band-keyed semi-join
    against the accumulated band table — an equi-join on (band, bkey),
    uniform by construction — and one batch-local min-per-bucket
    aggregation. The accumulated state is the band table (n_bands rows
    per distinct document), append-only parquet partitioned by the
    bucket hash; nothing driver-side grows with corpus size. With
    ``verify`` each batch's manifest carries an independent certificate
    recount: for every KEPT doc, the number of its buckets occupied by
    a lower-id registered doc (must be 0).
    """
    store = SnapshotStore(os.path.join(work_dir, "snapshots"), "incremental_lsh_dedup")
    bands_dir = os.path.join(work_dir, "bands")

    from graphit_spark.functions.dedup import band_table

    def process(batch_df, batch_id: int):
        bands = band_table(batch_df, "text", k, rows_per_band).localCheckpoint(
            eager=True
        )
        seen_prior = os.path.isdir(bands_dir) and any(
            f.endswith(".parquet") for f in os.listdir(bands_dir)
        )
        # within-batch rule: a doc is novel only if it IS the min id of
        # every bucket it occupies among this batch's arrivals …
        first = bands.groupBy("band", "bkey").agg(
            F.min("doc_id").alias("first_id")
        )
        dup_batch = (
            bands.join(first, ["band", "bkey"])
            .filter(F.col("doc_id") > F.col("first_id"))
            .select("doc_id")
        )
        # … and no bucket was registered by a LOWER-ID doc in an
        # earlier batch. Strict lower-id (not mere occupancy) keeps the
        # rule identical to the batch candidate-pair semantics under
        # in-order delivery AND makes a replayed half-committed batch
        # safe: a doc's own already-registered bands carry an EQUAL id,
        # so the rerun reproduces the same keep decision instead of
        # suppressing the doc against itself. Bands of suppressed docs
        # are registered too (the batch rule ranges over all docs).
        if seen_prior:
            seen = spark.read.parquet(bands_dir)
            dup_prev = (
                bands.alias("nb")
                .join(
                    seen.alias("sb"),
                    (F.col("nb.band") == F.col("sb.band"))
                    & (F.col("nb.bkey") == F.col("sb.bkey"))
                    & (F.col("sb.doc_id") < F.col("nb.doc_id")),
                    "left_semi",
                )
                .select("doc_id")
            )
            dups = dup_batch.union(dup_prev).distinct()
        else:
            dups = dup_batch.distinct()
        kept = batch_df.join(dups, "doc_id", "left_anti")
        arrived = batch_df.count()
        metrics: dict = {"batch_id": int(batch_id), "arrived": int(arrived)}
        if verify:
            # independent recount straight off the registered tables:
            # kept docs' buckets must have no lower-id occupant.
            all_bands = (
                spark.read.parquet(bands_dir).unionByName(bands)
                if seen_prior
                else bands
            )
            kept_bands = bands.join(kept.select("doc_id"), "doc_id", "left_semi")
            viol = (
                kept_bands.alias("kb")
                .join(
                    all_bands.alias("ab"),
                    (F.col("kb.band") == F.col("ab.band"))
                    & (F.col("kb.bkey") == F.col("ab.bkey"))
                    & (F.col("ab.doc_id") < F.col("kb.doc_id")),
                )
                .count()
            )
            metrics["certificate"] = {"kept_bucket_violations": int(viol)}
        kept_n = kept.count()
        metrics["kept"] = int(kept_n)
        metrics["suppressed"] = int(arrived - kept_n)
        # keyed on batch_id (stable across restarts via the stream
        # checkpoint) and store.write is an overwrite — replaying a
        # half-committed batch rewrites the SAME snapshot instead of
        # appending a duplicate slice to the corpus-union.
        store.write(kept, int(batch_id), metrics=metrics)
        # register AFTER the snapshot commit: on replay of a failed
        # batch the bands append re-runs, and duplicate band rows are
        # harmless (the rule only asks bucket occupancy / min id).
        bands.write.mode("append").parquet(bands_dir)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option(
            "checkpointLocation", os.path.join(work_dir, "stream_checkpoint")
        )
        .start()
    ), store
