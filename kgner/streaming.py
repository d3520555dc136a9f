"""Structured Streaming path: incremental page ingestion.

The reference is strictly batch (SURVEY §2.J) — this module is the
forward-looking incremental-crawl surface: `readStream` over a directory of
page parquet files -> the SAME sentence/mention operators (the batch
DataFrame functions compose unchanged into the streaming plan) ->
`foreachBatch` upsert of mention counts.

Scale notes: file-source streaming partitions per input file; mention
detection is map-only (no shuffle), so the only stateful piece is the
aggregation, handled per micro-batch in foreachBatch (idempotent overwrite
per batch id) to keep state out of the state store for this append-only
workload. Watermark/windowed variants belong here when late data exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgner.fixtures import PAGES_SCHEMA


def stream_mention_counts(
    spark: SparkSession,
    pages_dir: str,
    aliases: DataFrame,
    checkpoint_dir: str,
    out_dir: str,
):
    """Start a stream: pages parquet dir -> per-batch mention counts appended
    to `out_dir` (parquet). Returns the StreamingQuery.

    foreachBatch writes are idempotent per batch_id, so a restarted query
    resumes from the checkpoint without double-counting (production: MERGE
    INTO an Iceberg table keyed by entity_id).
    """
    from kgner.functions.text import with_sentences
    from kgner.operators.mentions import detect_mentions

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )
    sents = with_sentences(pages)
    mentions = detect_mentions(spark, sents, aliases)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        counts = (
            batch_df.groupBy("entity_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
        )
        # idempotent per batch_id: a replayed micro-batch (sink completed but
        # checkpoint commit didn't) dynamically overwrites ITS OWN partition
        # instead of appending a duplicate
        (
            counts.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return (
        mentions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


FIRST_SEEN_STATE_SCHEMA = "seen boolean"
FIRST_SEEN_OUT_SCHEMA = "fingerprint bigint, doc_id bigint"


def stream_first_seen_docs(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: str,
    checkpoint_dir: str,
    out_dir: str,
    max_files_per_trigger: int = 1,
):
    """Custom STATEFUL streaming operator: cross-micro-batch exact dedup.

    Incoming docs are fingerprinted (xxhash64 of normalized text, the same
    first-pass key as operators.dedup.exact_dedup); `applyInPandasWithState`
    keeps one boolean per fingerprint in the state store and emits each
    fingerprint ONCE — the min-doc_id row of the micro-batch where it first
    appeared. Re-crawled duplicates in later batches emit nothing. Returns
    the StreamingQuery (availableNow).

    Scale notes: state is one boolean per distinct fingerprint, hash-
    partitioned by the groupBy key — the streaming twin of the exact-dedup
    shuffle. Output mode is append (emitted rows are final). In production
    the state store is RocksDB-backed and the fingerprint space can be
    range-aged with a timeout when dedup only needs a recency horizon.
    """
    import pandas as pd

    from kgner.operators.dedup import _norm_text

    def first_seen(key, pdfs, state):
        if state.exists:
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((True,))
        yield pd.DataFrame({"fingerprint": [int(key[0])], "doc_id": [best]})

    docs = (
        spark.readStream.schema(docs_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    fp = docs.select(
        F.xxhash64(_norm_text(F.col("text"))).alias("fingerprint"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
    deduped = fp.groupBy("fingerprint").applyInPandasWithState(
        first_seen,
        outputStructType=FIRST_SEEN_OUT_SCHEMA,
        stateStructType=FIRST_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
