"""Iterative retrieval (SURVEY §3.3): stage-1 mention output becomes the
entity-boost input for a stage-2 retrieval pass, mirroring the reference's
two-stage flow (/root/reference/README.md:83-88,276; entity-boosted query
build kb/generate_data.py:52-55; window-based entity queries
ensemble_prediction.py:215-255).

Batch-to-batch iteration = checkpointed DAG stages, not streaming (the
reference writes predictions, then re-runs retrieval); callers materialize
between rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iterative_retrieval(
    spark: SparkSession,
    queries: DataFrame,
    postings: DataFrame,
    docs: DataFrame,
    aliases: DataFrame,
    k: int = 10,
    title_boost: float = 2.0,
    lang_col: str | None = None,
    max_df_ratio: float | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-round retrieval.

    queries: (query_id, tokens array<string>) — lowercased.
    lang_col / max_df_ratio pass through to both bm25_topk rounds (the
    reference routes BOTH stages to the same per-language index, and the
    stopword cutoff applies to re-retrieval exactly as to round 1).
    Returns (round1_retrievals, boost_entities, round2_retrievals):
    round 1 is plain BM25; mentions detected in the QUERY text against the
    alias table become per-query boost entities; round 2 re-retrieves with
    the title-boost clause, as the reference's `--with_entity` second stage.
    """
    from kgner.operators.mentions import detect_mentions
    from kgner.operators.retrieval import bm25_topk

    kw = {"lang_col": lang_col, "max_df_ratio": max_df_ratio}
    r1 = bm25_topk(queries, postings, docs, k=k, **kw)

    qsents = queries.select(
        F.col("query_id").cast("string").alias("url"),
        F.lit(0).cast("int").alias("sent_id"),
        "tokens",
    )
    found = detect_mentions(spark, qsents, aliases)
    boost = found.select(
        F.col("url").cast("long").alias("query_id"),
        F.col("entity_id").alias("entity"),
    ).distinct()

    r2 = bm25_topk(
        queries, postings, docs, k=k, boost_entities=boost,
        title_boost=title_boost, **kw
    )
    return r1, boost, r2
