"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship KG-construction query on /root/testdata/sf0.001:
                  documents are treated as web pages, gazetteer aliases as the
                  KB, and the pipeline emits (subj, pred, obj) triples via the
                  real kgner operators (mention detection -> co-occurrence ->
                  triple materialization).
queries()      -> one entry per implemented operator (see kgner/queries.py;
                  each docstring cites the SURVEY.md §2 operator it covers).
oracle_sql()   -> matching DuckDB SQL for EVERY query. approx_distinct's
                  oracle checks the HLL estimate's relative-error bound
                  (<= 0.05 vs the exact count) rather than the
                  engine-specific sketch value. Hash-family queries
                  (minhash_lsh, simhash_dups, tfidf_features) run md5-derived
                  stable hashes the oracle reproduces exactly; production
                  operators default to xxhash64.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: gazetteer-KB triple extraction over sf0.001 documents."""
    from pyspark.sql import functions as F

    from kgner.operators.mentions import detect_mentions
    from kgner.operators.triples import cooccurrence_triples, mention_triples
    from kgner.queries import GAZ

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # documents -> the `sentences` shape (url, sent_id, tokens)
    sents = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(0).cast("int").alias("sent_id"),
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("tokens"),
    )
    aliases = spark.createDataFrame(
        [(g, g.upper()) for g in GAZ], "alias_norm string, canonical_id string"
    )
    mentions = detect_mentions(spark, sents, aliases)
    return mention_triples(mentions).unionByName(cooccurrence_triples(mentions))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgner.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgner.queries import ORACLES

    return dict(ORACLES)
