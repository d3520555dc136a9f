"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Extras folded into the same line:
- "triples_per_sec": throughput of the KG pipeline (fixture pages -> triples)
  — the BASELINE.json headline metric;
- with KGNER_SCALING=1: the same workload at local[8] vs local[32] and the
  scaling efficiency (T8/T32)/4 — the sandbox stand-in for N vs 4N executors
  (see BASELINE.md).

Queries are materialized with the noop sink so column pruning cannot skip
the measured work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "bm25_retrieval",
    "entity_spans",
    "mention_cooccur",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash_dups",
    "exact_dedup",
    "lang_id",
    "quality",
    "token_counts",
    "pricing_summary",
    "top_revenue_orders",
    "sessionize",
    "event_gaps",
    "cosine_topk",
    "vocab",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from kgner.queries import QUERIES

    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.monotonic()
        _materialize(QUERIES[name](spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_kg_pipeline(spark, n_pages: int = 1200) -> tuple[float, int]:
    """Fixture pages -> triples end-to-end; returns (sec, n_triples)."""
    from pyspark.sql import functions as F

    from kgner.fixtures import build_fixtures, to_spark
    from kgner.functions.text import with_sentences
    from kgner.operators.canonicalize import canonical_map
    from kgner.operators.kbbuild import alias_edges, kb_sentences
    from kgner.operators.mentions import detect_mentions
    from kgner.operators.triples import all_triples

    fx = build_fixtures(n_entities=150, n_pages=n_pages, giant_pages=2)
    t = to_spark(spark, fx)
    pages = t["pages"].cache()
    pages.count()  # exclude fixture generation from the measured window
    t0 = time.monotonic()
    kbs = kb_sentences(t["kb_pages"])
    canon = canonical_map(alias_edges(t["kb_pages"], t["redirects"]), t["kb_pages"].select("title"))
    sents = with_sentences(pages)
    mentions = detect_mentions(spark, sents, canon)
    triples = all_triples(mentions, kbs, canon)
    n = triples.count()
    sec = time.monotonic() - t0
    pages.unpersist()
    return sec, n


def one_session(master: str, shuffle_partitions: int, sf_dir: str, kg: bool):
    from kgner.session import get_spark

    spark = get_spark("kgner-bench", master=master, shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    queries = run_queries(spark, sf_dir)
    total = round(time.monotonic() - t0, 3)
    kg_sec = kg_triples = None
    if kg:
        kg_sec, kg_triples = run_kg_pipeline(spark)
    spark.stop()
    return total, queries, kg_sec, kg_triples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    total, queries, kg_sec, kg_triples = one_session(
        f"local[{cpus}]", 32, sf_dir, kg=True
    )
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf),
        "kg_pipeline_sec": round(kg_sec, 3),
        "kg_triples": kg_triples,
        "triples_per_sec": round(kg_triples / kg_sec, 1),
    }

    if os.environ.get("KGNER_SCALING") == "1":
        t8, _, kg8, _ = one_session("local[8]", 16, sf_dir, kg=True)
        result["scaling"] = {
            "local8_sec": t8,
            "local32_sec": total,
            "query_efficiency": round((t8 / total) / 4, 3),
            "kg_local8_sec": round(kg8, 3),
            "kg_local32_sec": round(kg_sec, 3),
            "kg_efficiency": round((kg8 / kg_sec) / 4, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
