"""Throughput characterization for the r5 zh dictionary-analyzer family and
the two-round window-retrieval flow (r5 VERDICT "Next round" items 1-2 —
measurement only; bench.py stays frozen).

Section 1 — zh analyzers, tokens/sec over a synthetic han corpus:
  - char-level `tokens_col_cjk` (the pre-r5 baseline analyzer)
  - JVM FMM fold `tokens_col_cjk_dict` with a <=10k-word lexicon
    (the FMM_JVM_LEXICON_MAX InSet path)
  - Arrow-UDF FMM with an ik-scale ~300k-word lexicon (the auto-switch path)
  - Arrow-UDF ik_max_word `tokens_col_cjk_dict_max` at ik scale

The corpus is deterministic: han-only documents composed from the lexicon's
own words plus connective single chars, so the segmenters do real dictionary
work (multi-char matches at every position). Lexicon words are drawn from
the CJK Unified Ideographs block via a fixed arithmetic scheme — no RNG.

Section 2 — `iterative_retrieval(query_window=2)` end-to-end at a given SF:
round-1 BM25 -> query-side mention detect -> window re-keying -> boosted
round 2 -> parent-span attribution, timed with the noop sink.

Usage: python bench_zh_extra.py [--sf DIR] [--reps N] [--docs N]
Prints one JSON line per measurement and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_lexicon(n_words: int) -> list[str]:
    """Deterministic han lexicon: words of length 2-4 over the CJK block."""
    base = 0x4E00
    span = 0x9FFF - base
    words = []
    i = 0
    while len(words) < n_words:
        ln = 2 + (i % 3)
        w = "".join(chr(base + ((i * 131 + j * 7919) % span)) for j in range(ln))
        words.append(w)
        i += 1
    return sorted(set(words))[:n_words]


def make_corpus(spark, lexicon: list[str], n_docs: int, words_per_doc: int = 40):
    """One han sentence per doc: lexicon words joined by connective chars."""
    from pyspark.sql import functions as F

    lex_n = len(lexicon)
    rows = []
    for d in range(n_docs):
        parts = []
        for k in range(words_per_doc):
            parts.append(lexicon[(d * 37 + k * 101) % lex_n])
            parts.append(chr(0x4E00 + ((d + k) % 500)))  # connective char
        rows.append((d, "".join(parts)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(spark.sparkContext.defaultParallelism * 2, F.col("doc_id"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--docs", type=int, default=20000)
    args = ap.parse_args()

    os.environ.setdefault("KGNER_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from kgner.functions.text import (
        FMM_JVM_LEXICON_MAX,
        tokens_col_cjk,
        tokens_col_cjk_dict,
        tokens_col_cjk_dict_max,
    )
    from kgner.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("kgner-zh-bench", master=f"local[{cpus}]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    lex_small = make_lexicon(FMM_JVM_LEXICON_MAX)       # JVM InSet fold path
    lex_ik = make_lexicon(300_000)                       # ik-scale UDF path
    corpus = make_corpus(spark, lex_ik, args.docs).cache()
    n_docs = corpus.count()
    total_chars = corpus.select(F.sum(F.length("text"))).collect()[0][0]

    modes = {
        "char_level": lambda: tokens_col_cjk(F.col("text")),
        "fmm_jvm_10k": lambda: tokens_col_cjk_dict(F.col("text"), lex_small),
        "fmm_udf_300k": lambda: tokens_col_cjk_dict(F.col("text"), lex_ik),
        "max_word_udf_300k": lambda: tokens_col_cjk_dict_max(F.col("text"), lex_ik),
    }
    out = {"n_docs": n_docs, "total_chars": int(total_chars)}
    # warm python workers once (fork+imports are per-executor costs on a
    # real cluster, not per job)
    noop(corpus.select(tokens_col_cjk(F.col("text")).alias("t")))
    for name, mk in modes.items():
        samples = []
        n_tokens = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"zh-analyzer: {name}")
            t0 = time.monotonic()
            noop(corpus.select(mk().alias("toks")))
            samples.append(round(time.monotonic() - t0, 3))
        n_tokens = corpus.select(F.sum(F.size(mk()))).collect()[0][0]
        med = sorted(samples)[len(samples) // 2]
        out[name] = {
            "sec_median": med,
            "sec_samples": samples,
            "n_tokens": int(n_tokens),
            "tokens_per_sec": round(n_tokens / med, 1),
            "chars_per_sec": round(total_chars / med, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
    corpus.unpersist()

    # ---- Section 2: two-round window retrieval at the given SF ----
    from kgner.operators.iterative import iterative_retrieval
    from kgner.queries import _t, _toks

    d = _t(spark, args.sf, "documents")
    toks = _toks(F.col("text"))
    queries = d.filter(F.col("doc_id") < 64).select(
        F.col("doc_id").alias("query_id"), F.array_distinct(F.slice(toks, 1, 8)).alias("tokens")
    )
    postings = (
        d.select(F.col("doc_id"), F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    lens = postings.groupBy("doc_id").agg(F.sum("tf").alias("len"))
    docs = d.select(
        "doc_id", F.col("text").alias("sentence"), F.lit("t").alias("title"),
        F.lit("u").alias("url"),
    ).join(lens, "doc_id")
    from kgner.queries import GAZ

    aliases = spark.createDataFrame(
        [(g, g.upper()) for g in GAZ], "alias_norm string, canonical_id string"
    )
    it_samples = []
    for _ in range(args.reps):
        spark.sparkContext.setJobDescription("iterative_retrieval window=2")
        t0 = time.monotonic()
        r1, boost, r2 = iterative_retrieval(
            spark, queries, postings, docs, aliases, k=10, query_window=2
        )
        noop(r2)
        it_samples.append(round(time.monotonic() - t0, 3))
    out["iterative_window2"] = {
        "sf": args.sf,
        "sec_median": sorted(it_samples)[len(it_samples) // 2],
        "sec_samples": it_samples,
        "r2_rows": r2.count(),
    }
    print(json.dumps({"iterative_window2": out["iterative_window2"]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
