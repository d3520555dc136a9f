"""Round-3 additions: punctuation-aware highlight, context-tag stripping
(<EOS>/S-X truncation before ensembling), conlleval remove_x, multiplicative
title-field BM25 boost, and the file-loaded embedder seam."""

import pytest
from pyspark.sql import functions as F


# --- punctuation-aware ES highlight ------------------------------------------

def test_highlight_marks_punctuation_adjacent_tokens(spark):
    """ES marks 'Paris,' when term 'paris' scored (the analyzer strips the
    comma); highlight_col must wrap the core and re-attach the punctuation
    (ADVICE r2: kgner/operators/retrieval.py highlight gap)."""
    from kgner.operators.retrieval import highlight_col

    df = spark.createDataFrame(
        [
            ("Paris, is nice (Paris) !!", ["paris", "nice"]),
            ("all !! punct ..", ["punct"]),
            ("term equals, token", ["equals,"]),  # exact-token match kept
        ],
        "sentence string, terms array<string>",
    )
    got = [
        r.h
        for r in df.select(
            highlight_col(F.col("sentence"), F.col("terms")).alias("h")
        ).collect()
    ]
    assert got[0] == "<hit>Paris</hit>, is <hit>nice</hit> (<hit>Paris</hit>) !!"
    assert got[1] == "all !! <hit>punct</hit> .."
    assert got[2] == "term <hit>equals,</hit> token"


def test_highlight_roundtrips_unmatched_text(spark):
    from kgner.operators.retrieval import highlight_col

    df = spark.createDataFrame(
        [("double  space and, no match", ["absent"])],
        "sentence string, terms array<string>",
    )
    r = df.select(highlight_col(F.col("sentence"), F.col("terms")).alias("h")).head()
    assert r.h == "double  space and, no match"
