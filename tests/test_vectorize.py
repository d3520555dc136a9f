"""Hashed TF-IDF vectorizer + its integration with cosine near-dup."""

import math

from pyspark.sql import functions as F


def test_tfidf_shapes_and_norm(spark):
    from kgner.operators.vectorize import tfidf_vectors

    docs = spark.createDataFrame(
        [
            (0, "spark shuffle join window"),
            (1, "spark shuffle join window"),
            (2, "completely different words entirely here"),
        ],
        "doc_id long, text string",
    )
    vecs = {r["doc_id"]: list(r["vector"]) for r in tfidf_vectors(docs, dim=32).collect()}
    assert all(len(v) == 32 for v in vecs.values())
    for v in vecs.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    # identical docs -> identical vectors; different docs -> different
    assert vecs[0] == vecs[1]
    assert vecs[0] != vecs[2]


def test_tfidf_feeds_cosine_near_dup(spark):
    from kgner.operators.similarity import cosine_near_dup_pairs
    from kgner.operators.vectorize import tfidf_vectors

    rows = [(i, f"unique tokens w{i} x{i} y{i} z{i} for doc number {i}") for i in range(20)]
    rows += [(100, "the quick brown fox jumps over the lazy dog today"),
             (101, "the quick brown fox jumps over the lazy dog today")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = tfidf_vectors(docs, dim=64).withColumnRenamed("vector", "embedding").withColumnRenamed("doc_id", "vec_id")
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_near_dup_pairs(vecs, dim=64, threshold=0.99).collect()
    }
    assert (100, 101) in pairs and pairs[(100, 101)] > 0.999

def test_tfidf_null_text_gets_zero_vector(spark):
    from kgner.operators.vectorize import tfidf_vectors

    docs = spark.createDataFrame(
        [(0, "real words here"), (1, None)], "doc_id long, text string"
    )
    vecs = {r["doc_id"]: list(r["vector"]) for r in tfidf_vectors(docs, dim=8).collect()}
    assert set(vecs) == {0, 1}
    assert vecs[1] == [0.0] * 8
    assert any(x != 0 for x in vecs[0])
