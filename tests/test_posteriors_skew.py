"""Forward-backward posteriors (M-6) and skew-salting behavior tests."""

import numpy as np
from pyspark.sql import functions as F

from kgner.spanops import forward_backward, viterbi_decode


def test_forward_backward_rows_sum_to_one():
    rng = np.random.RandomState(0)
    em = rng.randn(7, 4)
    tr = rng.randn(6, 6) * 0.1
    post = forward_backward(em, tr)
    assert post.shape == (7, 4)
    assert np.allclose(post.sum(axis=1), 1.0)


def test_forward_backward_agrees_with_viterbi_on_peaked_emissions():
    # when emissions are near-deterministic, argmax of posteriors == viterbi
    em = np.full((5, 3), -10.0)
    path_true = [0, 1, 2, 1, 0]
    for t, k in enumerate(path_true):
        em[t, k] = 10.0
    tr = np.zeros((5, 5))
    post = forward_backward(em, tr)
    assert list(np.argmax(post, axis=1)) == path_true
    assert viterbi_decode(em, tr) == path_true


def test_salting_spreads_hot_domain(spark, tables):
    """30% of fixture pages share one hot domain; salted repartition must
    spread them across many partitions while plain domain-hash partitioning
    concentrates them."""
    pages = tables["pages"]
    domain = F.parse_url(F.col("url"), F.lit("HOST"))
    plain = pages.repartition(16, F.xxhash64(domain))
    salt = (F.rand(seed=42) * 8).cast("int")
    salted = pages.repartition(16, F.xxhash64(domain), salt)

    def hot_partition_counts(df):
        counts = (
            df.filter(F.col("url").contains("hot.example.com"))
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return {r["pid"]: r["count"] for r in counts}

    plain_parts = hot_partition_counts(plain)
    salted_parts = hot_partition_counts(salted)
    assert len(plain_parts) == 1  # all hot rows in one partition
    assert len(salted_parts) >= 4  # spread over the salt space


def test_pipeline_retrieval_stage(spark, tmp_path):
    from kgner.fixtures import build_fixtures, to_spark
    from kgner.pipeline import Pipeline, PipelineConfig

    fx = build_fixtures(n_entities=10, n_pages=12, giant_pages=0)
    t = to_spark(spark, fx)
    cfg = PipelineConfig(
        workdir=str(tmp_path / "wd"),
        stages=[
            "extracted", "sentences", "kb_sentences", "canonical",
            "mentions", "retrievals", "triples",
        ],
    )
    pipe = Pipeline(spark, cfg, t["pages"], t["kb_pages"], t["redirects"])
    pipe.run()
    aug = spark.read.parquet(str(tmp_path / "wd" / "retrievals"))
    rows = aug.collect()
    assert len(rows) > 0
    assert all(r["used_subtokens"] <= 510 for r in rows)
    with_ctx = [r for r in rows if len(r["contexts"]) > 0]
    assert len(with_ctx) > 0
    assert "<EOS>" in with_ctx[0]["augmented"]
